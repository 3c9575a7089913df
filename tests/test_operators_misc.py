"""Windows / set-ops / scalar operators not covered by the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_data_migration_spark.functions.scalars import explode_map
from cassandra_data_migration_spark.operators.windows import (
    clustering_sort,
    running_delta,
    top_k_per_key,
)


def test_top_k_per_key(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 5)], "k int, v int"
    )
    out = top_k_per_key(df, ["k"], "v", k=2)
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {(1, 30), (1, 20), (2, 5)}


def test_running_delta(spark):
    df = spark.createDataFrame([(1, 1, 10), (1, 2, 25), (1, 3, 20)], "k int, t int, v int")
    out = {r.t: r.delta for r in running_delta(df, ["k"], "t", "v").collect()}
    assert out == {1: None, 2: 15, 3: -5}


def test_clustering_sort_partition_local_order(spark):
    df = spark.createDataFrame(
        [(1, 3), (2, 1), (1, 9), (2, 7), (1, 5)], "k int, t int"
    )
    out = clustering_sort(df, ["k"], "t", descending=True)
    # within each partition, rows for one key are contiguous and t-desc
    rows = out.select("k", "t").rdd.glom().collect()
    for part in rows:
        by_key: dict[int, list[int]] = {}
        for r in part:
            by_key.setdefault(r.k, []).append(r.t)
        for ts in by_key.values():
            assert ts == sorted(ts, reverse=True)


def test_explode_map(spark):
    df = spark.createDataFrame(
        [(1, {"a": "x", "b": "y"})], "id int, prefs map<string,string>"
    )
    out = explode_map(df, "prefs")
    got = {(r.prefs_key, r.prefs_value) for r in out.collect()}
    assert got == {("a", "x"), ("b", "y")}
    assert set(out.columns) == {"id", "prefs_key", "prefs_value"}


def test_generation_uuid_shape(spark):
    from cassandra_data_migration_spark.generate import generate_users

    row = generate_users(spark, 3, seed=1).select("user_id").first()
    parts = row.user_id.split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
    assert all(c in "0123456789abcdef-" for c in row.user_id)


def test_salted_join_equals_plain_join_on_skewed_data(spark):
    """Salting only re-routes rows; the result must be EXACTLY the
    plain join, including under extreme skew (one key = 90% of facts)."""
    from cassandra_data_migration_spark.operators.joins import salted_equi_join

    facts = spark.range(1000).selectExpr(
        "CASE WHEN id < 900 THEN 7 ELSE id END AS k", "id AS v"
    )
    dim = spark.range(1000).selectExpr("id AS k", "id * 10 AS attr")
    salted = salted_equi_join(facts, dim, "k", num_salts=4)
    plain = facts.join(dim, "k")
    assert salted.count() == plain.count() == 1000
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_sketch_profile_accuracy_vs_exact(spark):
    """HLL distinct estimate within 3×rsd of exact; median quantile
    within the approx rank error; one aggregation, no fingerprint
    shuffle (partial_ prefix proves map-side combine)."""
    import contextlib
    import io

    from cassandra_data_migration_spark.operators.aggregates import sketch_profile
    from cassandra_data_migration_spark.operators.text import normalize_text
    from cassandra_data_migration_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    prof = {r["source"]: r for r in sketch_profile(docs, rsd=0.05).collect()}
    exact = {
        r["source"]: r
        for r in docs.select(
            "source", F.md5(normalize_text("text")).alias("fp")
        )
        .groupBy("source")
        .agg(
            F.countDistinct("fp").alias("nd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(prof) == set(exact)
    for src, r in prof.items():
        e = exact[src]
        assert r["n_docs"] == e["n"]
        assert abs(r["approx_distinct_docs"] - e["nd"]) <= max(2, 0.15 * e["nd"])
        q50, q90, q99 = r["token_quantiles"]
        assert q50 <= q90 <= q99

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sketch_profile(docs).explain("formatted")
    plan = buf.getvalue()
    assert "partial_" in plan  # sketches combine map-side


def test_asof_join_semantics_on_crafted_rows(spark):
    """Inclusive backward match, NULL when no prior right row, and
    deterministic last-wins on right-side timestamp ties."""
    from cassandra_data_migration_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102)], "k int, t int, lid int"
    ).select("k", F.col("t").cast("timestamp").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, 10, 7, 0.5), (1, 10, 9, 0.7), (1, 15, 3, 0.9), (2, 6, 4, 0.1)],
        "k int, t int, rid int, v double",
    ).select("k", F.col("t").cast("timestamp").alias("ts"), "rid", "v")
    out = {
        r.lid: (r.rid_matched, r.v_matched)
        for r in asof_join(
            left, right, on=["k"], ts_col="ts",
            payload_cols=["rid", "v"], tiebreak_col="rid",
        ).collect()
    }
    assert out[100] == (9, 0.7)   # equal-ts right row matches; rid=9 wins tie
    assert out[101] == (3, 0.9)   # latest at-or-before 20 is ts=15
    assert out[102] == (None, None)  # right row is strictly later


def test_interval_join_containment_and_gap_nulls(spark):
    """Points inside a validity window get its payload; points in gaps
    or before the first window get NULLs."""
    from cassandra_data_migration_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, 5, 100), (1, 15, 101), (1, 25, 102), (2, 9, 103)],
        "k int, t int, pid int",
    ).select("k", F.col("t").cast("timestamp").alias("ts"), "pid")
    intervals = spark.createDataFrame(
        [(1, 10, 20, 7), (1, 22, 24, 8), (2, 1, 9, 9)],
        "k int, s int, e int, iid int",
    ).select(
        "k",
        F.col("s").cast("timestamp").alias("start"),
        F.col("e").cast("timestamp").alias("end"),
        "iid",
    )
    got = {
        r.pid: r.iid_iv
        for r in interval_join(
            points, intervals, on=["k"], ts_col="ts",
            start_col="start", end_col="end", payload_cols=["iid"],
        ).collect()
    }
    assert got[100] is None      # before any window
    assert got[101] == 7         # inside [10, 20]
    assert got[102] is None      # in the gap between windows
    assert got[103] == 9         # inclusive end boundary
