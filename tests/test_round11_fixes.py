"""Round-11 hardening: regression tests for the round-6 advice
findings — NULL-safe row canon/digest in repair, fake-connector
writer abort semantics, heartbeat daemon keying, and the
tombstone-GC superseded accounting (covered in test_cells once the
cell-TTL work lands)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F


def test_merkle_digest_distinguishes_null_shift(spark):
    """Two rows differing only in WHICH nullable column is NULL must
    digest differently — raw concat_ws skips NULLs, so ('x', NULL)
    and (NULL, 'x') used to collide and dodge both the leaf diff and
    the row repair."""
    from cassandra_data_migration_spark.operators.merkle import merkle_diff

    origin = spark.createDataFrame(
        [(1, "x", None), (2, "a", "b")], "k long, c1 string, c2 string"
    )
    target = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "b")], "k long, c1 string, c2 string"
    )
    flagged = merkle_diff(origin, target, "k", ["c1", "c2"], depth=1, fanout=4)
    assert flagged.count() >= 1, "null-shifted row did not flag any leaf"


def test_merkle_digest_distinguishes_separator_shift(spark):
    """Values containing the old '|' separator must not alias across
    column boundaries: ('a|b', 'c') vs ('a', 'b|c')."""
    from cassandra_data_migration_spark.operators.merkle import merkle_diff

    origin = spark.createDataFrame([(1, "a|b", "c")], "k long, c1 string, c2 string")
    target = spark.createDataFrame([(1, "a", "b|c")], "k long, c1 string, c2 string")
    assert (
        merkle_diff(origin, target, "k", ["c1", "c2"], depth=1, fanout=4).count()
        == 1
    )


def test_repair_null_shift_classified_and_repaired(spark):
    """merkle_scoped_repair must classify a null-shifted row as a
    MISMATCH (repair it) and converge — previously the canon collided
    and the row was silently left divergent."""
    from cassandra_data_migration_spark.plans.repair import (
        merkle_scoped_repair,
    )

    rows_o = [(i, f"v{i}", None if i % 2 else f"w{i}") for i in range(40)]
    rows_t = [
        (i, f"v{i}", None if i % 2 else f"w{i}") for i in range(40) if i != 7
    ]
    # key 7: origin has (c1='v7', c2=NULL); target has (c1=NULL, c2='v7')
    rows_t.append((7, None, "v7"))
    origin = spark.createDataFrame(rows_o, "k long, c1 string, c2 string")
    target = spark.createDataFrame(rows_t, "k long, c1 string, c2 string")
    rep = {
        r["metric"]: r["value"]
        for r in merkle_scoped_repair(
            origin, target, "k", ["c1", "c2"], depth=2, fanout=4
        ).collect()
    }
    assert rep["mismatched_repaired"] == 1
    assert rep["missing_repaired"] == 0 and rep["extra_removed"] == 0
    assert (
        rep["post_missing"] == 0
        and rep["post_mismatched"] == 0
        and rep["post_extra"] == 0
    )


def test_null_safe_canon_sql_matches_spark(spark, duck):
    """The Spark canon and its DuckDB twin agree byte-for-byte over
    NULLs, separators, and sentinel-looking values."""
    from cassandra_data_migration_spark.operators.merkle import (
        null_safe_canon,
        null_safe_canon_sql,
    )

    rows = [
        (1, "a", "b"),
        (2, None, "b"),
        (3, "a", None),
        (4, "a|b", "c"),
        (5, "␀", None),
    ]
    df = spark.createDataFrame(rows, "k long, c1 string, c2 string")
    got_spark = {
        r["k"]: r["canon"]
        for r in df.select(
            "k",
            null_safe_canon([F.col("c1"), F.col("c2")]).alias("canon"),
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES " +
                 ", ".join(
                     f"({k}, {repr(c1) if c1 is not None else 'NULL'}, "
                     f"{repr(c2) if c2 is not None else 'NULL'})"
                     for k, c1, c2 in rows
                 ) + ") AS v(k, c1, c2)")
    canon_sql = null_safe_canon_sql(["c1", "c2"])
    got_duck = dict(
        duck.execute(f"SELECT k, {canon_sql} FROM t").fetchall()
    )
    assert got_spark == got_duck


def test_fake_writer_abort_removes_partial_parts(spark, tmp_path):
    """A failed append through the fake connector must leave the old
    table byte-identical: abort() deletes every part the failed job
    wrote, so no duplicated/mixed rows survive."""
    from cassandra_data_migration_spark.sources.connector import (
        CassandraTableSource,
    )
    from cassandra_data_migration_spark.sources.fake_cassandra import (
        register_fake_cassandra,
    )

    register_fake_cassandra(spark)
    ks = str(tmp_path / "ks")
    src = CassandraTableSource(keyspace=ks)
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    src.write(base, "t", mode="append")
    table_dir = os.path.join(ks, "t.parquet")
    before = sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
    assert len(before) >= 1

    @F.udf("string")
    def boom(v):
        if v == "bad":
            raise ValueError("task failure injected by test")
        return v

    bad = (
        spark.createDataFrame(
            [(10, "ok"), (11, "bad")], "k long, v string"
        )
        .repartition(2, "k")
        .select("k", boom("v").alias("v"))
    )
    with pytest.raises(Exception, match="task failure injected"):
        src.write(bad, "t", mode="append")

    after = sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
    assert after == before, "failed job left partial parts behind"
    got = {(r["k"], r["v"]) for r in src.read(spark, "t").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_fake_writer_overwrite_abort_preserves_old_table(spark, tmp_path):
    """A failed OVERWRITE must keep the old parts (they are only
    removed in commit) and remove the new job's parts."""
    from cassandra_data_migration_spark.sources.connector import (
        CassandraTableSource,
    )
    from cassandra_data_migration_spark.sources.fake_cassandra import (
        register_fake_cassandra,
    )

    register_fake_cassandra(spark)
    ks = str(tmp_path / "ks")
    src = CassandraTableSource(keyspace=ks)
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    src.write(base, "t", mode="append")

    @F.udf("string")
    def boom(v):
        if v == "bad":
            raise ValueError("task failure injected by test")
        return v

    bad = (
        spark.createDataFrame([(10, "ok"), (11, "bad")], "k long, v string")
        .repartition(2, "k")
        .select("k", boom("v").alias("v"))
    )
    with pytest.raises(Exception, match="task failure injected"):
        src.write(bad, "t", mode="overwrite")
    got = {(r["k"], r["v"]) for r in src.read(spark, "t").collect()}
    assert got == {(1, "a"), (2, "b")}


# --- NetworkTopologyStrategy placement (ring.py) ----------------------------


def test_nts_replica_sets_rf_and_rack_invariants():
    """Every vnode slot must seat exactly rf_dc DISTINCT nodes per DC,
    spread across racks whenever the DC has that many racks."""
    from cassandra_data_migration_spark.operators.ring import (
        nts_replica_sets,
        nts_ring,
        topology_nodes,
    )

    dcs = {"dc1": 4, "dc2": 3}
    rf = {"dc1": 3, "dc2": 2}
    nodes = topology_nodes(dcs, racks_per_dc=2)
    dc_of = {n: dc for n, dc, _ in nodes}
    rack_of = {n: r for n, _, r in nodes}
    ring = nts_ring(nodes, vnodes_per_node=8)
    sets = nts_replica_sets(ring, nodes, rf)
    assert len(sets) == 8 * 7
    for _, owners in sets:
        assert len(owners) == len(set(owners)) == 5
        for dc, want in rf.items():
            mine = [n for n in owners if dc_of[n] == dc]
            assert len(mine) == want, (dc, owners)
            racks = {rack_of[n] for n in mine}
            # 2 racks per DC: any placement of >=2 replicas must span
            # both racks (the rack-diversity rule)
            if want >= 2:
                assert len(racks) == 2, (dc, owners)


def test_nts_single_rack_dc_falls_back():
    """A one-rack DC cannot spread racks; the walk must still seat
    rf distinct nodes instead of starving."""
    from cassandra_data_migration_spark.operators.ring import (
        nts_replica_sets,
        nts_ring,
        topology_nodes,
    )

    nodes = topology_nodes({"dc1": 3}, racks_per_dc=1)
    ring = nts_ring(nodes, vnodes_per_node=4)
    sets = nts_replica_sets(ring, nodes, {"dc1": 3})
    for _, owners in sets:
        assert sorted(owners) == [0, 1, 2]


def test_nts_ownership_totals(spark):
    """Per-DC replica rows must sum to rf_dc full copies of the table."""
    from cassandra_data_migration_spark.operators.ring import (
        replica_ownership_nts,
    )

    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    out = replica_ownership_nts(
        df, "k", dcs={"dc1": 4, "dc2": 3}, rf_per_dc={"dc1": 3, "dc2": 2}
    ).collect()
    per_dc = {}
    for r in out:
        per_dc[r["dc"]] = per_dc.get(r["dc"], 0) + r["n_replica_rows"]
    assert per_dc == {"dc1": 3 * 2000, "dc2": 2 * 2000}


def test_local_quorum_repair_divergence_classes(spark):
    """dc-local staleness and cross-DC divergence must classify
    independently: a key stale in one DC only, and a key whose DCs
    are each internally consistent yet disagree."""
    from cassandra_data_migration_spark.operators.cells import (
        local_quorum_read_repair,
    )

    def df(rows):
        return spark.createDataFrame(rows, "k long, v long, wt long")

    # dc1: replicas agree on (k=1, v=10, wt=100); dc2 replicas agree
    # on a NEWER (v=20, wt=200) -> dc1 divergent but locally clean.
    # k=2: dc1 internally stale (one replica behind), dc2 clean+same.
    reps = {
        "dc1": [df([(1, 10, 100), (2, 5, 50)]), df([(1, 10, 100), (2, 7, 70)])],
        "dc2": [df([(1, 20, 200), (2, 7, 70)]), df([(1, 20, 200), (2, 7, 70)])],
    }
    out = {
        (r["dc"], r["k"]): (r["n_stale"], r["dc_divergent"])
        for r in local_quorum_read_repair(reps, "k", "v", "wt").collect()
    }
    assert out[("dc1", 1)] == (0, True)  # locally clean, behind dc2
    assert out[("dc1", 2)] == (1, False)  # locally stale, globally fine
    assert ("dc2", 1) not in out and ("dc2", 2) not in out
