"""Round-5-session additions: line-wise dedup, incremental LSH index."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, assert_df_matches_oracle


def test_line_dedup_docs_semantics(spark):
    from cassandra_data_migration_spark.operators.text import line_dedup_docs

    rows = [
        # boilerplate line shared by docs 0 and 1 -> removed from both
        (0, "unique content line zero\nshared boilerplate footer line"),
        (1, "another unique line here\nshared boilerplate footer line"),
        # short line "ok" repeats cross-doc but is exempt (<10 chars)
        (2, "ok\nthird document body text"),
        (3, "ok\nfourth document body text"),
        # doc that is ONLY boilerplate must survive with empty text
        (4, "shared boilerplate footer line"),
        # intra-doc repeat is NOT cross-doc: kept (1 distinct doc)
        (5, "repeat me inside this doc\nrepeat me inside this doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in line_dedup_docs(df, min_docs=2, min_chars=10).collect()
    }
    assert len(out) == 6
    assert out[0]["clean_text"] == "unique content line zero"
    assert out[0]["n_kept"] == 1 and out[0]["n_removed"] == 1
    assert out[1]["clean_text"] == "another unique line here"
    assert out[2]["clean_text"] == "ok\nthird document body text"
    assert out[2]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0
    assert out[4]["n_removed"] == 1
    assert (
        out[5]["clean_text"]
        == "repeat me inside this doc\nrepeat me inside this doc"
    )


def test_line_dedup_preserves_line_order(spark):
    from cassandra_data_migration_spark.operators.text import line_dedup_docs

    # many lines so a shuffled collect_list would scramble without the
    # array_sort(struct(pos, line)) ordering
    lines = [f"distinct content line number {i:03d}" for i in range(40)]
    df = spark.createDataFrame(
        [(7, "\n".join(lines))], "doc_id long, text string"
    ).repartition(8)
    out = line_dedup_docs(df).collect()[0]
    assert out["clean_text"] == "\n".join(lines)
    assert out["n_kept"] == 40


def test_line_dedup_docs_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["line_dedup_docs"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["line_dedup_docs"],
    )


def test_lsh_index_probe_semantics(spark):
    from cassandra_data_migration_spark.operators.dedup import (
        lsh_index_build,
        lsh_index_probe,
    )

    seen = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely different corpus entry about spark plans"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # near-copy of doc 0 (one word changed; this variant's
            # bands verifiably collide — LSH recall is probabilistic,
            # not every 1-edit copy lands in a shared bucket) -> match
            (10, "a quick brown fox jumps over the lazy dog today"),
            # unrelated -> novel
            (11, "unrelated text with entirely fresh tokens galore"),
        ],
        "doc_id long, text string",
    )
    index = lsh_index_build(seen)
    out = {r["doc_id"]: r for r in lsh_index_probe(new, index, seen).collect()}
    assert out[10]["match_id"] == 0 and out[10]["is_novel"] == 0
    assert out[10]["jaccard"] >= 0.5
    assert out[11]["match_id"] is None and out[11]["is_novel"] == 1


def test_lsh_index_probe_matches_batch_dedup(spark):
    """Splitting the corpus and probing incrementally must find every
    cross-half pair the one-shot batch dedup finds (same bands, same
    verify threshold)."""
    from cassandra_data_migration_spark.operators.dedup import (
        lsh_index_build,
        lsh_index_probe,
        minhash_lsh_dedup,
    )

    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "text")
    )
    half = docs.count() // 2
    seen = docs.filter(F.col("doc_id") < half)
    new = docs.filter(F.col("doc_id") >= half)
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(
            docs, n=3, num_hashes=4, band_size=2, jaccard_threshold=0.5
        ).collect()
        if r["id_a"] < half <= r["id_b"]
    }
    probed = lsh_index_probe(new, lsh_index_build(seen), seen).collect()
    matched = {(r["match_id"], r["doc_id"]) for r in probed if r["match_id"] is not None}
    # every batch cross-pair's new-side doc must be flagged non-novel
    batch_new_ids = {b for _, b in batch_pairs}
    flagged_new_ids = {b for _, b in matched}
    assert batch_new_ids <= flagged_new_ids


def test_lsh_index_incremental_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["lsh_index_incremental"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["lsh_index_incremental"],
    )


def test_tws_running_totals_stream_equals_batch(spark, tmp_path):
    """State API v2 (transformWithStateInPandas) twin: per-key running
    totals across 3 micro-batches must equal the one-shot batch
    aggregate (all-integer accumulators -> slicing-invariant)."""
    import pytest

    from cassandra_data_migration_spark.streaming.tws import (
        run_tws_totals,
        tws_available,
    )

    if not tws_available():
        pytest.skip("protobuf unavailable: transformWithState runner "
                    "cannot start in this image (see tws.tws_available)")

    src = str(tmp_path / "src")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts", "value",
                F.pmod("event_id", F.lit(3)).alias("_slice"))
    )
    for s in range(3):
        ev.filter(F.col("_slice") == s).drop("_slice").repartition(1) \
            .write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_tws_totals(
        spark, stream, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    got = {r["user_id"]: (r["n_events"], r["sum_cents"], r["last_ts_us"])
           for r in out.collect()}
    exp = {
        r["user_id"]: (r["n"], r["s"], r["m"])
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("s"),
            F.max(F.unix_micros("ts")).alias("m"),
        )
        .collect()
    }
    assert got == exp


def test_tws_module_importable_and_gated():
    """The v2-state module must import cleanly and report the runner
    capability without raising, whatever the image has."""
    from cassandra_data_migration_spark.streaming.tws import (
        RunningTotalsProcessor,
        tws_available,
    )

    assert isinstance(tws_available(), bool)
    p = RunningTotalsProcessor("user_id")
    assert p._key_col == "user_id"


def test_cow_merge_prunes_untouched_files(spark, tmp_path):
    """Updates confined to one key range must rewrite ONLY the files
    that range intersects; every other file stays byte-identical."""
    import hashlib
    import os

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    spark.range(0, 8000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartitionByRange(8, "k").sortWithinPartitions("k").write.parquet(
        target
    )

    def file_hashes():
        return {
            f: hashlib.md5(
                open(os.path.join(target, f), "rb").read()
            ).hexdigest()
            for f in os.listdir(target)
            if f.endswith(".parquet")
        }

    before = file_hashes()
    # update keys 0..99 (lowest range) + insert keys 9000..9009
    upd = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    ins = spark.range(9000, 9010).select(
        F.col("id").alias("k"), F.lit(-2).cast("long").alias("v")
    )
    stats = cow_merge(spark, target, upd.unionByName(ins), "k")
    assert stats.files_total == 8
    assert 1 <= stats.files_rewritten < stats.files_total
    assert stats.rows_written >= 110  # survivors of touched + updates

    after = file_hashes()
    untouched_before = set(before) & set(after)
    assert len(untouched_before) >= 8 - stats.files_rewritten
    for f in untouched_before:
        assert before[f] == after[f]  # byte-identical, never rewritten

    got = {
        r["k"]: r["v"]
        for r in spark.read.parquet(target).collect()
    }
    assert len(got) == 8010
    assert all(got[k] == -1 for k in range(100))
    assert all(got[k] == -2 for k in range(9000, 9010))
    assert got[4000] == 12000  # untouched row intact


def test_cow_merge_all_inserts_touches_nothing(spark, tmp_path):
    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    spark.range(0, 100).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).repartitionByRange(4, "k").write.parquet(target)
    ins = spark.range(500, 520).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    stats = cow_merge(spark, target, ins, "k")
    assert stats.files_rewritten == 0
    assert stats.rows_written == 20
    assert spark.read.parquet(target).count() == 120


def test_cow_merge_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["cow_merge_upsert"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["cow_merge_upsert"],
    )


def test_cow_merge_rerun_after_crash_converges(spark, tmp_path):
    """Crash window: new files landed, a touched original was NOT yet
    removed (duplicate survivor + stale-updated rows on disk).
    Rerunning the SAME merge must converge to exactly-once."""
    import os
    import shutil

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    spark.range(0, 1000).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(
        target
    )
    upd = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    # snapshot the file the merge will rewrite, then merge, then put
    # the original BACK -> exactly the crashed-mid-removal state
    files_before = {
        f for f in os.listdir(target) if f.endswith(".parquet")
    }
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    for f in files_before:
        shutil.copy(os.path.join(target, f), os.path.join(stash, f))
    stats1 = cow_merge(spark, target, upd, "k")
    assert stats1.files_rewritten >= 1
    rewritten = files_before - set(os.listdir(target))
    for f in rewritten:
        shutil.copy(os.path.join(stash, f), os.path.join(target, f))
    # duplicates now on disk
    assert spark.read.parquet(target).count() > 1000

    stats2 = cow_merge(spark, target, upd, "k")  # the repair rerun
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert len(got) == 1000
    assert spark.read.parquet(target).count() == 1000  # no dup rows
    assert all(got[k] == -1 for k in range(50))
    assert all(got[k] == k for k in range(50, 1000))


def test_secondary_index_prunes_partitions(spark, tmp_path):
    """The index read must touch only the probe bucket's directory
    (PartitionFilters on idx_bucket) and return exactly the rows a
    direct predicate returns."""
    from cassandra_data_migration_spark.sources.secondary_index import (
        build_secondary_index,
        index_lookup,
    )

    base = spark.range(0, 5000).select(
        F.col("id").alias("pk"),
        F.pmod("id", F.lit(37)).alias("val"),
        (F.col("id") * 2).alias("payload"),
    )
    idx = str(tmp_path / "idx")
    build_secondary_index(base, idx, "val", ["pk"], num_buckets=16)

    got = index_lookup(spark, base, idx, "val", ["pk"], 11, num_buckets=16)
    expect = base.filter(F.col("val") == 11)
    assert got.count() == expect.count() == len(range(11, 5000, 37))
    assert {r["pk"] for r in got.collect()} == {
        r["pk"] for r in expect.collect()
    }

    # plan pin: the index scan carries a partition filter on the
    # bucket column, so only one of 16 directories is read
    probe_bucket_df = spark.read.parquet(idx).filter(
        F.col("idx_bucket")
        == spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(11)), F.lit(16)).alias("b"))
        .collect()[0]["b"]
    )
    plan = probe_bucket_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "idx_bucket" in plan


def test_secondary_index_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["secondary_index_lookup"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["secondary_index_lookup"],
    )


def test_snapshot_time_travel_and_vacuum(spark, tmp_path):
    from cassandra_data_migration_spark.sources.lakehouse import (
        cow_merge,
        read_snapshot,
        snapshot_commit,
        snapshot_versions,
        vacuum_snapshots,
    )

    target = str(tmp_path / "t")
    spark.range(0, 400).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(
        target
    )
    assert snapshot_commit(target) == 0
    upd = spark.range(0, 30).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    # in manifest mode the merge commits the next version itself and
    # deletes NOTHING (vacuum owns reclamation)
    cow_merge(spark, target, upd, "k")
    assert snapshot_versions(target) == [0, 1]

    v1 = {r["k"]: r["v"] for r in read_snapshot(spark, target, 1).collect()}
    assert all(v1[k] == -1 for k in range(30))
    assert len(v1) == 400

    removed = vacuum_snapshots(target, keep_versions=1)
    assert snapshot_versions(target) == [1]
    # latest version still reads fine after vacuum
    assert read_snapshot(spark, target).count() == 400
    import pytest

    with pytest.raises(ValueError):
        read_snapshot(spark, target, 0)


def test_snapshot_v0_readable_before_vacuum(spark, tmp_path):
    """The merge deletes touched originals, so v0 is only fully
    readable if its files survive — this is why vacuum (not merge)
    owns deletion in manifest mode.  Pin the contract: with manifests
    committed, merge must NOT delete files a retained version needs.
    """
    from cassandra_data_migration_spark.sources.lakehouse import (
        cow_merge,
        read_snapshot,
        snapshot_commit,
    )

    target = str(tmp_path / "t")
    spark.range(0, 400).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(
        target
    )
    snapshot_commit(target)
    upd = spark.range(0, 30).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    cow_merge(spark, target, upd, "k")  # commits v1 itself
    v0 = {r["k"]: r["v"] for r in read_snapshot(spark, target, 0).collect()}
    assert len(v0) == 400
    assert all(v0[k] == k for k in range(400))  # pre-merge values


def test_cow_time_travel_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["cow_time_travel"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["cow_time_travel"],
    )


def test_cow_delete_semantics_and_pruning(spark, tmp_path):
    import os

    from cassandra_data_migration_spark.sources.lakehouse import cow_delete

    target = str(tmp_path / "t")
    spark.range(0, 800).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).repartitionByRange(8, "k").sortWithinPartitions("k").write.parquet(
        target
    )
    keys = spark.range(0, 60).select(F.col("id").alias("k"))
    stats = cow_delete(spark, target, keys, "k")
    assert 1 <= stats.files_rewritten < stats.files_total
    got = {r["k"] for r in spark.read.parquet(target).collect()}
    assert got == set(range(60, 800))


def test_cow_delete_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["cow_delete_purge"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["cow_delete_purge"],
    )


def test_optimize_snapshot_restores_disjoint_ranges(spark, tmp_path):
    """After merges widen file ranges, OPTIMIZE publishes a version
    whose files are range-disjoint again — and time travel across the
    optimize boundary still reads every version."""
    from cassandra_data_migration_spark.sources.lakehouse import (
        cow_merge,
        optimize_snapshot,
        parquet_key_ranges,
        read_snapshot,
        snapshot_commit,
        snapshot_versions,
    )

    target = str(tmp_path / "t")
    spark.range(0, 2000).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).repartitionByRange(8, "k").sortWithinPartitions("k").write.parquet(
        target
    )
    snapshot_commit(target)  # v0
    # two merges at opposite ends widen the rewritten files' ranges
    for lo, hi in ((0, 40), (1900, 1960)):
        upd = spark.range(lo, hi).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
        )
        cow_merge(spark, target, upd, "k")  # v1, v2
    v = optimize_snapshot(spark, target, "k", num_files=8)  # v3
    assert snapshot_versions(target) == [0, 1, 2, 3]

    import json as _json
    import os as _os

    with open(_os.path.join(target, "_manifests", f"v{v}.json")) as fh:
        files = [
            _os.path.join(target, f) for f in _json.load(fh)["files"]
        ]
    spans = sorted(
        (r["key_min"], r["key_max"])
        for r in parquet_key_ranges(spark, target, "k", files=files).collect()
    )
    for (_, h1), (l2, _) in zip(spans, spans[1:]):
        assert h1 < l2  # disjoint again
    # optimized view is value-identical to the pre-optimize version
    a = {(r["k"], r["v"]) for r in read_snapshot(spark, target, 2).collect()}
    b = {(r["k"], r["v"]) for r in read_snapshot(spark, target, 3).collect()}
    assert a == b and len(b) == 2000
    # v0 time travel still intact
    v0 = {r["k"]: r["v"] for r in read_snapshot(spark, target, 0).collect()}
    assert all(v0[k] == k for k in range(2000))


def test_stream_cow_upsert_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["stream_cow_upsert"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["stream_cow_upsert"],
    )


def test_cow_stream_replay_is_idempotent(spark, tmp_path):
    """Full fresh-checkpoint replay of the SAME ordered changelog must
    leave the table value-identical: merge-based apply is idempotent
    by construction (no gate; contrast the MV's delta fold)."""
    from cassandra_data_migration_spark.sources.lakehouse import (
        read_snapshot,
        snapshot_commit,
    )
    from cassandra_data_migration_spark.streaming.cow_stream import (
        cow_apply_changes_stream,
    )

    d = str(tmp_path)
    target, src = f"{d}/table", f"{d}/log"
    spark.createDataFrame(
        [(1, 100, 1, 10.0), (2, 100, 2, 20.0)],
        "k long, ts long, seq long, v double",
    ).write.parquet(target)
    snapshot_commit(target)
    batches = [
        [(1, 200, 3, 11.0, "U"), (3, 200, 4, 30.0, "I")],
        [(2, 300, 5, 0.0, "D"), (3, 300, 6, 31.0, "U")],
    ]
    schema = "k long, ts long, seq long, v double, op string"
    for b in batches:
        spark.createDataFrame(b, schema).repartition(1).write.mode(
            "append"
        ).parquet(src)

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = cow_apply_changes_stream(
            stream, target, "k", ckpt, ts_col="ts", seq_col="seq"
        )
        q.awaitTermination(180)

    run(f"{d}/ckpt1")
    first = {
        (r["k"], r["ts"], r["seq"], r["v"])
        for r in read_snapshot(spark, target).collect()
    }
    assert first == {(1, 200, 3, 11.0), (3, 300, 6, 31.0)}  # 2 deleted
    run(f"{d}/ckpt2")  # full redelivery, fresh lineage
    second = {
        (r["k"], r["ts"], r["seq"], r["v"])
        for r in read_snapshot(spark, target).collect()
    }
    assert second == first


def test_snapshot_changes_classifies_and_drops_unchanged(spark, tmp_path):
    from cassandra_data_migration_spark.sources.lakehouse import (
        cow_delete,
        cow_merge,
        snapshot_changes,
        snapshot_commit,
    )

    target = str(tmp_path / "t")
    spark.range(0, 100).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(
        target
    )
    snapshot_commit(target)  # v0
    upd = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    ins = spark.range(200, 203).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    cow_merge(spark, target, upd.unionByName(ins), "k")  # v1
    cow_delete(spark, target, spark.range(50, 53).select(
        F.col("id").alias("k")), "k")  # v2

    ch01 = {
        (r["k"], r["change_type"])
        for r in snapshot_changes(spark, target, 0, 1, "k").collect()
    }
    assert ch01 == {(k, "update") for k in range(10)} | {
        (k, "insert") for k in (200, 201, 202)
    }
    ch12 = {
        (r["k"], r["change_type"])
        for r in snapshot_changes(spark, target, 1, 2, "k").collect()
    }
    assert ch12 == {(k, "delete") for k in (50, 51, 52)}
    # diff of a version with itself is empty
    assert snapshot_changes(spark, target, 1, 1, "k").count() == 0


def test_snapshot_changes_feed_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["snapshot_changes_feed"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["snapshot_changes_feed"],
    )


def test_cow_merge_string_keys(spark, tmp_path):
    """String merge keys: footer min/max prune lexicographically
    (zero-padded ids give clean disjoint ranges); semantics identical
    to the integer path."""
    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    spark.range(0, 1000).select(
        F.format_string("k%04d", F.col("id")).alias("k"),
        F.col("id").alias("v"),
    ).repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(
        target
    )
    upd = spark.range(0, 50).select(
        F.format_string("k%04d", F.col("id")).alias("k"),
        F.lit(-1).cast("long").alias("v"),
    )
    ins = spark.createDataFrame(
        [("z9998", -2), ("z9999", -2)], "k string, v long"
    )
    stats = cow_merge(spark, target, upd.unionByName(ins), "k")
    assert 1 <= stats.files_rewritten < stats.files_total == 4
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert len(got) == 1002
    assert all(got[f"k{i:04d}"] == -1 for i in range(50))
    assert got["k0500"] == 500 and got["z9999"] == -2


def test_cow_merge_rejects_unsupported_key_type(spark, tmp_path):
    import pytest

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    spark.range(0, 10).select(
        (F.col("id") / 2.0).alias("k"), F.col("id").alias("v")
    ).write.parquet(target)
    upd = spark.range(0, 2).select(
        (F.col("id") / 2.0).alias("k"), F.lit(-1).cast("long").alias("v")
    )
    with pytest.raises(ValueError, match="merge keys"):
        cow_merge(spark, target, upd, "k")


def test_cow_merge_lww_stale_updates_lose(spark, tmp_path):
    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 10.0, 100), (2, 20.0, 900), (3, 30.0, 500)],
        "k long, v double, wt long",
    ).write.parquet(target)
    upd = spark.createDataFrame(
        # newer than 1, STALE vs 2, TIE with 3 (update wins), new key 4
        [(1, -1.0, 500), (2, -2.0, 500), (3, -3.0, 500), (4, -4.0, 500)],
        "k long, v double, wt long",
    )
    cow_merge(spark, target, upd, "k", writetime_col="wt")
    got = {r["k"]: (r["v"], r["wt"]) for r in spark.read.parquet(target).collect()}
    assert got[1] == (-1.0, 500)   # newer update won
    assert got[2] == (20.0, 900)   # stale update lost, base intact
    assert got[3] == (-3.0, 500)   # tie favors the update (idempotent)
    assert got[4] == (-4.0, 500)   # insert


def test_cow_merge_lww_replay_idempotent(spark, tmp_path):
    """Re-running the SAME LWW merge is a no-op table-value-wise (ties
    favor the update, which equals what's already there)."""
    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    spark.range(0, 100).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v"),
        F.lit(100).cast("long").alias("wt"),
    ).repartitionByRange(4, "k").write.parquet(target)
    upd = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v"),
        F.lit(200).cast("long").alias("wt"),
    )
    cow_merge(spark, target, upd, "k", writetime_col="wt")
    first = {(r["k"], r["v"], r["wt"]) for r in spark.read.parquet(target).collect()}
    cow_merge(spark, target, upd, "k", writetime_col="wt")  # replay
    second = {(r["k"], r["v"], r["wt"]) for r in spark.read.parquet(target).collect()}
    assert second == first
    assert (0, -1.0, 200) in first and (50, 50.0, 100) in first


def test_cow_merge_lww_oracle(spark, duck):
    import __spark_entry__ as m

    assert_df_matches_oracle(
        m.queries()["cow_merge_lww"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["cow_merge_lww"],
    )


def test_cow_merge_property_vs_dict_model(spark, tmp_path):
    """Property check: for md5-seeded update/delete batches, the COW
    table after a merge chain equals a plain dict fold of the same
    operations (the executable spec)."""
    import hashlib

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    def h(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    target = str(tmp_path / "t")
    n = 500
    rows = [(k, h(k, "v0") % 1000) for k in range(n)]
    spark.createDataFrame(rows, "k long, v long").repartitionByRange(
        4, "k"
    ).sortWithinPartitions("k").write.parquet(target)
    model = dict(rows)

    for rnd in range(3):
        upd = [
            (k, h(k, f"u{rnd}") % 1000)
            for k in range(n + 100)
            if h(k, f"pick{rnd}") % 7 == 0
        ]
        dels = [
            (k,)
            for k in range(n)
            if h(k, f"del{rnd}") % 11 == 0
            and all(k != u[0] for u in upd)
        ]
        cow_merge(
            spark,
            target,
            spark.createDataFrame(upd, "k long, v long"),
            "k",
            delete_keys=spark.createDataFrame(dels, "k long"),
        )
        for k, v in upd:
            model[k] = v
        for (k,) in dels:
            model.pop(k, None)
        got = {
            r["k"]: r["v"] for r in spark.read.parquet(target).collect()
        }
        assert got == model, f"round {rnd}: diverged from the dict model"


def test_cow_merge_lww_property_vs_dict_model(spark, tmp_path):
    """LWW-mode twin of the dict-model property: an update lands iff
    its writetime >= the held row's (tie favors the update)."""
    import hashlib

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    def h(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    target = str(tmp_path / "t")
    n = 400
    rows = [(k, h(k, "v0") % 1000, h(k, "w0") % 100) for k in range(n)]
    spark.createDataFrame(rows, "k long, v long, wt long").repartitionByRange(
        4, "k"
    ).sortWithinPartitions("k").write.parquet(target)
    model = {k: (v, w) for k, v, w in rows}

    for rnd in range(3):
        upd = [
            (k, h(k, f"u{rnd}") % 1000, h(k, f"w{rnd}") % 100)
            for k in range(n + 50)
            if h(k, f"pick{rnd}") % 5 == 0
        ]
        cow_merge(
            spark,
            target,
            spark.createDataFrame(upd, "k long, v long, wt long"),
            "k",
            writetime_col="wt",
        )
        for k, v, w in upd:
            if k not in model or w >= model[k][1]:
                model[k] = (v, w)
        got = {
            r["k"]: (r["v"], r["wt"])
            for r in spark.read.parquet(target).collect()
        }
        assert got == model, f"round {rnd}: LWW diverged from the model"


def test_cow_merge_composite_key(spark, tmp_path):
    """Cassandra PK shape: (partition key, clustering key).  Matching
    is composite-exact — updating (grp=5, seq=2) must not touch
    (grp=5, seq=3) — while pruning runs on the leading key's ranges."""
    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    base = spark.range(0, 200).select(
        (F.col("id") % 50).alias("grp"),
        (F.col("id") / 50).cast("long").alias("seq"),
        F.col("id").alias("v"),
    )
    base.repartitionByRange(4, "grp").sortWithinPartitions(
        "grp", "seq"
    ).write.parquet(target)

    upd = spark.createDataFrame(
        [(5, 2, -1), (5, 3, -2), (60, 0, -3)],  # two cells + one insert
        "grp long, seq long, v long",
    )
    dels = spark.createDataFrame([(7, 1)], "grp long, seq long")
    stats = cow_merge(spark, target, upd, ["grp", "seq"], delete_keys=dels)
    assert 1 <= stats.files_rewritten <= stats.files_total
    got = {(r["grp"], r["seq"]): r["v"]
           for r in spark.read.parquet(target).collect()}
    assert got[(5, 2)] == -1 and got[(5, 3)] == -2
    assert got[(5, 0)] == 5 and got[(5, 1)] == 55  # same-grp cells intact
    assert (7, 1) not in got and got[(7, 0)] == 7  # composite delete
    assert got[(60, 0)] == -3  # insert
    assert len(got) == 200 + 1 - 1


def test_cow_merge_delete_keys_arity_checked(spark, tmp_path):
    import pytest

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    target = str(tmp_path / "t")
    spark.range(0, 10).select(
        F.col("id").alias("grp"), F.lit(0).cast("long").alias("seq"),
        F.col("id").alias("v"),
    ).write.parquet(target)
    upd = spark.createDataFrame([(1, 0, -1)], "grp long, seq long, v long")
    bad = spark.createDataFrame([(1,)], "grp long")  # missing seq
    with pytest.raises(ValueError, match="delete_keys"):
        cow_merge(spark, target, upd, ["grp", "seq"], delete_keys=bad)


def test_vacuum_never_reclaims_latest_version(spark, tmp_path):
    """keep_versions=0 must clamp to 1 — the latest version's files
    are never reclaimable on a live table."""
    from cassandra_data_migration_spark.sources.lakehouse import (
        read_snapshot,
        snapshot_commit,
        vacuum_snapshots,
    )

    target = str(tmp_path / "t")
    spark.range(0, 50).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    ).write.parquet(target)
    snapshot_commit(target)
    vacuum_snapshots(target, keep_versions=0)
    assert read_snapshot(spark, target).count() == 50


def test_line_dedup_separator_is_literal(spark):
    """A regex metacharacter separator must split literally, not
    per-character."""
    from cassandra_data_migration_spark.operators.text import line_dedup_docs

    df = spark.createDataFrame(
        [(0, "alpha beta gamma|delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = line_dedup_docs(df, sep="|").collect()[0]
    assert out["n_kept"] == 2
    assert out["clean_text"] == "alpha beta gamma|delta epsilon zeta"
