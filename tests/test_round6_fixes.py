"""Round-4 robustness fixes (ADVICE.md + VERDICT.md 'what's wrong'):

- shadow-read metering is ONE action (no double exceptAll().count()),
  sampled, optionally async off the response path;
- migrate resume survives a post-commit-pre-record crash without
  appending duplicates (tracker reconciles against the target);
- streaming MV maintenance is redelivery-idempotent (batch-id marker
  committed with the data) and crash-safe across the swap;
- WARC parsing resyncs past malformed records instead of poisoning a
  whole ~1 GB task;
- substring-dedup gram hashes are 60-bit (no 32-bit birthday
  collisions falsely marking unique text as duplicated);
- streaming-quantile column labels are collision-safe.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- routing


def _mk(spark, n):
    return spark.range(n).select(F.col("id").alias("k"))


def test_shadow_compare_is_single_action(spark, monkeypatch):
    """The mismatch meter must run exactly ONE Spark action (an
    isEmpty probe over the unioned symmetric difference), never the
    old two full exceptAll().count() jobs."""
    from cassandra_data_migration_spark.streaming import routing

    cls = type(_mk(spark, 1))  # the concrete (classic) DataFrame class
    calls = {"isEmpty": 0}
    orig = cls.isEmpty

    def spy(self):
        calls["isEmpty"] += 1
        return orig(self)

    def banned(self):
        raise AssertionError("shadow compare must not run count()")

    monkeypatch.setattr(cls, "isEmpty", spy)
    monkeypatch.setattr(cls, "count", banned)

    m = routing.RouterMetrics()
    r = routing.ReadRouter(
        routing.ReadMode.DUAL_ASYNC_ON_SECONDARY, routing.Cluster.ORIGIN, m
    )
    r.route(_mk(spark, 10), _mk(spark, 8), lambda df: df)
    assert calls["isEmpty"] == 1
    assert m.shadow_reads == 1 and m.shadow_compared == 1
    assert m.shadow_mismatches == 1  # 10 vs 8 rows differ


def test_shadow_compare_sampled(spark):
    from cassandra_data_migration_spark.streaming import routing

    m = routing.RouterMetrics()
    r = routing.ReadRouter(
        routing.ReadMode.DUAL_ASYNC_ON_SECONDARY,
        routing.Cluster.ORIGIN,
        m,
        shadow_compare_every=3,
    )
    o, t = _mk(spark, 5), _mk(spark, 5)
    for _ in range(6):
        r.route(o, t, lambda df: df)
    # every read metered, 1-in-3 compared (reads 1 and 4)
    assert m.shadow_reads == 6
    assert m.shadow_compared == 2
    assert m.shadow_mismatches == 0


def test_shadow_compare_async_off_response_path(spark):
    """With an executor the compare runs off the caller's thread; the
    primary result is returned immediately and drain_shadow() joins
    the metering."""
    from concurrent.futures import ThreadPoolExecutor

    from cassandra_data_migration_spark.streaming import routing

    m = routing.RouterMetrics()
    with ThreadPoolExecutor(max_workers=1) as ex:
        r = routing.ReadRouter(
            routing.ReadMode.DUAL_ASYNC_ON_SECONDARY,
            routing.Cluster.ORIGIN,
            m,
            shadow_executor=ex,
        )
        out = r.route(_mk(spark, 10), _mk(spark, 9), lambda df: df)
        assert out.count() == 10  # primary result, shadow never surfaces
        r.drain_shadow()
    assert m.shadow_reads == 1 and m.shadow_compared == 1
    assert m.shadow_mismatches == 1


# ------------------------------------------------------- migrate resume


def test_migrate_resume_after_record_crash_no_duplicates(spark, tmp_path):
    """Crash window: the write job COMMITS, then the process dies
    before any record_bucket runs.  A resume must detect the committed
    rows and append nothing — parquet append is not an idempotent
    upsert, so re-scanning would duplicate every row."""
    from cassandra_data_migration_spark.plans.migrate import (
        MigrationConfig,
        migrate,
    )

    origin = str(tmp_path / "origin")
    target = str(tmp_path / "target")
    track = str(tmp_path / "track")
    spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(origin)

    cfg = MigrationConfig(
        origin_path=origin,
        target_path=target,
        track_run=True,
        track_dir=track,
        track_key_col="k",
    )
    res1 = migrate(spark, cfg)
    assert res1.rows_written == 1000
    # simulate the crash: write committed, bucket records lost
    shutil.rmtree(f"{track}/run_details/run_id={res1.run_id}")

    cfg2 = MigrationConfig(
        origin_path=origin,
        target_path=target,
        track_run=True,
        track_dir=track,
        track_key_col="k",
        previous_run_id=res1.run_id,
    )
    res2 = migrate(spark, cfg2)
    assert res2.rows_written == 0  # everything reconciled as done
    got = spark.read.parquet(target)
    assert got.count() == 1000
    assert got.select("k").distinct().count() == 1000  # no duplicate keys


def test_migrate_resume_partial_crash_completes_only_pending(spark, tmp_path):
    """Half the buckets recorded, half crashed post-commit: resume
    must append nothing (all rows are already in the target) and the
    final target must hold each key exactly once."""
    from cassandra_data_migration_spark.plans.migrate import (
        MigrationConfig,
        migrate,
    )
    from cassandra_data_migration_spark.plans.tracker import RunTracker

    origin = str(tmp_path / "origin")
    target = str(tmp_path / "target")
    track = str(tmp_path / "track")
    spark.range(640).select(F.col("id").alias("k")).write.parquet(origin)

    cfg = MigrationConfig(
        origin_path=origin,
        target_path=target,
        track_run=True,
        track_dir=track,
        track_key_col="k",
    )
    res1 = migrate(spark, cfg)
    # drop the records for buckets 16..31 only (simulated partial loss)
    tr = RunTracker(spark, track)
    kept = {b for b, _ in tr.completed_bucket_rows(res1.run_id) if b < 16}
    shutil.rmtree(f"{track}/run_details/run_id={res1.run_id}")
    for b in sorted(kept):
        tr.record_bucket(res1.run_id, b, "PASSED", rows=20)

    cfg2 = MigrationConfig(
        origin_path=origin,
        target_path=target,
        track_run=True,
        track_dir=track,
        track_key_col="k",
        previous_run_id=res1.run_id,
    )
    res2 = migrate(spark, cfg2)
    assert res2.rows_written == 0
    got = spark.read.parquet(target)
    assert got.count() == 640
    assert got.select("k").distinct().count() == 640


# ------------------------------------------------------------ MV stream


def _mv_fixture(spark, d):
    from cassandra_data_migration_spark.operators.mv import mv_build

    base = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (2, 6.0)], "k long, v double"
    )
    log_rows = [
        (1, "U", 10.0, 12.0),
        (2, "D", 5.0, None),
        (3, "I", None, 9.0),
    ]
    schema = "k long, op string, before_v double, after_v double"
    view, src = f"{d}/view", f"{d}/log"
    mv_build(base, "k", "v").write.parquet(view)
    for row in log_rows:
        spark.createDataFrame([row], schema).repartition(1).write.mode(
            "append"
        ).parquet(src)
    return view, src, schema


def _run_mv(spark, view, src, schema, ckpt):
    from cassandra_data_migration_spark.streaming.mv import mv_maintain_stream

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = mv_maintain_stream(stream, view, "k", ckpt)
    q.awaitTermination(120)


def test_mv_fresh_lineage_redelivery_fails_loud(spark, tmp_path):
    """foreachBatch is at-least-once and signed deltas are NOT
    idempotent.  Replay markers are keyed on checkpoint LINEAGE
    (r4 ADVICE: bare batch-id gates silently DROP new batches when a
    fresh checkpoint restarts ids at 0), so pointing a fresh-
    checkpoint stream at existing view state cannot be distinguished
    from data loss and must FAIL FAST — and the failed run must leave
    the view exactly as the first run published it.  Same-lineage
    replay no-op semantics are pinned separately by the shared
    replay-gate tests in test_round8_fixes."""
    import pyspark.errors

    d = str(tmp_path)
    view, src, schema = _mv_fixture(spark, d)
    _run_mv(spark, view, src, schema, f"{d}/ckpt1")
    first = {
        r["k"]: (r["n_rows"], float(r["sum_val"]))
        for r in spark.read.parquet(view).collect()
    }
    assert first[1] == (1, 12.0)  # U applied exactly once
    assert 2 in first and first[2] == (1, 6.0)  # D applied exactly once
    assert first[3] == (1, 9.0)  # I applied exactly once
    # full redelivery attempt: same files, FRESH checkpoint -> loud
    # lineage-mismatch failure, not a silent (and wrong) re-fold
    with pytest.raises(pyspark.errors.StreamingQueryException):
        _run_mv(spark, view, src, schema, f"{d}/ckpt2")
    second = {
        r["k"]: (r["n_rows"], float(r["sum_val"]))
        for r in spark.read.parquet(view).collect()
    }
    assert second == first  # view untouched by the rejected rerun


def test_mv_recover_restores_view_after_swap_crash(spark, tmp_path):
    """Death between the two swap renames leaves only view_prev; the
    recovery preamble must roll it back instead of losing the view."""
    from cassandra_data_migration_spark.streaming.mv import _recover

    d = str(tmp_path)
    view = f"{d}/view"
    spark.range(5).write.parquet(view)
    # crash window 1: after rename(view -> prev), before rename(tmp -> view)
    os.rename(view, f"{view}_prev")
    _recover(view)
    assert os.path.exists(view) and not os.path.exists(f"{view}_prev")
    assert spark.read.parquet(view).count() == 5
    # crash window 2: swap completed but _prev cleanup didn't run
    spark.range(3).write.parquet(f"{view}_prev")
    _recover(view)
    assert not os.path.exists(f"{view}_prev")
    assert spark.read.parquet(view).count() == 5  # new view untouched


# ----------------------------------------------------------------- WARC


def _sample_records():
    return [
        {
            "record_id": "<urn:uuid:1>",
            "warc_type": "response",
            "target_uri": "http://a.example/",
            "http_status": 200,
            "http_content_type": "text/html",
            "payload": b"<html>alpha</html>",
        },
        {
            "record_id": "<urn:uuid:2>",
            "warc_type": "response",
            "target_uri": "http://b.example/",
            "http_status": 404,
            "http_content_type": "text/html",
            "payload": b"<html>beta</html>",
        },
    ]


def test_warc_resyncs_past_malformed_record():
    from cassandra_data_migration_spark.sources.warc import (
        build_warc,
        parse_warc_stream,
    )

    a, b = _sample_records()
    good_a = build_warc([a], compress=False)
    good_b = build_warc([b], compress=False)
    garbage = b"NOT-A-RECORD\r\njunk: bytes\r\n\r\nmore garbage"
    data = good_a + garbage + good_b
    recs = list(parse_warc_stream(data))
    kinds = [r["warc_type"] for r in recs]
    assert kinds.count("response") == 2
    assert kinds.count("__malformed__") == 1
    uris = {r["target_uri"] for r in recs if r["warc_type"] == "response"}
    assert uris == {"http://a.example/", "http://b.example/"}
    # strict mode preserves raise-on-first-error for self-validation
    with pytest.raises(ValueError):
        list(parse_warc_stream(data, strict=True))


def test_warc_resyncs_past_missing_content_length():
    from cassandra_data_migration_spark.sources.warc import (
        build_warc,
        parse_warc_stream,
    )

    a, b = _sample_records()
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:bad>\r\n\r\n"
        b"body with no declared length"
    )
    data = bad + build_warc([a], compress=False) + build_warc([b], compress=False)
    recs = list(parse_warc_stream(data))
    kinds = [r["warc_type"] for r in recs]
    assert kinds.count("response") == 2
    assert kinds.count("__malformed__") == 1


# ----------------------------------------------------- quantile labels


def test_percentile_labels_are_collision_safe():
    from cassandra_data_migration_spark.streaming.quantiles import (
        percentile_col,
    )

    # the defaults keep their historical names
    assert percentile_col(0.5) == "p50_uc"
    assert percentile_col(0.95) == "p95_uc"
    assert percentile_col(0.99) == "p99_uc"
    # int() truncation used to mislabel 0.29 as p28
    assert percentile_col(0.29) == "p29_uc"
    # and collapse 0.999 into p99 (duplicate column name)
    assert percentile_col(0.999) == "p99_9_uc"
    ps = (0.25, 0.29, 0.5, 0.95, 0.99, 0.995, 0.999)
    names = [percentile_col(p) for p in ps]
    assert len(set(names)) == len(names)


# ----------------------------------------------- substring dedup hash


def test_substring_gram_hash_is_60_bit(spark):
    """15-hex md5 prefix = 60-bit keys: values must exceed the 32-bit
    range somewhere (proving the widening) while unique text stays
    0-duplicated."""
    from cassandra_data_migration_spark.operators.dedup import (
        substring_dup_spans,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}x{j}" for j in range(30))) for i in range(50)],
        "doc_id long, text string",
    )
    out = substring_dup_spans(docs, k=5).collect()
    assert all(r["n_dup_spans"] == 0 and r["dup_tokens"] == 0 for r in out)
    # a shared 5-gram is still caught
    shared = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee unique1 unique2"),
            (2, "zz yy aa bb cc dd ee"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_dup_spans"] for r in
           substring_dup_spans(shared, k=5).collect()}
    assert got == {1: 1, 2: 1}


# ------------------------------------------------- dual-write exactly-once


def test_dual_write_redelivery_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-invoking the SAME batch_id
    (crash-before-checkpoint replay) must not duplicate origin rows.
    The parquet sink is batch-id-keyed overwrite, so redelivery
    rewrites the same directory — exactly-once end to end."""
    from cassandra_data_migration_spark.streaming.dual_write import (
        DualWriteMetrics,
        make_dual_writer,
        parquet_appender,
        read_sink,
    )

    origin = str(tmp_path / "origin")
    target = str(tmp_path / "target")
    m = DualWriteMetrics()
    writer = make_dual_writer(
        parquet_appender(origin), parquet_appender(target), m
    )
    b0 = spark.range(10).withColumn("v", F.col("id") * 2)
    b1 = spark.range(10, 25).withColumn("v", F.col("id") * 2)

    writer(b0, 0)
    writer(b1, 1)
    writer(b1, 1)  # redelivered: same batch id, same data
    writer(b0, 0)  # out-of-order redelivery of an older batch

    o = read_sink(spark, origin)
    t = read_sink(spark, target)
    assert o.count() == 25 and t.count() == 25  # no duplicates
    assert {r["id"] for r in o.collect()} == set(range(25))


def test_dual_write_partial_crash_then_redelivery(spark, tmp_path):
    """A batch that dies mid-write leaves partial files; the replayed
    batch must replace them wholesale, not stack on top."""
    from cassandra_data_migration_spark.streaming.dual_write import (
        make_dual_writer,
        parquet_appender,
        read_sink,
    )

    origin = str(tmp_path / "origin")
    target = str(tmp_path / "target")
    writer = make_dual_writer(parquet_appender(origin), parquet_appender(target))

    # simulate the partial crash: half the batch got committed under
    # this batch id before the executor died
    spark.range(5).withColumn("v", F.col("id")).write.mode("overwrite").parquet(
        f"{origin}/batch_id=7"
    )
    full = spark.range(20).withColumn("v", F.col("id"))
    writer(full, 7)  # redelivery of the complete batch

    assert read_sink(spark, origin).count() == 20
    assert read_sink(spark, target).count() == 20
