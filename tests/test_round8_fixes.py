"""Round-5-session fixes: bucketed-table cross-process safety, output
schema gates, and harness-robustness regressions from VERDICT.md r4."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from cassandra_data_migration_spark.session import get_spark
    from cassandra_data_migration_spark.sources.tables import (
        bucketed_join_revenue,
    )

    spark = get_spark(app_name="bkt-race-" + sys.argv[1],
                      shuffle_partitions=4)
    rows = {{}}
    # two rebuild+read cycles per process widens the race window the
    # old shared-path code lost to (rmtree under a concurrent reader)
    for _ in range(2):
        got = {{r["o_orderstatus"]: (r["sum_price"], r["sum_qty"], r["n_items"])
               for r in bucketed_join_revenue(
                   spark, "/root/testdata/sf0.001").collect()}}
        rows = got
    print("RESULT:" + json.dumps(sorted(
        (k, v[2]) for k, v in rows.items())))
    spark.stop()
    """
)


def test_bucketed_table_concurrent_sessions_read_consistent(tmp_path):
    """r4 VERDICT 'What's wrong #2': two concurrent driver processes
    racing on spark-warehouse/<table> returned silently-wrong
    aggregates.  With appId-namespaced physical tables, both processes
    must produce identical, oracle-consistent counts."""
    script = _WORKER.format(repo=REPO)
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=REPO,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT:")]
        assert line, f"no RESULT line in:\n{out[-2000:]}"
        outs.append(line[0])
    assert outs[0] == outs[1], f"divergent results: {outs}"
    # oracle: plain (non-bucketed) join in THIS session's DuckDB twin
    import duckdb

    con = duckdb.connect()
    exp = con.execute(
        """
        SELECT o.o_orderstatus, COUNT(*) AS n
        FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') l
        JOIN read_parquet('/root/testdata/sf0.001/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    import json

    got = json.loads(outs[0][len("RESULT:") :])
    assert [(k, n) for k, n in got] == [(k, n) for k, n in exp]


def _mk_state(tmp_path, marker: str | None, ckpt_qid: str | None):
    import json

    state = tmp_path / "state"
    state.mkdir(parents=True, exist_ok=True)
    if marker is not None:
        (state / "_applied_batch").write_text(marker)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir(parents=True, exist_ok=True)
    if ckpt_qid is not None:
        (ckpt / "metadata").write_text(json.dumps({"id": ckpt_qid}))
    return str(state), str(ckpt)


def test_replay_gate_same_lineage_skips_applied_batches(tmp_path):
    from cassandra_data_migration_spark.streaming.mv import _replay_gate

    state, ckpt = _mk_state(tmp_path, "qid1:3", "qid1")
    assert _replay_gate(state, ckpt, 3) == (True, "qid1")
    assert _replay_gate(state, ckpt, 2) == (True, "qid1")
    assert _replay_gate(state, ckpt, 4) == (False, "qid1")


def test_replay_gate_fresh_lineage_on_existing_state_raises(tmp_path):
    """ADVICE r4 (medium): a fresh checkpoint restarts batch ids at 0;
    comparing them against another lineage's marker silently DROPS new
    batches.  The gate must raise, not undercount."""
    from cassandra_data_migration_spark.streaming.mv import _replay_gate

    state, ckpt = _mk_state(tmp_path, "qid1:3", "qid2")
    with pytest.raises(RuntimeError, match="lineage|checkpoint"):
        _replay_gate(state, ckpt, 0)


def test_cc_star_raises_when_unconverged(spark):
    """ADVICE r4: unconverged CC labels are silently wrong — the star
    algorithm must raise when max_iter is exhausted, matching the
    k_core/bfs_hops convention."""
    from cassandra_data_migration_spark.operators.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(9)], "id long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components_star(edges, nodes, max_iter=0)
    # and converges fine with the default budget
    got = connected_components_star(edges, nodes).collect()
    assert {r["component"] for r in got} == {0}


def test_prometheus_label_newline_escaped():
    """An unescaped newline in a label value breaks the whole /metrics
    scrape (exposition format requires \\n escaping)."""
    from cassandra_data_migration_spark.streaming.prometheus import (
        _fmt_labels,
    )

    out = _fmt_labels({"q": 'a\nb"c\\d'})
    assert "\n" not in out
    assert out == '{q="a\\nb\\"c\\\\d"}'


def test_replay_gate_fresh_state_and_legacy_marker_tolerated(tmp_path):
    from cassandra_data_migration_spark.streaming.mv import _replay_gate

    # no marker yet: first batch of a new sink proceeds
    state, ckpt = _mk_state(tmp_path, None, "qid9")
    assert _replay_gate(state, ckpt, 0) == (False, "qid9")
    # legacy (pre-lineage) marker: id compare still applies, no raise
    state2, ckpt2 = _mk_state(tmp_path / "b", "5", "qid9")
    assert _replay_gate(state2, ckpt2, 5) == (True, "qid9")
    assert _replay_gate(state2, ckpt2, 6) == (False, "qid9")


# ---------------------------------------------------------------------------
# VERDICT r4 item 8: chaos-matrix for the trackRun resume path.  Three
# crash points, one invariant: resume never duplicates and never drops
# a row (docs/04-cdm-approach.md:843-846 autoRerun semantics).
# ---------------------------------------------------------------------------

def _migrate_cfg(origin, target, track_dir, prev=None):
    from cassandra_data_migration_spark.plans.migrate import MigrationConfig

    return MigrationConfig(
        origin_path=origin,
        target_path=target,
        track_run=True,
        track_key_col="o_orderkey",
        track_dir=track_dir,
        previous_run_id=prev,
    )


def _assert_exactly_once(spark, origin, target):
    src = spark.read.parquet(origin)
    tgt = spark.read.parquet(target)
    assert tgt.count() == src.count()  # no drop, no duplicate
    assert (
        tgt.select("o_orderkey").distinct().count()
        == src.select("o_orderkey").distinct().count()
    )


def test_has_committed_files_ignores_uncommitted_debris(tmp_path):
    from cassandra_data_migration_spark.plans.tracker import (
        _has_committed_files,
    )

    t = tmp_path / "tgt"
    assert not _has_committed_files(str(t))  # absent
    t.mkdir()
    assert not _has_committed_files(str(t))  # empty
    # killed-mid-write debris: committer scratch + markers + crc only
    attempt = t / "_temporary" / "0" / "_temporary" / "attempt_x_0"
    attempt.mkdir(parents=True)
    (attempt / "part-00000.parquet").write_bytes(b"PAR1partial")
    (t / "_SUCCESS").write_bytes(b"")
    (t / ".part-0.crc").write_bytes(b"x")
    assert not _has_committed_files(str(t))
    (t / "part-00000.parquet").write_bytes(b"PAR1")
    assert _has_committed_files(str(t))


def test_resume_after_crash_mid_write(spark, tmp_path):
    """Killed DURING the write job: target holds only _temporary
    debris, tracker holds nothing.  Resume must treat it as
    from-scratch (old code crashed on schema inference here)."""
    from cassandra_data_migration_spark.plans.migrate import migrate
    from cassandra_data_migration_spark.plans.tracker import RunTracker

    origin = "/root/testdata/sf0.001/orders.parquet"
    target = str(tmp_path / "tgt")
    track = str(tmp_path / "runinfo")
    crashed = RunTracker(spark, track).new_run()
    debris = os.path.join(target, "_temporary", "0", "_temporary", "a_0")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-00000.parquet"), "wb") as f:
        f.write(b"PAR1partial")

    res = migrate(spark, _migrate_cfg(origin, target, track, prev=crashed))
    src = spark.read.parquet(origin)
    assert res.rows_written == src.count()
    _assert_exactly_once(spark, origin, target)


def test_resume_after_crash_post_commit_pre_record(spark, tmp_path):
    """Killed AFTER the write committed but BEFORE any bucket record
    landed: the target is complete, the tracker says nothing is.  A
    naive resume would re-append the whole table; reconcile must
    recover every bucket and the resume write zero new rows."""
    from cassandra_data_migration_spark.plans.migrate import migrate
    from cassandra_data_migration_spark.plans.tracker import RunTracker

    origin = "/root/testdata/sf0.001/orders.parquet"
    target = str(tmp_path / "tgt")
    track = str(tmp_path / "runinfo")
    spark.read.parquet(origin).write.parquet(target)  # the committed write
    crashed = RunTracker(spark, track).new_run()  # died before records

    res = migrate(spark, _migrate_cfg(origin, target, track, prev=crashed))
    assert res.rows_written == 0
    _assert_exactly_once(spark, origin, target)


def test_resume_after_crash_between_record_batches(spark, tmp_path):
    """Killed mid-RECORDING: buckets 0..15 committed to the target,
    but only 0..7 got tracker records.  Reconcile recovers 8..15 from
    the target itself; resume appends exactly buckets 16..31."""
    from pyspark.sql import functions as F

    from cassandra_data_migration_spark.plans.migrate import migrate
    from cassandra_data_migration_spark.plans.tracker import RunTracker

    origin = "/root/testdata/sf0.001/orders.parquet"
    target = str(tmp_path / "tgt")
    track = str(tmp_path / "runinfo")
    tr = RunTracker(spark, track)
    crashed = tr.new_run()
    src = spark.read.parquet(origin)
    bucket = F.pmod("o_orderkey", F.lit(tr.num_buckets))
    committed = list(range(16))
    src.filter(bucket.isin(committed)).write.parquet(target)
    for b in range(8):  # records landed for only half the committed set
        n = src.filter(bucket == b).count()
        tr.record_bucket(crashed, b, "PASSED", rows=n)

    res = migrate(spark, _migrate_cfg(origin, target, track, prev=crashed))
    remaining = src.filter(~bucket.isin(committed)).count()
    assert res.rows_written == remaining
    _assert_exactly_once(spark, origin, target)
    # this run's details are self-contained: a THIRD resume off this
    # run id re-scans nothing
    res3 = migrate(
        spark, _migrate_cfg(origin, target, track, prev=res.run_id)
    )
    assert res3.rows_written == 0
    _assert_exactly_once(spark, origin, target)
