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
