"""Cell-granularity Cassandra semantics (operators/cells.py):
sstable-merge compaction, quorum read repair, CAS replay — hand-built
semantic fixtures plus the DuckDB oracle twins."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.cells import (
    ROW_TOMBSTONE,
    cas_replay,
    cell_lww_compact,
    quorum_read_repair,
)
from tests.conftest import SF_CORRECT


def _cells(spark, rows):
    return spark.createDataFrame(
        rows,
        "pk long, column_name string, value_cents long, "
        "writetime_us long, is_tombstone boolean",
    )


def test_cell_lww_highest_writetime_wins(spark):
    out = cell_lww_compact(
        _cells(
            spark,
            [
                (1, "a", 10, 100, False),
                (1, "a", 20, 200, False),  # newer generation wins
                (1, "b", 5, 50, False),
            ],
        ),
        value_col="value_cents",
    ).collect()
    got = {(r["pk"], r["column_name"]): (r["value_cents"], r["writetime_us"]) for r in out}
    assert got == {(1, "a"): (20, 200), (1, "b"): (5, 50)}


def test_cell_lww_tombstone_beats_live_on_tie(spark):
    out = cell_lww_compact(
        _cells(
            spark,
            [
                (1, "a", 10, 100, False),
                (1, "a", 99, 100, True),  # delete at SAME writetime wins
                (1, "b", 7, 100, True),
                (1, "b", 8, 200, False),  # later write resurrects column
            ],
        ),
        value_col="value_cents",
    ).collect()
    got = {(r["pk"], r["column_name"]): r["value_cents"] for r in out}
    assert got == {(1, "b"): 8}, got


def test_cell_lww_row_tombstone_shadows_older_cells(spark):
    out = cell_lww_compact(
        _cells(
            spark,
            [
                (1, "a", 10, 100, False),
                (1, "b", 20, 150, False),
                (1, ROW_TOMBSTONE, 0, 120, True),  # row delete at t=120
                (2, "a", 5, 50, False),
            ],
        ),
        value_col="value_cents",
    ).collect()
    got = {(r["pk"], r["column_name"]): r["value_cents"] for r in out}
    # pk=1 col a (wt 100 <= 120) shadowed; col b (wt 150 > 120) survives
    assert got == {(1, "b"): 20, (2, "a"): 5}, got


def test_quorum_read_repair_modes(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "k long, v long, wt long"
    )
    r0 = mk([(1, 10, 100), (2, 20, 100), (3, 30, 100), (4, 40, 100)])
    r1 = mk([(1, 10, 100), (2, 21, 200), (3, 30, 100)])  # k2 newer; k4 missing
    r2 = mk([(1, 10, 100), (2, 20, 100), (3, 31, 100), (4, 40, 100)])  # k3 tie-corrupt
    out = quorum_read_repair([r0, r1, r2], "k", "v", "wt").collect()
    got = {r["k"]: (r["winner_v"], r["winner_wt"], r["n_stale"]) for r in out}
    assert 1 not in got  # consistent everywhere -> dropped
    assert got[2] == (21, 200, 2)  # two replicas behind the newer write
    assert got[3] == (31, 100, 2)  # value tie-break at equal writetime
    assert got[4] == (40, 100, 1)  # one replica missing the key
    n_present = {r["k"]: r["n_replicas_present"] for r in out}
    assert n_present[4] == 2


def test_cas_replay_fold_semantics(spark):
    ops = spark.createDataFrame(
        [
            # key 1: set 5; CAS 5->7 applies; CAS 9->1 rejects
            (1, 100, 1, None, 5),
            (1, 200, 2, 5, 7),
            (1, 300, 3, 9, 1),
            # key 2: conditional against NULL initial state rejects
            (2, 100, 4, 0, 3),
            (2, 200, 5, None, 3),
        ],
        "k long, ts long, seq long, expected long, new_value long",
    )
    out = cas_replay(ops, "k", "ts", "seq", "expected", "new_value").collect()
    got = {
        r["k"]: (r["final_value"], r["n_applied"], r["n_rejected"])
        for r in out
    }
    assert got == {1: (7, 2, 1), 2: (3, 1, 1)}, got


def test_cas_replay_order_is_ts_then_seq(spark):
    # same-ts ops apply in seq order: set 1 (seq 1) then CAS 1->2 (seq 2)
    ops = spark.createDataFrame(
        [(1, 100, 2, 1, 2), (1, 100, 1, None, 1)],
        "k long, ts long, seq long, expected long, new_value long",
    )
    row = cas_replay(ops, "k", "ts", "seq", "expected", "new_value").collect()[0]
    assert (row["final_value"], row["n_applied"]) == (2, 2)


def _oracle_match(spark, duck, name):
    import __spark_entry__ as m

    sdf = m.queries()[name](spark, SF_CORRECT).toPandas()
    odf = duck.execute(m.oracle_sql()[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return len(a)


def test_cell_compaction_oracle(spark, duck):
    assert _oracle_match(spark, duck, "cell_compaction") > 0


def test_quorum_read_repair_oracle(spark, duck):
    assert _oracle_match(spark, duck, "quorum_read_repair") > 0


def test_cas_replay_oracle(spark, duck):
    assert _oracle_match(spark, duck, "cas_replay") > 0


def test_new_queries_scalar_only_schema(spark):
    """Harness-compat gate for the round-10 additions specifically
    (the global walk in test_entry_contract covers all queries)."""
    import __spark_entry__ as m

    from tests.conftest import assert_scalar_only_schema

    for name in ("cell_compaction", "quorum_read_repair", "cas_replay"):
        df = m.queries()[name](spark, "/root/testdata/sf0.001")
        assert_scalar_only_schema(df, name)


def test_cell_lww_view_stream_equals_batch(spark, tmp_path):
    """The streamed view over micro-batch slices must equal the batch
    argmax over the full log — including a cross-batch conflict where
    the OLDER write arrives in a LATER batch and must lose."""
    from cassandra_data_migration_spark.streaming import await_or_raise
    from cassandra_data_migration_spark.streaming.cells import (
        cell_lww_view_stream,
    )

    schema = (
        "pk long, column_name string, value_cents long, "
        "writetime_us long, is_tombstone boolean"
    )
    batch1 = [(1, "a", 10, 200, False), (2, "a", 5, 100, False)]
    # batch 2: stale write for (1,a) — must NOT displace wt=200;
    # newer tombstone for (2,a) — must win and flag deleted
    batch2 = [(1, "a", 99, 150, False), (2, "a", 0, 300, True)]
    src = str(tmp_path / "src")
    for i, rows in enumerate([batch1, batch2]):
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sink_dir, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def sink(b, bid):
        b.withColumn("_bid", F.lit(bid)).write.mode("append").parquet(
            sink_dir
        )

    q = (
        cell_lww_view_stream(stream, value_col="value_cents")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    from pyspark.sql import Window

    w = Window.partitionBy("pk", "column_name").orderBy(F.desc("_bid"))
    final = (
        spark.read.parquet(sink_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    got = {
        (r["pk"], r["column_name"]): (
            r["value_cents"],
            r["writetime_us"],
            r["is_deleted"],
        )
        for r in final.collect()
    }
    assert got == {
        (1, "a"): (10, 200, False),  # stale later-batch write lost
        (2, "a"): (0, 300, True),  # newer tombstone won, flagged
    }, got


def test_stream_cell_lww_oracle(spark, duck):
    assert _oracle_match(spark, duck, "stream_cell_lww") > 0


def test_tombstone_gc_report_semantics(spark):
    from cassandra_data_migration_spark.operators.cells import (
        tombstone_gc_report,
    )

    cells = _cells(
        spark,
        [
            # col a, key 1: two versions -> 1 superseded; winner live
            (1, "a", 10, 100, False),
            (1, "a", 20, 200, False),
            # col a, key 2: tombstone winner INSIDE grace -> retained
            (2, "a", 0, 950, True),
            # col a, key 3: tombstone winner OUTSIDE grace -> purgeable
            (3, "a", 0, 100, True),
            # col b, key 4: live winner shadowed by row tombstone
            (4, "b", 7, 100, False),
            (4, ROW_TOMBSTONE, 0, 150, True),
        ],
    )
    out = tombstone_gc_report(
        cells, F.lit(1000), gc_grace_us=500, value_col="value_cents"
    ).collect()
    got = {
        r["column_name"]: (
            r["n_versions"],
            r["n_superseded"],
            r["n_live"],
            r["n_shadowed"],
            r["n_tomb_retained"],
            r["n_tomb_purgeable"],
        )
        for r in out
    }
    assert got["a"] == (4, 1, 1, 0, 1, 1), got
    assert got["b"] == (1, 0, 0, 1, 0, 0), got
    # the row-tombstone marker column reports its own retention:
    # wt=150 < 1000-500 -> purgeable
    assert got[ROW_TOMBSTONE] == (1, 0, 0, 0, 0, 1), got


def test_tombstone_gc_oracle(spark, duck):
    assert _oracle_match(spark, duck, "tombstone_gc") > 0


# --- property checks vs executable Python models ---------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

cell_logs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # pk — few keys, collisions
        st.sampled_from(["a", "b", ROW_TOMBSTONE]),
        st.integers(min_value=0, max_value=5),  # value
        st.integers(min_value=0, max_value=10),  # writetime
        st.booleans(),  # tombstone
    ),
    min_size=1,
    max_size=16,
)


@settings(max_examples=8, deadline=None)
@given(log=cell_logs)
def test_cell_lww_compact_matches_dict_model(spark, log):
    got = {
        (r["pk"], r["column_name"]): (r["value_cents"], r["writetime_us"])
        for r in cell_lww_compact(
            _cells(spark, log), value_col="value_cents"
        ).collect()
    }
    # model: winner per (pk,col) = max (wt, tomb, val); row tombstone =
    # max wt of the marker column; live = non-tomb winner above it
    win: dict = {}
    row_wt: dict = {}
    for pk, col, val, wt, tomb in log:
        if col == ROW_TOMBSTONE:
            row_wt[pk] = max(row_wt.get(pk, -1), wt)
        else:
            cand = (wt, int(tomb), val)
            if cand > win.get((pk, col), (-1, -1, -1)):
                win[(pk, col)] = cand
    expect = {
        (pk, col): (val, wt)
        for (pk, col), (wt, tomb, val) in win.items()
        if tomb == 0 and wt > row_wt.get(pk, -1)
    }
    assert got == expect, (got, expect, log)


cas_logs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=20),  # ts (collisions likely)
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # exp
        st.integers(min_value=0, max_value=3),  # new
    ),
    min_size=1,
    max_size=16,
)


@settings(max_examples=8, deadline=None)
@given(log=cas_logs)
def test_cas_replay_matches_python_fold(spark, log):
    rows = [(k, ts, seq, exp, new) for seq, (k, ts, exp, new) in enumerate(log)]
    df = spark.createDataFrame(
        rows, "k long, ts long, seq long, expected long, new_value long"
    )
    got = {
        r["k"]: (r["final_value"], r["n_applied"], r["n_rejected"])
        for r in cas_replay(
            df, "k", "ts", "seq", "expected", "new_value"
        ).collect()
    }
    model: dict = {}
    for k, ts, seq, exp, new in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        cur, ap, rej = model.get(k, (None, 0, 0))
        if exp is None or (cur is not None and exp == cur):
            model[k] = (new, ap + 1, rej)
        else:
            model[k] = (cur, ap, rej + 1)
    assert got == model, (got, model, rows)


@settings(max_examples=6, deadline=None)
@given(log=cell_logs)
def test_stream_view_equals_batch_view_any_log(spark, log):
    """cell_lww_view_stream's aggregation evaluated as a BATCH plan
    (identical operator tree) equals the dict-model winner — the
    stream-vs-batch equivalence then follows from max's idempotence
    and commutativity (pinned end-to-end in the slice test above)."""
    from cassandra_data_migration_spark.streaming.cells import (
        cell_lww_view_stream,
    )

    got = {
        (r["pk"], r["column_name"]): (
            r["value_cents"],
            r["writetime_us"],
            r["is_deleted"],
        )
        for r in cell_lww_view_stream(
            _cells(spark, log), value_col="value_cents"
        ).collect()
    }
    win: dict = {}
    for pk, col, val, wt, tomb in log:
        cand = (wt, int(tomb), val)
        if cand > win.get((pk, col), (-1, -1, -1)):
            win[(pk, col)] = cand
    expect = {
        (pk, col): (val, wt, tomb == 1)
        for (pk, col), (wt, tomb, val) in win.items()
    }
    assert got == expect, (got, expect, log)


def test_repair_pipeline_scopes_and_converges(spark, duck):
    """The anti-entropy composite: sparse divergence must flag only a
    subset of leaves, scope row work to those ranges, and converge in
    one pass (post counts 0). Then the full oracle parity check."""
    import __spark_entry__ as m

    got = {
        r["metric"]: r["value"]
        for r in m.queries()["repair_pipeline"](spark, SF_CORRECT).collect()
    }
    assert 0 < got["divergent_leaves"] < 64  # scoping is real
    assert got["scoped_origin_rows"] < 15000  # healthy ranges skipped
    assert got["missing_repaired"] > 0 and got["mismatched_repaired"] > 0
    assert got["extra_removed"] == 0  # this fixture only drops/mutates
    assert got["post_missing"] == 0 and got["post_mismatched"] == 0
    assert got["post_extra"] == 0
    assert _oracle_match(spark, duck, "repair_pipeline") == 8


repair_divergence = st.tuples(
    st.sets(st.integers(min_value=0, max_value=199), max_size=20),  # missing
    st.sets(st.integers(min_value=0, max_value=199), max_size=20),  # mutated
    st.sets(st.integers(min_value=500, max_value=599), max_size=10),  # extras
)


@settings(max_examples=6, deadline=None)
@given(div=repair_divergence)
def test_repair_pipeline_converges_for_any_divergence(spark, div):
    """Property: for ANY missing/mutated key sets, the Merkle-scoped
    repair counts exactly the injected divergence and converges in one
    pass (post counts 0)."""
    from cassandra_data_migration_spark.plans.repair import (
        merkle_scoped_repair,
    )

    missing, mutated, extras = div
    mutated = mutated - missing  # a missing key can't also mismatch
    origin = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    target = (
        origin.filter(~F.col("k").isin(list(missing) or [-1]))
        .withColumn(
            "v",
            F.when(
                F.col("k").isin(list(mutated) or [-1]), F.col("v") + 1
            ).otherwise(F.col("v")),
        )
        .unionByName(
            # target-only rows: keys origin never had, must be DELETED
            spark.createDataFrame(
                [(k, -k) for k in extras] or [(None, None)],
                "k long, v long",
            ).filter(F.col("k").isNotNull())
        )
    )
    got = {
        r["metric"]: r["value"]
        for r in merkle_scoped_repair(origin, target, "k", ["k", "v"]).collect()
    }
    assert got["missing_repaired"] == len(missing), (got, missing)
    assert got["mismatched_repaired"] == len(mutated), (got, mutated)
    assert got["extra_removed"] == len(extras), (got, extras)
    assert got["post_missing"] == 0 and got["post_mismatched"] == 0
    assert got["post_extra"] == 0, got
    if not missing and not mutated and not extras:
        assert got["divergent_leaves"] == 0
        assert got["scoped_origin_rows"] == 0


# --- per-cell TTL (apply_cell_ttl) ------------------------------------------


def _ttl_cells(spark, rows):
    """(pk, col, value, wt, tomb, ttl_s) rows."""
    return spark.createDataFrame(
        rows,
        "pk long, column_name string, value_cents long, "
        "writetime_us long, is_tombstone boolean, ttl_s long",
    )


def test_cell_ttl_expiry_beats_late_write(spark):
    """An expired cell is a tombstone at its ORIGINAL writetime: it
    beats a late-arriving write with an older timestamp (and a live
    cell on a timestamp tie), but a NEWER write supersedes it —
    expiry never shadows later data."""
    from cassandra_data_migration_spark.operators.cells import (
        apply_cell_ttl,
        cell_lww_compact,
    )

    now = 10_000_000_000  # 10^10 µs
    rows = [
        # key 1: write at t=1s with 2s TTL (expired), late write at
        # t=0.5s — tombstone wins, cell gone from live view
        (1, "a", 5, 1_000_000, False, 2),
        (1, "a", 9, 500_000, False, None),
        # key 2: write at t=1s with 2s TTL (expired), NEWER write at
        # t=5s — newer write survives
        (2, "a", 5, 1_000_000, False, 2),
        (2, "a", 7, 5_000_000, False, None),
        # key 3: timestamp TIE between expiring cell and live cell —
        # tombstone-beats-live on the tie, cell gone
        (3, "a", 5, 1_000_000, False, 2),
        (3, "a", 9, 1_000_000, False, None),
        # key 4: TTL not yet expired (now < wt + ttl) — still live
        (4, "a", 5, now - 1_000_000, False, 100),
    ]
    live = {
        (r["pk"], r["column_name"]): r["value_cents"]
        for r in cell_lww_compact(
            apply_cell_ttl(_ttl_cells(spark, rows), F.lit(now)),
            value_col="value_cents",
        ).collect()
    }
    assert (1, "a") not in live
    assert live[(2, "a")] == 7
    assert (3, "a") not in live
    assert live[(4, "a")] == 5


def test_cell_ttl_gc_clock_starts_at_expiry(spark):
    """gc_grace counts from the EXPIRY instant, not the write: a cell
    whose write is old but whose expiry is recent must be RETAINED."""
    from cassandra_data_migration_spark.operators.cells import (
        apply_cell_ttl,
        tombstone_gc_report,
    )

    now = 1_000_000_000_000  # 10^12 µs
    grace = 100_000_000  # 100 s
    rows = [
        # expiry = wt + 200s; wt chosen so expiry is 50s before now:
        # INSIDE grace -> retained even though wt is ancient
        (1, "a", 5, now - 250_000_000, False, 200),
        # expiry 500s before now: OUTSIDE grace -> purgeable
        (2, "a", 5, now - 700_000_000, False, 200),
    ]
    got = {
        r["column_name"]: (r["n_tomb_retained"], r["n_tomb_purgeable"])
        for r in tombstone_gc_report(
            apply_cell_ttl(_ttl_cells(spark, rows), F.lit(now)),
            F.lit(now),
            gc_grace_us=grace,
            value_col="value_cents",
            gc_ref_col="_gc_ref_us",
        ).collect()
    }
    assert got["a"] == (1, 1), got


def test_superseded_tombstone_in_grace_retained(spark):
    """A superseded tombstone still inside gc_grace is counted
    RETAINED (n_superseded_in_grace), not droppable — the
    conservative garbagecollect accounting; a superseded LIVE version
    stays immediately droppable."""
    from cassandra_data_migration_spark.operators.cells import (
        tombstone_gc_report,
    )

    cells = _cells(
        spark,
        [
            # key 1: in-grace tombstone superseded by a newer live
            # write -> 1 superseded_in_grace, 0 superseded
            (1, "a", 0, 900, True),
            (1, "a", 7, 950, False),
            # key 2: superseded LIVE version -> 1 superseded
            (2, "a", 1, 100, False),
            (2, "a", 2, 200, False),
            # key 3: OUT-of-grace tombstone superseded by newer live
            # write -> plain superseded (droppable)
            (3, "a", 0, 100, True),
            (3, "a", 4, 950, False),
        ],
    )
    out = {
        r["column_name"]: (
            r["n_versions"],
            r["n_superseded"],
            r["n_superseded_in_grace"],
            r["n_live"],
        )
        for r in tombstone_gc_report(
            cells, F.lit(1000), gc_grace_us=500, value_col="value_cents"
        ).collect()
    }
    assert out["a"] == (6, 2, 1, 3), out
