"""Streaming CDC materialization — the Structured Streaming twin of
``operators/windows.cdc_apply``.

A continuously maintained current-state store over an
insert/update/delete changelog: per-key GroupState holds the latest
operation; DELETEs tombstone the key (``state.remove()``) so a later
re-insert starts fresh — full I/U/D semantics that the LWW store
(``streaming/lww.py``, which mirrors CDM's never-delete rule)
deliberately does not implement.

State shape: one row per key, INCLUDING deleted keys — a DELETE is
kept in state as a tombstone row (op='D') rather than removed, so a
late UPDATE arriving in a later micro-batch with an *older* (ts, seq)
still loses to the tombstone and is ignored — the replay-deterministic
rule ``cdc_apply`` applies batch-side (the stream-equals-batch test
pins the two to identical output).  Removing the state instead would
lose the delete's ordering key and let the stale UPDATE resurrect the
key.  Tombstones are small (one row) and can be GC'd with a state
timeout once the out-of-orderness bound has passed; this module keeps
them indefinitely (NoTimeout) for exact replay determinism.

Emission: update-mode — each micro-batch emits the keys it changed
with an ``_op`` column ('U' for a new winner, 'D' for a deletion),
so a ``foreachBatch`` sink can apply the delta downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stateful_cdc_stream(
    stream: DataFrame,
    pk: list[str],
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
):
    """Materialize changelog current-state continuously.  ``stream``
    must carry (pk..., ts, seq, op, payload...) with state-
    serializable types (timestamps as µs longs)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import StringType, StructField, StructType

    cols = stream.schema.fieldNames()
    state_schema = StructType(list(stream.schema.fields))
    out_schema = StructType(
        list(stream.schema.fields) + [StructField("_emit", StringType())]
    )

    def update(key, pdfs, state: GroupState):
        rows = [p for p in pdfs if len(p)]
        if not rows:
            return
        batch = pd.concat(rows, ignore_index=True)
        if state.exists:
            batch = pd.concat(
                [batch, pd.DataFrame([tuple(state.get)], columns=cols)],
                ignore_index=True,
            )
        prev = tuple(state.get) if state.exists else None
        best = batch.sort_values(
            by=[ts_col, seq_col], ascending=False
        ).iloc[0]
        winner = tuple(best[c] for c in cols)
        # compare on the (ts, seq) ordering key — unique per key, and
        # NaN-safe where payload equality is not
        ti, si = cols.index(ts_col), cols.index(seq_col)
        if prev is not None and (winner[ti], winner[si]) == (prev[ti], prev[si]):
            # this batch's ops all lost to the held state (e.g. a late
            # UPDATE older than the tombstone) — no change, no emission
            return
        # DELETE included: the tombstone row stays in state so its
        # (ts, seq) keeps ordering against later-arriving older ops
        state.update(winner)
        out = pd.DataFrame([best[cols]])
        out["_emit"] = "D" if best[op_col] == delete_op else "U"
        yield out

    return stream.groupBy(*pk).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
