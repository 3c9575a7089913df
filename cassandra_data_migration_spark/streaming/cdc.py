"""Streaming CDC materialization — the Structured Streaming twin of
``operators/windows.cdc_apply``.

A continuously maintained current-state store over an
insert/update/delete changelog: per-key GroupState holds the latest
operation; DELETEs tombstone the key (``state.remove()``) so a later
re-insert starts fresh — full I/U/D semantics that the LWW store
(``streaming/lww.py``, which mirrors CDM's never-delete rule)
deliberately does not implement.

State shape: one row per LIVE key plus nothing for deleted keys —
the tombstone is the *absence* of state, exactly like a compacted
changelog topic.  Cross-batch ordering uses (ts, seq): a late UPDATE
arriving after the DELETE that supersedes it is ignored, which is
the replay-deterministic rule ``cdc_apply`` applies batch-side (the
stream-equals-batch test pins the two to identical output).

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
        best = batch.sort_values(
            by=[ts_col, seq_col], ascending=False
        ).iloc[0]
        if best[op_col] == delete_op:
            had_state = state.exists
            if had_state:
                state.remove()
            # emit the tombstone so sinks can delete downstream
            out = pd.DataFrame([best[cols]])
            out["_emit"] = "D"
            yield out
        else:
            state.update(tuple(best[c] for c in cols))
            out = pd.DataFrame([best[cols]])
            out["_emit"] = "U"
            yield out

    return stream.groupBy(*pk).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
