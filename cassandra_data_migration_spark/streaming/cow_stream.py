"""Streaming CDC apply into the versioned COW table — the
Delta-style "streaming MERGE" (foreachBatch upsert), closing the loop
between the changelog operators (``operators/windows.cdc_apply``,
``streaming/cdc.py``) and the lakehouse table
(``sources/lakehouse.py``).

Per micro-batch: collapse the batch to its per-key winner by the
changelog ordering key (ts desc, seq desc — the same rule as
``cdc_apply``), split winners into upserts (op != D) and deletes
(op == D), and run one :func:`cow_merge`.  With the changelog sliced
in (ts, seq) order across batches — the shape a CDC log has by
construction — the streamed fold equals the one-shot batch collapse,
which is the oracle.

Replay safety WITHOUT a gate: unlike the MV's signed-delta fold
(``streaming/mv.py``, which must fail fast on lineage mismatch
because re-adding a delta corrupts), a keyed MERGE is IDEMPOTENT —
re-applying a batch replaces rows with the same rows, re-deletes
absent keys, and re-inserts over existing keys as replacements.
foreachBatch's at-least-once redelivery (same-lineage last-batch
replay, or a full fresh-checkpoint replay in order) therefore
converges to the same table; the only cost is redundant snapshot
versions, which vacuum reclaims.  This idempotence is exactly why
merge-based sinks are the production default for CDC-to-lake
pipelines.

State: none on the driver or in the state store — the table IS the
state, and merge cost per batch tracks the batch's key footprint
(footer-pruned), not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cow_apply_changes_stream(
    stream: DataFrame,
    target_path: str,
    key_col: str,
    checkpoint: str,
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
):
    """Start the availableNow foreachBatch query applying changelog
    micro-batches to the COW table (which must already exist — seed
    it with the batch-0 fold, e.g. ``cdc_apply`` of the initial
    snapshot — and, for versioned reads, hold a committed manifest).
    Returns the StreamingQuery."""
    from pyspark.sql import Window

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # no version churn for empty batches
        spark = batch_df.sparkSession
        w = Window.partitionBy(key_col).orderBy(
            F.col(ts_col).desc(), F.col(seq_col).desc()
        )
        winners = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        ups = winners.filter(F.col(op_col) != delete_op).drop(op_col)
        dels = winners.filter(F.col(op_col) == delete_op).select(key_col)
        cow_merge(spark, target_path, ups, key_col, delete_keys=dels)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
