"""Continuous count-min sketch maintenance — the Structured
Streaming twin of ``operators/aggregates.cms_sketch``.

The CMS cell table is a mergeable summary (Agarwal et al., PODS'12):
cells combine by plain (row, bucket) sum, so folding per-micro-batch
sketches into a persisted sketch converges to the batch sketch under
ANY slicing of the stream — the same commutative-delta argument as
``streaming/mv.py``, and verified by the stream-equals-batch test.

Like the MV sink, summation is commutative but NOT idempotent, so
at-least-once redelivery would double-count a replayed batch.  The
sink reuses the MV module's marker-in-directory protocol verbatim
(``_applied_batch`` rides inside the directory the rename publishes,
committing atomically with the cells it describes) and its
crash-recoverable two-rename swap.

Scale: per trigger the work is O(|batch| explode + depth×width cell
merge); the persisted state is exactly depth×width rows regardless
of stream length — the bounded-state property that makes a sketch
the right continuous aggregate when the vocabulary is unbounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.aggregates import cms_sketch
from cassandra_data_migration_spark.streaming.mv import (
    _recover,
    _replay_gate,
    publish_state,
)


def cms_maintain_stream(
    items: DataFrame,
    sketch_path: str,
    term_col: str = "term",
    depth: int = 3,
    width: int = 4096,
    checkpoint: str | None = None,
):
    """Start a foreachBatch query folding item micro-batches into the
    parquet CMS cell table at ``sketch_path`` (created empty on the
    first batch).  Returns the StreamingQuery."""
    ckpt = checkpoint or sketch_path.rstrip("/") + "_ckpt"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(sketch_path)
        # lineage-keyed gate: batch ids restart at 0 under a fresh
        # checkpoint, so a bare id compare against an existing sketch
        # would DROP new batches as replays — _replay_gate raises on
        # that lineage mismatch instead of undercounting.
        skip, lineage = _replay_gate(sketch_path, ckpt, batch_id)
        if skip:
            return  # at-least-once redelivery of an applied batch
        delta = cms_sketch(batch_df, term_col, depth, width)
        if os.path.exists(sketch_path):
            current = spark.read.parquet(sketch_path)
            merged = (
                current.unionByName(delta)
                .groupBy("r", "bucket")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        else:
            merged = delta
        publish_state(merged, sketch_path, batch_id, lineage)

    return (
        items.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
