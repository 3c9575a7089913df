"""Continuous KMV maintenance — the Structured Streaming twin of
``operators/aggregates.kmv_sketch``.

Min-union is idempotent like the HLL register max (and unlike the CMS
cell sum): the k smallest hashes of any split of the stream, merged
and re-trimmed to k, equal the one-shot batch sketch, and replaying a
micro-batch re-offers hashes that dedup away.  No batch-id gate is
consulted for correctness (see ``streaming/hll.py`` for the
contrast); crash safety is the MV module's marker + two-rename swap.

State is exactly ≤ k rows forever — the continuously-maintained
distinct-count/set-overlap summary for an unbounded stream, and the
piece that makes cross-corpus overlap monitoring cheap: two streams
each maintain a k-row sketch, and the overlap estimate joins those
two tiny tables, never the streams.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.aggregates import kmv_sketch
from cassandra_data_migration_spark.streaming.mv import (
    _recover,
    publish_state,
)


def kmv_maintain_stream(
    items: DataFrame,
    sketch_path: str,
    value_col: str,
    k: int = 256,
    seed: str = "kmv",
    checkpoint: str | None = None,
):
    """Start a foreachBatch query min-union-merging per-micro-batch
    KMV sketches into the parquet hash table at ``sketch_path``.
    Returns the StreamingQuery."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(sketch_path)
        delta = kmv_sketch(batch_df, value_col, k, seed)
        if os.path.exists(sketch_path):
            current = spark.read.parquet(sketch_path)
            merged = (
                current.unionByName(delta)
                .distinct()
                .orderBy("h")
                .limit(k)
            )
        else:
            merged = delta
        publish_state(merged, sketch_path, batch_id)

    return (
        items.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            checkpoint or sketch_path.rstrip("/") + "_ckpt",
        )
        .trigger(availableNow=True)
        .start()
    )
