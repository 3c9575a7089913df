"""Continuous HyperLogLog maintenance — the Structured Streaming
twin of ``operators/aggregates.hll_registers``.

The register table is a mergeable summary like the CMS cell table
(Agarwal et al., PODS'12), but with a strictly stronger merge
algebra: registers combine by per-``(group, j)`` MAX, and max —
unlike the CMS sum — is IDEMPOTENT.  At-least-once redelivery of a
micro-batch therefore cannot corrupt the state: re-maxing the same
ranks is a no-op, so this sink needs no ``_applied_batch`` batch-id
gate at all (contrast ``streaming/cms.py``, where sum-merge must
dedup replays).  The marker is still written — purely so operators
can see stream progress — but is never consulted for correctness.

Crash safety reuses the MV module's two-rename swap: the merged
register table is published by directory rename, and ``_recover``
heals a crash landing between the renames.

Scale: per trigger the work is O(|batch| md5 + register max-merge);
the persisted state is ≤ groups × m rows forever — the bounded-state
property that makes a sketch the right continuous distinct-counter
when the key space is unbounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.aggregates import hll_registers
from cassandra_data_migration_spark.streaming.mv import (
    _recover,
    publish_state,
)


def hll_maintain_stream(
    items: DataFrame,
    sketch_path: str,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = 8,
    seed: str = "hll",
    checkpoint: str | None = None,
):
    """Start a foreachBatch query max-merging per-micro-batch HLL
    registers into the parquet register table at ``sketch_path``
    (created on the first batch).  Returns the StreamingQuery."""
    groups = list(group_cols or [])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(sketch_path)
        delta = hll_registers(batch_df, value_col, groups, b, seed)
        if os.path.exists(sketch_path):
            current = spark.read.parquet(sketch_path)
            merged = (
                current.unionByName(delta)
                .groupBy(*groups, "j")
                .agg(F.max("m_rank").cast("int").alias("m_rank"))
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
