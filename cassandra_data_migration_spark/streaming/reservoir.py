"""Continuous weighted reservoir sampling — the Structured Streaming
twin of ``operators/sampling.weighted_sample_per_group``.

The A-ES sample (Efraimidis–Spirakis) is a mergeable summary: the
k-smallest-key rows per group from any split of the stream, min-k
merged, equal the one-shot batch sample, because each row's key is a
pure content hash, not RNG state.  Min-k merge is idempotent — a
redelivered micro-batch re-offers rows whose keys are identical, the
(group, id) dedup collapses them, and the rank is unchanged — so like
``streaming/hll.py`` (and unlike the sum-merging CMS/MV sinks) this
sink needs no batch-id gate for correctness.

Crash safety reuses the MV module's marker + two-rename swap.

Scale: per trigger the work is O(|batch| md5 + (state ∪ batch)
group-rank); the persisted state is ≤ groups × k rows forever.  This
is the streaming face of corpus curation: a always-current weighted
sample of an unbounded document stream in bounded space.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.sampling import aes_key
from cassandra_data_migration_spark.streaming.mv import (
    _recover,
    publish_state,
)


def weighted_reservoir_stream(
    items: DataFrame,
    state_path: str,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int = 5,
    salt: str = "wsample",
    checkpoint: str | None = None,
):
    """Start a foreachBatch query min-k-merging per-micro-batch A-ES
    candidates into the parquet reservoir at ``state_path``.  Returns
    the StreamingQuery; the state holds (group, id, weight) of the
    current winners."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.asc("_akey"), F.asc(id_col))

    def top_k(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .select(group_col, id_col, weight_col, "_akey")
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(state_path)
        cand = top_k(
            batch_df.filter(F.col(weight_col) > 0).withColumn(
                "_akey", aes_key(group_col, id_col, weight_col, salt)
            )
        )
        if os.path.exists(state_path):
            current = spark.read.parquet(state_path)
            # dedup on (group, id) BEFORE the rank: a replayed row has
            # an identical key, and counting it twice would evict a
            # legitimate winner
            merged = top_k(
                current.unionByName(cand).dropDuplicates(
                    [group_col, id_col]
                )
            )
        else:
            merged = cand
        publish_state(merged, state_path, batch_id)

    return (
        items.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            checkpoint or state_path.rstrip("/") + "_ckpt",
        )
        .trigger(availableNow=True)
        .start()
    )
