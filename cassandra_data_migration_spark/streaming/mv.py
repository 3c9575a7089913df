"""Continuous materialized-view maintenance — the Structured
Streaming twin of `operators/mv.mv_apply_delta`.

Each micro-batch of the Debezium-shaped changelog merges into the
parquet-backed view by signed deltas (foreachBatch: read view →
merge → write-aside → swap, the same atomic-ish swap as
`sources/files.compact_parquet`).  Because the delta algebra is
commutative and associative (sums of signed contributions), ANY
micro-batch slicing of the changelog converges to the same view as a
single batch apply — a strictly stronger replay property than LWW
(which needs the ordering key).  The stream-equals-batch test replays
in 3 slices.

Scale: per trigger the work is O(|view| read + |delta| agg + |view|
write); for 10⁹-key views swap the parquet swap for a key-bucketed
upsert sink (the merge itself already touches only delta keys).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame

from cassandra_data_migration_spark.operators.mv import mv_apply_delta


def mv_maintain_stream(
    changelog: DataFrame,
    view_path: str,
    key_col: str,
    checkpoint: str,
):
    """Start a foreachBatch query folding changelog micro-batches into
    the parquet view at ``view_path`` (must already hold the initial
    view, e.g. from `mv_build`).  Returns the StreamingQuery."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        mv = spark.read.parquet(view_path)
        merged = mv_apply_delta(mv, batch_df, key_col)
        tmp = view_path.rstrip("/") + "_updating"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(view_path)
        shutil.move(tmp, view_path)

    return (
        changelog.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
