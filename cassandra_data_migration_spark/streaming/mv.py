"""Continuous materialized-view maintenance — the Structured
Streaming twin of `operators/mv.mv_apply_delta`.

Each micro-batch of the Debezium-shaped changelog merges into the
parquet-backed view by signed deltas (foreachBatch: read view →
merge → write-aside → swap).  Because the delta algebra is
commutative and associative (sums of signed contributions), ANY
micro-batch slicing of the changelog converges to the same view as a
single batch apply — a strictly stronger replay property than LWW
(which needs the ordering key).  The stream-equals-batch test replays
in 3 slices.

Redelivery safety: foreachBatch is at-least-once, and the signed-
delta algebra is commutative but NOT idempotent — replaying the last
un-checkpointed micro-batch after a restart would double-apply its
deltas.  Each applied batch therefore writes an ``_applied_batch``
marker file INSIDE the new view directory (Spark ignores ``_``-
prefixed files when reading parquet), so the marker commits
atomically with the data it describes: a replayed batch whose id is
<= the marker is skipped.  No separate meta store that could fall out
of sync with the view.

Crash-safe swap: the view is replaced via two renames
(view → view_prev, tmp → view) with a recovery preamble instead of
rmtree-then-move (which loses the view entirely if the process dies
between the two calls).  Every crash window is recoverable:
tmp orphan → overwritten next batch; death between the renames →
``_recover`` moves view_prev back; death before the _prev cleanup →
``_recover`` just deletes it (the new view is already in place).

Scale: per trigger the work is O(|view| read + |delta| agg + |view|
write); for 10⁹-key views swap the parquet swap for a key-bucketed
upsert sink (the merge itself already touches only delta keys).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from cassandra_data_migration_spark.operators.mv import mv_apply_delta

MARKER = "_applied_batch"


def _read_marker(view_path: str) -> int:
    p = os.path.join(view_path, MARKER)
    if os.path.exists(p):
        with open(p) as fh:
            return int(fh.read().strip())
    return -1


def _recover(view_path: str) -> None:
    """Make the view whole after any crash window of a previous swap."""
    prev = view_path.rstrip("/") + "_prev"
    if os.path.exists(prev):
        if os.path.exists(view_path):
            # swap completed, cleanup didn't — the new view won
            shutil.rmtree(prev)
        else:
            # died between the two renames — roll back
            os.rename(prev, view_path)


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
        _recover(view_path)
        if batch_id <= _read_marker(view_path):
            return  # at-least-once redelivery of an applied batch
        mv = spark.read.parquet(view_path)
        merged = mv_apply_delta(mv, batch_df, key_col)
        tmp = view_path.rstrip("/") + "_updating"
        merged.write.mode("overwrite").parquet(tmp)
        # marker rides inside the same directory the rename publishes
        with open(os.path.join(tmp, MARKER), "w") as fh:
            fh.write(str(batch_id))
        prev = view_path.rstrip("/") + "_prev"
        os.rename(view_path, prev)
        os.rename(tmp, view_path)
        shutil.rmtree(prev)

    return (
        changelog.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
