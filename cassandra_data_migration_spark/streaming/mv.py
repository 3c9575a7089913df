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

Lineage safety: batch ids are monotonic only WITHIN one checkpoint
lineage — a stream restarted with a FRESH checkpoint restarts at 0,
and comparing its ids against a marker left by a previous lineage
would silently drop genuinely new batches as "replays".  The marker
therefore records ``<query_id>:<batch_id>`` (the query id is stable
across restarts from the same checkpoint and fresh for a new one);
a lineage mismatch against existing state FAILS FAST instead of
undercounting — point the stream at the original checkpoint to
resume, or at empty state to start over.

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


def _read_marker(view_path: str) -> tuple[str | None, int]:
    """Return ``(lineage, batch_id)`` from the marker file —
    ``lineage`` is the streaming query id that wrote it (None for a
    pre-lineage legacy marker), ``batch_id`` is -1 when no state
    exists yet."""
    p = os.path.join(view_path, MARKER)
    if os.path.exists(p):
        with open(p) as fh:
            raw = fh.read().strip()
        if ":" in raw:
            lineage, _, bid = raw.rpartition(":")
            return lineage, int(bid)
        return None, int(raw)
    return None, -1


def _write_marker(dir_path: str, batch_id: int, lineage: str | None) -> None:
    with open(os.path.join(dir_path, MARKER), "w") as fh:
        fh.write(f"{lineage}:{batch_id}" if lineage else str(batch_id))


def _query_lineage(checkpoint: str) -> str | None:
    """The streaming query id from the checkpoint's metadata file —
    Spark writes ``{"id": "<uuid>"}`` there at query start, so by the
    time foreachBatch runs it exists.  The id survives restarts from
    the SAME checkpoint and differs for a fresh one: exactly the
    lineage within which batch ids are monotonic."""
    import json

    p = os.path.join(checkpoint, "metadata")
    try:
        with open(p) as fh:
            return json.load(fh)["id"]
    except (OSError, ValueError, KeyError):
        return None


def _replay_gate(
    state_path: str, checkpoint: str, batch_id: int
) -> tuple[bool, str | None]:
    """Shared redelivery gate for non-idempotent (sum-merge) sinks.
    Returns ``(skip, lineage)``: skip=True for a same-lineage replay;
    raises on a lineage mismatch against existing state (a fresh
    checkpoint pointed at a sketch/view built by another query would
    otherwise silently drop new batches whose restarted ids fall
    under the old marker)."""
    marker_lineage, applied = _read_marker(state_path)
    lineage = _query_lineage(checkpoint)
    if (
        applied >= 0
        and marker_lineage is not None
        and lineage is not None
        and marker_lineage != lineage
    ):
        raise RuntimeError(
            f"state at {state_path} was written by streaming query "
            f"{marker_lineage}, but this query is {lineage} (fresh "
            "checkpoint?). Batch ids are only monotonic per "
            "checkpoint lineage, so resuming here would silently "
            "drop new batches as replays. Point the stream at the "
            "original checkpoint, or at empty state to start over."
        )
    return batch_id <= applied, lineage


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


def publish_state(merged, state_path: str, batch_id: int, lineage=None):
    """The ONE crash-safe state publish every foreachBatch twin uses:
    write ``merged`` to ``<path>_updating`` with the batch marker
    INSIDE it, then the two-rename swap (old -> _prev, new -> live,
    rm _prev).  :func:`_recover` (called at the top of every
    apply_batch) closes each crash window: _prev+live = cleanup died
    (drop _prev); _prev only = died between renames (roll back).
    ``lineage=None`` writes the plain batch-id marker the idempotent
    twins use; the gated twins pass their checkpoint lineage."""
    tmp = state_path.rstrip("/") + "_updating"
    merged.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, batch_id, lineage)
    if os.path.exists(state_path):
        prev = state_path.rstrip("/") + "_prev"
        os.rename(state_path, prev)
        os.rename(tmp, state_path)
        shutil.rmtree(prev)
    else:
        os.rename(tmp, state_path)


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
        skip, lineage = _replay_gate(view_path, checkpoint, batch_id)
        if skip:
            return  # at-least-once redelivery of an applied batch
        mv = spark.read.parquet(view_path)
        merged = mv_apply_delta(mv, batch_df, key_col)
        publish_state(merged, view_path, batch_id, lineage)

    return (
        changelog.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
