"""T5: run tracking & resume (docs/04-cdm-approach.md:422-434, 843-846).

CDM records per-token-range completion in ``cdm_run_info`` /
``cdm_run_details`` tables on the target cluster so an interrupted
migration resumes from incomplete ranges (``trackRun.autoRerun``,
``previousRunId``).  Spark-native: a progress parquet keyed by
(run_id, bucket, status); resume anti-joins completed buckets out of
the work list.  Buckets are deterministic key-hash buckets (same
function as operators.filters.token_bucket) so the split is stable
across runs and partition counts.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _has_committed_files(path: str) -> bool:
    """True iff ``path`` holds at least one COMMITTED data file.

    Hidden entries (``_temporary/``, ``_SUCCESS``, ``.``-prefixed
    task-attempt files) are exactly what a killed-mid-write job leaves
    behind; Spark's readers skip them, and so must the resume check —
    otherwise ``spark.read.parquet`` on a _temporary-only directory
    raises instead of resuming from zero.
    """
    if not os.path.exists(path):
        return False
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if not f.startswith(("_", ".")) and os.path.getsize(
                os.path.join(root, f)
            ):
                return True
    return False


class RunTracker:
    def __init__(self, spark: SparkSession, track_dir: str, num_buckets: int = 32):
        self.spark = spark
        self.track_dir = track_dir.rstrip("/")
        self.num_buckets = num_buckets

    def _details_path(self, run_id: str) -> str:
        return f"{self.track_dir}/run_details/run_id={run_id}"

    def new_run(self) -> str:
        return uuid.uuid4().hex[:16]

    def record_bucket(self, run_id: str, bucket: int, status: str, rows: int = 0) -> None:
        """Append one bucket's outcome (PASSED/FAILED — CDM's
        cdm_run_details statuses).

        Written directly from the driver (pyarrow, one tiny file per
        record) — progress records are driver-side metadata, and CDM
        likewise writes cdm_run_details through its driver connection,
        not as a distributed job.  A Spark write job per bucket would
        add seconds of scheduler latency per token range.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = self._details_path(run_id)
        os.makedirs(path, exist_ok=True)
        table = pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "status": pa.array([status], pa.string()),
                "rows": pa.array([rows], pa.int64()),
                "recorded_at": pa.array([int(time.time() * 1e6)], pa.int64()),
            }
        )
        pq.write_table(table, f"{path}/{uuid.uuid4().hex}.parquet")

    def completed_buckets(self, run_id: str) -> list[int]:
        return [b for b, _ in self.completed_bucket_rows(run_id)]

    def completed_bucket_rows(self, run_id: str) -> list[tuple[int, int]]:
        """(bucket, rows) for every bucket whose LAST status is PASSED
        (a bucket may fail then pass on rerun)."""
        path = self._details_path(run_id)
        if not os.path.exists(path):
            return []
        det = self.spark.read.parquet(path)
        last = (
            det.groupBy("bucket")
            .agg(
                F.max_by("status", "recorded_at").alias("status"),
                F.max_by("rows", "recorded_at").alias("rows"),
            )
            .filter(F.col("status") == "PASSED")
        )
        return [(int(r["bucket"]), int(r["rows"])) for r in last.collect()]

    def pending_buckets(self, run_id: str | None) -> list[int]:
        """autoRerun semantics: all buckets minus previously PASSED
        ones (docs/04-cdm-approach.md:843-846)."""
        done = set(self.completed_buckets(run_id)) if run_id else set()
        return [b for b in range(self.num_buckets) if b not in done]

    def reconcile_with_target(
        self, run_id: str, target_path: str, key_col: str
    ) -> list[int]:
        """Close the crash window between a committed write job and its
        bucket records: if a run died AFTER ``write.parquet`` committed
        but BEFORE ``record_bucket`` ran, the target holds every
        written row yet the tracker shows the buckets pending — a
        naive resume would re-scan them and APPEND full duplicates
        (parquet append is not CDM's idempotent upsert).

        Spark's output committer makes the write all-or-nothing, so a
        pending bucket with ANY rows in the target can only mean a
        post-commit-pre-record crash; record it PASSED under the
        crashed run (with its true row count) so ``filter_pending``
        clips it.  Cost: one column-pruned count-by-bucket over the
        target, on the resume path only.  Returns the recovered
        bucket ids.
        """
        if not _has_committed_files(target_path):
            # Nothing visible in the target: either the previous run
            # died before its write, or mid-write (only _temporary/
            # task-attempt debris — committer v1 never exposes those
            # rows, and the next job's commit cycle clears them).
            # Every pending bucket is genuinely pending; reading the
            # path here would crash on "unable to infer schema".
            return []
        done = set(self.completed_buckets(run_id))
        pending = [b for b in range(self.num_buckets) if b not in done]
        if not pending:
            return []
        tgt = self.spark.read.parquet(target_path)
        bucket = F.pmod(F.col(key_col), F.lit(self.num_buckets))
        present = (
            tgt.select(bucket.alias("_b"))
            .filter(F.col("_b").isin(pending))
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        recovered = []
        for r in present:
            self.record_bucket(run_id, int(r["_b"]), "PASSED", rows=int(r["_n"]))
            recovered.append(int(r["_b"]))
        return recovered

    def filter_pending(
        self, df: DataFrame, key_col: str, run_id: str | None
    ) -> DataFrame:
        """Clip a table scan to not-yet-migrated buckets.  With few
        pending buckets this is an IN-list filter pushed to the scan —
        on a bucket-partitioned layout it prunes whole files."""
        pending = self.pending_buckets(run_id)
        if len(pending) == self.num_buckets:
            return df
        bucket = F.pmod(F.col(key_col), F.lit(self.num_buckets))
        return df.filter(bucket.isin(pending))
