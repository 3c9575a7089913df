"""Join operators (SURVEY.md §2.3 J1-J5).

The reference has no SQL joins — its join-shaped logic is
cross-cluster row matching done with per-row point reads
(lab/scripts/validate_migration.py:49-67).  Re-expressed as
set-oriented joins these are O(one shuffle) instead of O(rows)
network round-trips, and at 100 TB they stay shuffle-minimal:

- both sides of a PK diff shuffle *once* on the PK (or not at all if
  both layouts are bucketed on it),
- the mismatch check joins 8-byte (pk, hash) projections, not whole
  rows — the wide payload is only re-fetched for the (small) diff set,
- small dimension sides go through ``broadcast()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from cassandra_data_migration_spark.functions.hashing import with_row_hash


def missing_rows(origin: DataFrame, target: DataFrame, pk: list[str]) -> DataFrame:
    """J1: origin rows absent from target — left-anti join on the full
    PK (the set form of validate_migration.py:48-67 and CDM DiffData's
    missing-row check, docs/04-cdm-approach.md:356-366)."""
    return origin.join(target, on=pk, how="left_anti")


def mismatched_rows(
    origin: DataFrame,
    target: DataFrame,
    pk: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """J2: rows present in both clusters whose non-key values differ —
    inner equi-join on PK of (pk, row_hash) projections, filtered to
    unequal hashes (lab/exercises/06-validation-monitoring.md:95-137).

    Returns origin-side rows (pk + origin hash + target hash).  Only
    the narrow hash projection shuffles; at scale the wide columns are
    recovered by a second join against the (tiny) mismatch set.
    """
    value_cols = compare_cols or [c for c in origin.columns if c not in pk]
    o = with_row_hash(origin.select(*pk, *value_cols), value_cols, "origin_hash")
    t = with_row_hash(target.select(*pk, *value_cols), value_cols, "target_hash")
    return (
        o.select(*pk, "origin_hash")
        .join(t.select(*pk, "target_hash"), on=pk, how="inner")
        .filter(F.col("origin_hash") != F.col("target_hash"))
    )


def reconcile(
    origin: DataFrame,
    target: DataFrame,
    pk: list[str],
    writetime_col: str | None = None,
) -> DataFrame:
    """J3: AutoCorrect repair set = missing ∪ mismatched-where-origin-
    wins (docs/04-cdm-approach.md:356-369).  Origin wins unless the
    target's writetime is newer (last-write-wins,
    docs/04-cdm-approach.md:837-841); never deletes target-only rows
    (:367).  Returns origin rows to (re-)write to target."""
    missing = missing_rows(origin, target, pk)
    mism_keys = mismatched_rows(origin, target, pk).select(*pk)
    mismatched_full = origin.join(mism_keys, on=pk, how="left_semi")
    if writetime_col is not None and writetime_col in target.columns:
        t_wt = target.select(*pk, F.col(writetime_col).alias("_target_wt"))
        mismatched_full = (
            mismatched_full.join(t_wt, on=pk, how="left")
            .filter(
                F.col("_target_wt").isNull()
                | (F.col(writetime_col) >= F.col("_target_wt"))
            )
            .drop("_target_wt")
        )
    return missing.unionByName(mismatched_full)


def fk_generate_join(skeleton: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """J4: FK-shaped enrichment — attach attributes of a referenced
    dimension (generate_data.py:113,116 picks random existing keys).
    Dimension side is broadcast: no shuffle of the fact table."""
    return skeleton.join(broadcast(dim), on=key, how="inner")


def per_bucket_count_compare(
    origin: DataFrame,
    target: DataFrame,
    key_col: str,
    num_buckets: int = 32,
) -> DataFrame:
    """J5: per-token-range count compare
    (docs/07-challenges-risks.md:300-325) — group each side by token
    bucket, full-outer join the counts, keep unequal buckets.  The
    shuffle moves ``num_buckets`` rows per side: free at any scale."""
    def counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.groupBy(
                F.pmod(F.col(key_col), F.lit(num_buckets)).alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias(alias))
        )

    o = counts(origin, "origin_cnt")
    t = counts(target, "target_cnt")
    return (
        o.join(t, on="bucket", how="full_outer")
        .select(
            "bucket",
            F.coalesce("origin_cnt", F.lit(0)).alias("origin_cnt"),
            F.coalesce("target_cnt", F.lit(0)).alias("target_cnt"),
        )
        .filter(F.col("origin_cnt") != F.col("target_cnt"))
    )
