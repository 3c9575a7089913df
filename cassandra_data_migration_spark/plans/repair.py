"""End-to-end anti-entropy repair: Merkle leaf diff → row work scoped
to divergent token ranges → AutoCorrect (origin wins) → revalidate.

This is the composition the reference performs as `nodetool repair`
followed by CDM AutoCorrect (docs/04-cdm-approach.md DiffData +
autocorrect; exercise 6's re-validation loop): the Merkle pass finds
WHICH token ranges diverge without shipping any rows, and only those
ranges get row-level treatment.  At 100 TB this scoping is the whole
game — a healthy cluster has a handful of divergent leaves, so the
row-level joins read a bounded slice of the table (push the flagged
token bounds into the scan via the P4 token-range predicate on a real
connector; here the scope is an `isin` over the collected bucket
list, which Spark evaluates scan-side).  Size ``fanout**depth`` well
above the expected divergent-key count — SCALE_PROBE_r06.json shows
64 leaves scoping half the table under 50 corruptions while 4096
leaves scope 1.2%.

Origin wins on every divergence mode: missing rows are copied,
mismatched rows replaced, and target-only rows (extras) DELETED —
leaving any of the three unrepaired would let the post-validation
claim convergence over a still-divergent table.

Cost shape: the leaf diff runs once (its ≤leaves flagged buckets are
collected to the driver — O(leaves) rows, bounded by construction);
pre-repair metrics are ONE full-outer join of the two scoped slices;
post-validation is one more join of origin against the repaired
view.  No metric leg re-derives the digest scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.merkle import (
    merkle_diff,
    portable_digest_cols,
    token_bucket,
)

METRICS = (
    "divergent_leaves",
    "scoped_origin_rows",
    "missing_repaired",
    "mismatched_repaired",
    "extra_removed",
    "post_missing",
    "post_mismatched",
    "post_extra",
)


def merkle_scoped_repair(
    origin: DataFrame,
    target: DataFrame,
    key_col: str,
    digest_cols: list[str],
    depth: int = 3,
    fanout: int = 4,
    seed: str = "merkle",
) -> DataFrame:
    """Repair report as (metric, value) rows — :data:`METRICS`.  The
    three ``post_*`` rows prove convergence over EVERY divergence mode
    (0 after one pass, since origin-wins repair is idempotent)."""
    leaves = fanout**depth
    flagged = [
        r["bucket"]
        for r in merkle_diff(
            origin, target, key_col, digest_cols, depth, fanout, seed
        )
        .filter(F.col("status") != "match")
        .select("bucket")
        .collect()  # ≤ leaves rows — bounded driver state by design
    ]
    bucket = token_bucket(key_col, leaves, seed)

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key_col).alias("_k"),
            bucket.alias("_b"),
            F.concat_ws("|", *portable_digest_cols(df, digest_cols)).alias(
                "_canon"
            ),
        )

    o_rows, t_rows = canon(origin), canon(target)
    in_scope = (
        F.col("_b").isin(flagged) if flagged else F.lit(False)
    )
    o_scoped = o_rows.filter(in_scope)
    t_scoped = t_rows.filter(in_scope)

    # ONE full-outer join classifies every scoped key: missing (origin
    # only), extra (target only), mismatched (both, different content)
    j = o_scoped.select("_k", F.col("_canon").alias("_oc")).join(
        t_scoped.select("_k", F.col("_canon").alias("_tc")),
        "_k",
        "full_outer",
    )
    is_missing = F.col("_tc").isNull() & F.col("_oc").isNotNull()
    is_extra = F.col("_oc").isNull() & F.col("_tc").isNotNull()
    is_mismatch = (
        F.col("_oc").isNotNull()
        & F.col("_tc").isNotNull()
        & (F.col("_oc") != F.col("_tc"))
    )
    pre = j.agg(
        F.count("_oc").cast("long").alias("scoped_origin_rows"),
        F.sum(is_missing.cast("long")).alias("missing_repaired"),
        F.sum(is_mismatch.cast("long")).alias("mismatched_repaired"),
        F.sum(is_extra.cast("long")).alias("extra_removed"),
    )

    # origin wins: replace mismatched, insert missing, DELETE extras
    bad_keys = j.filter(is_missing | is_mismatch | is_extra).select("_k")
    copy_keys = j.filter(is_missing | is_mismatch).select("_k")
    repaired = (
        t_rows.join(bad_keys, "_k", "left_anti")
        .select("_k", "_canon")
        .unionByName(
            o_rows.join(copy_keys, "_k", "left_semi").select("_k", "_canon")
        )
    )
    pj = o_rows.select("_k", F.col("_canon").alias("_oc")).join(
        repaired.select("_k", F.col("_canon").alias("_tc")),
        "_k",
        "full_outer",
    )
    post = pj.agg(
        F.sum((F.col("_tc").isNull() & F.col("_oc").isNotNull()).cast("long"))
        .alias("post_missing"),
        F.sum(
            (
                F.col("_oc").isNotNull()
                & F.col("_tc").isNotNull()
                & (F.col("_oc") != F.col("_tc"))
            ).cast("long")
        ).alias("post_mismatched"),
        F.sum((F.col("_oc").isNull() & F.col("_tc").isNotNull()).cast("long"))
        .alias("post_extra"),
    )

    row = pre.crossJoin(post).withColumn(
        "divergent_leaves", F.lit(len(flagged)).cast("long")
    )
    stack_args = ", ".join(
        f"'{m}', coalesce(CAST({m} AS BIGINT), 0)" for m in METRICS
    )
    return row.select(
        F.expr(f"stack({len(METRICS)}, {stack_args}) AS (metric, value)")
    )
