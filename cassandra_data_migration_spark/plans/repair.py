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
connector; here the scope is a broadcast semi-join on the ≤leaves
bucket set, which Spark evaluates scan-side).

Everything is one lazy plan: counts are assembled as 1-row aggregate
frames cross-joined into a (metric, value) report — no driver
``collect``/``count`` round-trips, so the whole repair + revalidate
is a single job when the report is consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.functions.hashing import md5_draw
from cassandra_data_migration_spark.operators.merkle import (
    TOKEN_SPACE,
    merkle_diff,
    portable_digest_cols,
)


def _bucket(key_col: str, leaves: int, seed: str):
    width = -(-TOKEN_SPACE // leaves)
    return F.floor(md5_draw(seed + ":tok", key_col) / F.lit(width)).cast(
        "long"
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
    """Repair report as (metric, value) rows: divergent_leaves,
    scoped_origin_rows, missing_repaired, mismatched_repaired,
    post_missing, post_mismatched — the last two prove convergence
    (0 after one pass, since origin-wins repair is idempotent)."""
    leaves = fanout**depth
    flagged = (
        merkle_diff(origin, target, key_col, digest_cols, depth, fanout, seed)
        .filter(F.col("status") != "match")
        .select("bucket")
    )
    canon = F.concat_ws("|", *portable_digest_cols(origin, digest_cols))
    o_rows = origin.select(
        F.col(key_col).alias("_k"),
        _bucket(key_col, leaves, seed).alias("_bucket"),
        canon.alias("_canon"),
        F.struct(*origin.columns).alias("_row"),
    )
    t_canon = F.concat_ws("|", *portable_digest_cols(target, digest_cols))
    t_rows = target.select(
        F.col(key_col).alias("_k"),
        _bucket(key_col, leaves, seed).alias("_bucket"),
        t_canon.alias("_canon"),
        F.struct(*target.columns).alias("_row"),
    )
    o_scoped = o_rows.join(
        F.broadcast(flagged), o_rows["_bucket"] == flagged["bucket"], "left_semi"
    )
    t_scoped = t_rows.join(
        F.broadcast(flagged), t_rows["_bucket"] == flagged["bucket"], "left_semi"
    )
    missing = o_scoped.join(t_scoped.select("_k"), "_k", "left_anti")
    mismatched = (
        o_scoped.alias("o")
        .join(t_scoped.select("_k", "_canon").alias("t"), "_k")
        .filter(F.col("o._canon") != F.col("t._canon"))
        .select("_k")
    )
    repair_keys = missing.select("_k").unionByName(mismatched).distinct()
    # AutoCorrect, origin wins: drop the bad/absent target rows, copy
    # the origin rows for every repair key
    repaired = (
        t_rows.join(repair_keys, "_k", "left_anti")
        .select("_k", "_canon")
        .unionByName(
            o_rows.join(repair_keys, "_k", "left_semi").select("_k", "_canon")
        )
    )
    post_missing = o_rows.select("_k").join(
        repaired.select("_k"), "_k", "left_anti"
    )
    post_mismatched = (
        o_rows.select("_k", "_canon")
        .alias("o")
        .join(repaired.alias("r"), "_k")
        .filter(F.col("o._canon") != F.col("r._canon"))
    )

    def metric(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("metric"),
            F.count(F.lit(1)).cast("long").alias("value"),
        )

    return (
        metric("divergent_leaves", flagged)
        .unionByName(metric("scoped_origin_rows", o_scoped))
        .unionByName(metric("missing_repaired", missing))
        .unionByName(metric("mismatched_repaired", mismatched))
        .unionByName(metric("post_missing", post_missing))
        .unionByName(metric("post_mismatched", post_mismatched))
    )
