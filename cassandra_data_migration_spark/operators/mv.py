"""Incremental materialized-view maintenance.

Cassandra maintains materialized views / denormalized aggregate
tables on write; migrating off it (or running dual-write) needs the
same capability engine-side: keep an aggregate table current from a
changelog WITHOUT rescanning the base table.  This is the
signed-delta algebra of incremental view maintenance (additive
aggregates are self-maintainable): every changelog row contributes

    INSERT → (+1, +after)     DELETE → (−1, −before)
    UPDATE → ( 0, after − before)

and the refreshed view is one full-outer merge of the old view with
the per-key net delta — O(|delta|) work, not O(|base|).

The changelog is Debezium-shaped (op, key, before, after): UPDATE and
DELETE carry the before-image, which is what makes maintenance local.
Changelogs without before-images must first materialize current state
(`operators/windows.cdc_apply` / `streaming/cdc.py`) — at that point
a recompute is the honest plan, which is why the before-image
contract matters at 100 TB.

Scale shape: the delta aggregation is a map-combined groupBy over the
changelog only; the merge joins O(touched keys) against the view on
the view's own key — with the view bucketed on that key the merge is
shuffle-free on the view side.  Keys whose count reaches zero drop
out (group disappears, matching a recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mv_build(
    base: DataFrame, key_col: str, val_col: str
) -> DataFrame:
    """(key, n_rows, sum_val) aggregate view of the base table —
    count + sum are the self-maintainable pair (avg derives)."""
    return base.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col(val_col).cast("decimal(18,2)")).alias("sum_val"),
    )


def mv_apply_delta(
    mv: DataFrame,
    changelog: DataFrame,
    key_col: str,
    op_col: str = "op",
    before_col: str = "before_v",
    after_col: str = "after_v",
) -> DataFrame:
    """Merge a Debezium-shaped changelog into an aggregate view.

    ``changelog`` rows: (key, op ∈ {'I','U','D'}, before_v, after_v)
    — before_v required for U/D, after_v for I/U.  Returns the
    refreshed (key, n_rows, sum_val) view; zero-count keys drop out.
    """
    d_cnt = (
        F.when(F.col(op_col) == "I", F.lit(1))
        .when(F.col(op_col) == "D", F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    before = F.coalesce(F.col(before_col).cast("decimal(18,2)"), zero)
    after = F.coalesce(F.col(after_col).cast("decimal(18,2)"), zero)
    d_sum = (
        F.when(F.col(op_col) == "I", after)
        .when(F.col(op_col) == "D", -before)
        .otherwise(after - before)
    )
    delta = changelog.groupBy(key_col).agg(
        F.sum(d_cnt).alias("_d_cnt"),
        F.sum(d_sum).alias("_d_sum"),
    )
    merged = mv.join(delta, key_col, "full_outer").select(
        F.col(key_col),
        (
            F.coalesce("n_rows", F.lit(0).cast("long"))
            + F.coalesce("_d_cnt", F.lit(0).cast("long"))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("sum_val"), zero)
            + F.coalesce(F.col("_d_sum"), zero)
        ).alias("sum_val"),
    )
    return merged.filter(F.col("n_rows") > 0)
