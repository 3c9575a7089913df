"""Deterministic dense ID assignment at scale.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole dataset into ONE partition — the canonical 100 TB scale killer.
This module assigns the identical ids with bounded parallelism:

1. approximate quantile boundaries of the leading order column split
   the data into ordered buckets (approximation only affects balance,
   never correctness — equal keys always map to the same bucket);
2. per-bucket counts (an O(buckets) aggregate) are cumsum'd into
   bucket offsets and BROADCAST-JOINED back — the offsets frame is one
   row per bucket, so the cumsum window and the broadcast are both
   O(buckets), and the plan size stays constant no matter how many
   buckets there are (a literal id→offset map would bloat the plan
   past ~10^6 buckets);
3. each bucket numbers its own rows with a PARTITIONed window and adds
   its offset.

The result equals the single-partition ``row_number`` exactly (the
DuckDB oracle states it that way), but the biggest sort any executor
performs is one bucket, not the corpus."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_of(key: Column, boundaries: list) -> Column:
    """0-based ordered bucket: how many boundaries are < key.  A CASE
    over literal boundaries — scan-side, codegen'd."""
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b < key))


def stable_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    descending: list[bool] | None = None,
    out: str = "stable_id",
    buckets: int = 64,
    start: int = 1,
) -> DataFrame:
    """Assign 1-based dense ids in (order_cols) order without a global
    sort.  ``order_cols`` must form a total order (include a unique
    tiebreaker).  ``descending[i]`` flips the i-th column's direction.
    """
    desc = descending or [False] * len(order_cols)
    lead = order_cols[0]
    qs = [i / buckets for i in range(1, buckets)]
    bounds = df.select(
        F.percentile_approx(F.col(lead).cast("double"), qs).alias("b")
    ).first()["b"] or []
    bounds = sorted(set(bounds))
    lead_key = F.col(lead).cast("double")
    if desc[0]:
        # bucket on the negated key so bucket order == id order
        lead_key = -lead_key
        bounds = sorted({-b for b in bounds})
    bucket = _bucket_of(lead_key, bounds).alias("_bkt")
    d = df.withColumn("_bkt", bucket)
    # exclusive prefix sum over the O(buckets) counts — collected and
    # cumsum'd driver-side (tiny), then shipped back as a BROADCAST-
    # JOINED frame: the plan stays O(1) in size however many buckets
    # there are (a literal id→offset map would bloat it past ~10^6)
    per_bucket = {
        r["_bkt"]: r["cnt"]
        for r in d.groupBy("_bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    rows, acc = [], start - 1
    for b in sorted(per_bucket):
        rows.append((b, acc))
        acc += per_bucket[b]
    offsets = d.sparkSession.createDataFrame(rows, "_bkt int, _off long")
    order_exprs = [
        F.col(c).desc() if dsc else F.col(c).asc()
        for c, dsc in zip(order_cols, desc)
    ]
    w = Window.partitionBy("_bkt").orderBy(*order_exprs)
    return (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            out,
            (F.row_number().over(w) + F.col("_off")).cast("bigint"),
        )
        .drop("_bkt", "_off")
    )


def grouped_min_ranks(
    df: DataFrame,
    order_col: str,
    extra_aggs: list[Column],
    buckets: int = 64,
    bounds: list | None = None,
    materialize: bool = True,
) -> DataFrame:
    """``groupBy(order_col)`` stats plus each group's 1-based global
    MIN rank in ``order_col`` order — the folded form of
    ``stable_dense_ids(...).groupBy(order_col).agg(min(rank), ...)``
    for consumers (rank-sum AUC, tie-group statistics) that never need
    per-row ranks.  Output: (order_col, _cnt, extra_aggs..., _min_rank).

    Folding the chain drops the per-row bucket window entirely: rows
    are pre-aggregated to their tie groups in ONE shuffle
    (``groupBy(_bkt, order_col)``; ``_bkt`` is a function of the key,
    so this IS the tie-group frame), the prefix window then runs over
    O(distinct keys) group rows per bucket instead of every row, and
    no per-row tiebreaker (monotonically_increasing_id) is needed —
    the tie group's min rank is the bucket offset plus the exclusive
    running count of earlier groups' rows, +1.

    Bucket offsets come from the tie-group frame ITSELF, inside the
    same plan: re-aggregate it to O(buckets) per-bucket totals, prefix
    those with a window (trivially single-partition over <= ``buckets``
    rows) and broadcast-join the offsets back — the tie-group exchange
    is reused for both branches, so the whole operator is one scan of
    ``df`` plus one shuffle, zero driver-side jobs.

    ``bounds``: explicit ordered bucket boundaries over the (double)
    key — pass them when the score domain is known (e.g. a fixed-point
    score in [0, 1e7]) to skip the percentile_approx pass; like the
    approximate quantiles they only affect balance, never values.

    ``materialize`` (default True): localCheckpoint the tie-group
    frame so the offsets branch and the consumer both read the
    materialized O(distinct keys) frame instead of re-running the
    input scan (AQE exchange reuse is not guaranteed across the two
    aggregation branches — measured a full second scan without it).
    The frame is distributed executor storage, O(distinct keys) rows;
    pass False only when the key is near-unique (the frame would be
    corpus-sized) AND the input scan is cheap."""
    lead_key = F.col(order_col).cast("double")
    if bounds is None:
        qs = [i / buckets for i in range(1, buckets)]
        bounds = df.select(
            F.percentile_approx(lead_key, qs).alias("b")
        ).first()["b"] or []
    bounds = sorted(set(bounds))
    d = df.withColumn("_bkt", _bucket_of(lead_key, bounds))
    groups = d.groupBy("_bkt", order_col).agg(
        F.count(F.lit(1)).alias("_cnt"), *extra_aggs
    )
    if materialize:
        groups = groups.localCheckpoint(eager=True)
    w_off = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        groups.groupBy("_bkt")
        .agg(F.sum("_cnt").alias("_bc"))
        .withColumn(
            "_off", F.coalesce(F.sum("_bc").over(w_off), F.lit(0))
        )
        .drop("_bc")
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        groups.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_min_rank",
            (
                F.col("_off")
                + F.coalesce(F.sum("_cnt").over(w), F.lit(0))
                + F.lit(1)
            ).cast("bigint"),
        )
        .drop("_bkt", "_off")
    )
