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
