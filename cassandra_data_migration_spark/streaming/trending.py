"""Streaming trending aggregation: live top-k keys per time window —
the dashboard the migration traffic monitor renders (reference
analogue: the ops-mix panels of lab/monitoring/grafana-dashboards,
computed engine-side instead of scrape-side).

The windowed count runs as a streaming aggregation; the top-k rank is
applied on the sink side of each trigger (rank-over-window is not a
streaming-supported operator, and at k≪keys it is a driver-cheap cut
of an O(windows·keys) state table).  With a watermark, state for
closed windows ages out, bounding memory by (active windows × keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trending_counts_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window, key, n_events) streaming aggregation with bounded
    state; feed to ``rank_topk`` per emitted batch for the top-k cut.
    The bucketing is the same ``F.window`` as the batch twin
    (``aggregates.trending_per_window``), so stream output equals the
    batch computation on the same data once all input is processed."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("_w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def rank_topk(counts: DataFrame, key_col: str = "event_type", k: int = 3) -> DataFrame:
    """Batch-side top-k cut of a (window, key, count) table."""
    from pyspark.sql import Window as W

    rnk = F.row_number().over(
        W.partitionBy("_w").orderBy(F.col("n_events").desc(), F.col(key_col))
    )
    return (
        counts.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= k)
        .select(F.col("_w.start").alias("win_start"), key_col, "n_events", "rnk")
    )
