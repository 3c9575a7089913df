"""Z5/Z8 + A7: streaming metrics, windowed rates, threshold alerts.

The proxy exposes Prometheus counters/histograms per route; exercises
query them as ``rate(...[5m])`` and alert on thresholds
(lab/exercises/06-validation-monitoring.md:455-497).  Spark-native:
watermarked tumbling-window aggregations (the watermark bounds state,
which the reference never needs because Prometheus scrapes are
pass-through — idiomatic Spark requires it, SURVEY.md §2.9 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lab/exercises/06-validation-monitoring.md:462-496
DEFAULT_THRESHOLDS = {
    "error_rate_per_sec": 10.0,
    "count_drift": 100,
    "p99_latency": 1.0,
}


def windowed_ops(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-window per-type counts + rate — the streaming form of
    aggregates.rate_over_window.  State is bounded by the watermark."""
    win_secs = _window_seconds(window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            "cnt",
            F.round(F.col("cnt") / win_secs, 6).alias("ops_per_sec"),
        )
    )


def windowed_error_rate(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
    error_predicate=None,
) -> DataFrame:
    pred = error_predicate if error_predicate is not None else (F.col("event_type") == "error")
    win_secs = _window_seconds(window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.sum(F.when(pred, 1).otherwise(0)).alias("errors"))
        .select(
            F.col("w.start").alias("window_start"),
            "errors",
            F.round(F.col("errors") / win_secs, 6).alias("errors_per_sec"),
        )
    )


def alert_filter(
    windowed: DataFrame, value_col: str, threshold: float, alert_name: str
) -> DataFrame:
    """Z8: windows breaching the threshold become alert rows."""
    return windowed.filter(F.col(value_col) > threshold).withColumn(
        "alert", F.lit(alert_name)
    )


def observe_stream(df: DataFrame, name: str = "stream_metrics") -> DataFrame:
    """A9/Z5: ride-along metrics via observe(); read from
    StreamingQueryListener / query.lastProgress.observedMetrics."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
    )


def _window_seconds(window: str) -> float:
    qty, unit = window.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
    }[unit]
    return float(qty) * mult
