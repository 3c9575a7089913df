"""Streaming sessionization — the Structured Streaming twin of
`operators.windows.sessionize` (same gap semantics, verified
equivalent by test).

Scale notes: `F.session_window` keeps one open-session state row per
active user key; the watermark bounds that state by evicting sessions
whose close time has passed.  At 100 TB-of-events scale the state
store holds |active users| rows regardless of history length — the
same one-exchange-on-user-key shape as the batch twin, with eviction
instead of a sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Gap-based sessions over a streaming DataFrame.

    Boundary semantics are aligned with the batch operator, which
    truncates timestamps to whole seconds and starts a new session
    only when idle time is STRICTLY greater than the gap: Spark's
    session window merges an event while `ts < window_end`
    (idle < window gap), so a `(gap_seconds + 1)`-second window over
    second-truncated timestamps merges exactly when
    `idle_seconds <= gap_seconds` — the batch rule.

    Pass ``watermark=None`` only for finite replays in complete
    mode; production append-mode streams need the watermark to emit
    closed sessions and evict their state.
    """
    sec = F.date_trunc("second", F.col(ts_col))
    sessed = events.withColumn("_sec", sec)
    if watermark is not None:
        sessed = sessed.withWatermark("_sec", watermark)
    return (
        sessed.groupBy(
            F.col(user_col),
            F.session_window("_sec", f"{gap_seconds + 1} seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_sec").alias("session_start"),
            F.max("_sec").alias("session_end"),
        )
        .select(
            user_col,
            "n_events",
            "session_start",
            "session_end",
            (
                F.col("session_end").cast("long")
                - F.col("session_start").cast("long")
            ).alias("duration_s"),
        )
    )
