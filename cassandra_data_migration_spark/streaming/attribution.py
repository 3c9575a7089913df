"""Stream-stream interval join — click→purchase attribution.

The one Structured Streaming join mode the rest of the streaming
suite doesn't exercise: joining two UNBOUNDED sides (dual_write and
enrich are stream-static; lww/sessions are stateful aggregations).
The reference has no joins at all (SURVEY.md §2.3); this is the
Spark-native shape for "which click led to this purchase" style
event correlation over live mutation streams.

Semantics: every (purchase, click) pair with the same user where the
click happened inside ``attribution_window`` BEFORE (or at) the
purchase.  Interval-join semantics — ALL qualifying pairs, not just
the latest click (that collapse is ``operators/joins.asof_join``'s
job, batch-side).

100 TB / unbounded shape: both sides carry a watermark and the join
condition bounds event time on both ends, so Spark derives a state
watermark and EVICTS buffered rows once they can no longer match —
state is O(rate × window), not O(stream).  Without the two-sided
time bound the state store would grow forever; that is the pitfall
this operator exists to demonstrate avoiding.  The join itself hash
partitions both sides by key exactly like a batch equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join_stream(
    events: DataFrame,
    attribution_window: str = "4 hours",
    watermark: str = "8 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """(user_id, purchase_id, purchase_ts, value, click_id, click_ts)
    for every click within ``attribution_window`` before the purchase.
    ``events`` may be a streaming OR batch DataFrame — the same plan
    compiles both ways (the stream-equals-batch test relies on it)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col(key_col),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col(key_col).alias("_pk"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (purchases["_pk"] == clicks[key_col])
        & (clicks["click_ts"] <= purchases["purchase_ts"])
        & (
            clicks["click_ts"]
            >= purchases["purchase_ts"] - F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return purchases.join(clicks, cond, "inner").select(
        F.col(key_col),
        "purchase_id",
        "purchase_ts",
        "value",
        "click_id",
        "click_ts",
    )


def multi_touch_credit(
    events: DataFrame,
    attribution_window: str = "4 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Linear multi-touch attribution: every click inside the window
    before a purchase gets an equal share of the purchase value —
    (click_id, n_purchases, credit_cents).

    Exactness: credit is allocated in integer CENTS with floor
    division (``floor(value·100 / n_clicks)``) so per-click credit
    sums are order-independent integers in any engine; the sub-cent
    remainder per purchase is deliberately dropped (documented,
    deterministic) rather than floated.

    Plan: the interval join emits (purchase, click) pairs; one
    groupBy(purchase) counts touches; credit allocation is scan-side;
    the per-click rollup is the only further shuffle."""
    pairs = attribution_join_stream(
        events, attribution_window, ts_col=ts_col, key_col=key_col
    )
    touches = pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.first("value").alias("_v"),
    )
    credited = pairs.join(touches, "purchase_id").select(
        "click_id",
        "purchase_id",
        F.floor(F.col("_v") * 100 / F.col("_n")).cast("long").alias("_credit"),
    )
    return (
        credited.groupBy("click_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("_credit").alias("credit_cents"),
        )
    )
