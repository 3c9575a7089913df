"""Continuous node-liveness maintenance — the Structured Streaming
twin of ``streaming/metrics.node_down_alerts``'s trailing-edge rule.

A live alerting stack evaluates ``up == 0 for 1m`` against the
CURRENT instant (lab/exercises/06-validation-monitoring.md:489-496):
what matters is each node's most recent successful scrape.  The
sufficient state is therefore ONE row per node — its max last-seen
timestamp — and merging a micro-batch is a per-node MAX fold:
idempotent and commutative, so replayed deliveries are no-ops and no
batch-id gate is needed (the HLL/KMV argument); crash safety is the
MV module's marker + two-rename swap.

``node_down_from_state`` turns the state into alert rows with the
SAME grid arithmetic as the batch operator's trailing-edge leg, so
streamed-vs-batch equality is by construction.  Historical (interior)
outages are deliberately NOT in state — they are the batch operator's
job over the scrape archive; bounded live state cannot and should not
carry them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.streaming.mv import (
    _recover,
    publish_state,
)


def _last_seen(df: DataFrame, node_col: str, ts_col: str) -> DataFrame:
    return df.groupBy(F.col(node_col).alias("node")).agg(
        F.max(ts_col).alias("last_ts_ms")
    )


def heartbeat_state_stream(
    heartbeats: DataFrame,
    state_path: str,
    node_col: str = "node",
    ts_col: str = "ts_ms",
    checkpoint: str | None = None,
):
    """Start a foreachBatch query folding heartbeat micro-batches into
    the one-row-per-node last-seen state at ``state_path``."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(state_path)
        delta = _last_seen(batch_df, node_col, ts_col)
        if os.path.exists(state_path):
            current = spark.read.parquet(state_path)
            merged = _last_seen(
                current.unionByName(delta), "node", "last_ts_ms"
            )
        else:
            merged = delta
        publish_state(merged, state_path, batch_id)

    return (
        heartbeats.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            checkpoint or state_path.rstrip("/") + "_ckpt",
        )
        .trigger(availableNow=True)
        .start()
    )


def node_down_from_state(
    spark,
    state_path: str,
    scrape_ms: int,
    down_ms: int,
    range_end_ms: int,
) -> DataFrame:
    """The live liveness alert: nodes whose last successful scrape
    slot sits >= the down threshold before the evaluation instant —
    identical grid arithmetic to the batch operator's trailing leg
    (metrics.node_down_alerts), over O(nodes) state rows."""
    end_b = range_end_ms // scrape_ms
    st = spark.read.parquet(state_path).select(
        "node", F.expr(f"last_ts_ms DIV {int(scrape_ms)}").alias("_last")
    )
    return (
        st.withColumn("_gap", F.lit(end_b) - F.col("_last") - F.lit(1))
        .filter(F.col("_gap") * scrape_ms >= down_ms)
        .select(
            "node",
            ((F.col("_last") + 1) * scrape_ms)
            .cast("long")
            .alias("down_since_ms"),
            (F.col("_gap") * scrape_ms).cast("long").alias("down_for_ms"),
            F.lit("node_down").alias("alert"),
        )
        .orderBy("node")
    )
