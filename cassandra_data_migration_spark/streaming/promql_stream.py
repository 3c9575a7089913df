"""Continuous irate maintenance — the Structured Streaming twin of
``streaming/promql.irate``.

A live dashboard wants the instant rate of every counter series as
scrapes arrive.  The sufficient state is tiny and idempotent: the TWO
most-recent samples per series.  Merging a micro-batch is "union,
dedup, keep top-2 by timestamp per series" — a max-like fold, so
replaying a batch re-offers rows that dedup away and NO batch-id gate
is needed for correctness (the HLL/KMV argument, not the CMS one);
crash safety is the MV module's marker + two-rename swap.

State is exactly ≤ 2 rows per series forever.  ``irate_from_state``
turns the state table into the per-series rate with the SAME batch
operator (``promql.irate``), so streamed-vs-batch equality is by
construction, not by parallel implementation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_data_migration_spark.streaming.mv import (
    _recover,
    publish_state,
)


def _top2(
    df: DataFrame, series_cols: list[str], ts_col: str, value_col: str
) -> DataFrame:
    """Two most-recent samples per series.  Same-timestamp duplicates
    collapse first (promql._dedup_ts) so replayed deliveries are
    no-ops and the fold stays deterministic."""
    from cassandra_data_migration_spark.streaming.promql import _dedup_ts

    dedup = _dedup_ts(df, series_cols, ts_col, value_col)
    w = Window.partitionBy(*series_cols).orderBy(F.desc(ts_col))
    return (
        dedup.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
        .drop("_rn")
    )


def irate_state_stream(
    samples: DataFrame,
    state_path: str,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    checkpoint: str | None = None,
):
    """Start a foreachBatch query folding scrape micro-batches into
    the ≤2-rows-per-series state table at ``state_path``.  Returns the
    StreamingQuery."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(state_path)
        delta = _top2(batch_df, series_cols, ts_col, value_col)
        if os.path.exists(state_path):
            current = spark.read.parquet(state_path)
            merged = _top2(
                current.unionByName(delta), series_cols, ts_col, value_col
            )
        else:
            merged = delta
        # state is <= 2 rows/series (a few MB even at millions of
        # series): one output file per publish, not one per shuffle
        # partition — per-trigger latency is file-count-bound here
        publish_state(merged.coalesce(1), state_path, batch_id)

    return (
        samples.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            checkpoint or state_path.rstrip("/") + "_ckpt",
        )
        .trigger(availableNow=True)
        .start()
    )


def irate_from_state(
    spark,
    state_path: str,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    out_scale: int = 10_000,
) -> DataFrame:
    """The live instant rate: the BATCH irate operator applied to the
    maintained state (≤ 2 rows per series, so this costs O(series))."""
    from cassandra_data_migration_spark.streaming.promql import irate

    return irate(
        spark.read.parquet(state_path),
        series_cols,
        ts_col=ts_col,
        value_col=value_col,
        out_scale=out_scale,
    )
