"""Per-key running totals on Spark 4's arbitrary-state operator
(``transformWithStateInPandas``, SPARK-46815 "State API v2").

The repo's other stateful streams use ``applyInPandasWithState``
(GroupState, Spark 3.x API); this module exercises the successor —
typed state variables created in ``init`` (ValueState here; ListState/
MapState/timers are the same handle), Arrow-batched row iterators, and
a RocksDB-backed store (transformWithState REQUIRES the RocksDB state
store provider; the operator sets it on the session before starting
and restores the previous value after — the provider is read at query
start).

Semantics: for each key, maintain ``(n_events, sum_cents, last_ts_us)``
across micro-batches and emit the updated running totals for every key
touched by a batch (update mode).  All three accumulators are INTEGER
(count, pre-floored cents, µs epoch), so the totals are independent of
batch slicing and row order — the stream-equals-batch oracle is exact,
the same discipline as the CMS/HLL/KMV sinks.

State is one 24-byte tuple per key — bounded by key cardinality
forever, no growth with stream length.  At 100 TB-scale ingest the
RocksDB store spills to executor disk with incremental checkpointing;
nothing here lives on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


def tws_available() -> bool:
    """transformWithState's Python runner speaks protobuf to the JVM
    state server (unlike applyInPandasWithState's Arrow-only channel);
    without the ``protobuf`` package the runner crashes at init.  Gate
    callers on this instead of letting the query die mid-stream.  The
    sandbox image lacks protobuf, so here the twin coverage lives in
    the applyInPandasWithState operators (lww/cdc/quantiles) and the
    tws test self-skips; on a real cluster image this returns True."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

_STATE_SCHEMA = "n BIGINT, s BIGINT, mx BIGINT"


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState accumulator: (count, integer sum, max timestamp)."""

    def __init__(self, key_col: str):
        self._key_col = key_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n = 0
        s = 0
        mx = None
        for pdf in rows:
            if not len(pdf):
                continue
            n += int(len(pdf))
            s += int(pdf["_cents"].sum())
            m = int(pdf["_ts_us"].max())
            mx = m if mx is None else max(mx, m)
        if n == 0:
            return
        prev = self._state.get()
        if prev is not None:
            n += int(prev[0])
            s += int(prev[1])
            mx = max(mx, int(prev[2]))
        self._state.update((n, s, mx))
        yield pd.DataFrame(
            {
                self._key_col: [key[0]],
                "n_events": [n],
                "sum_cents": [s],
                "last_ts_us": [mx],
            }
        )

    def close(self) -> None:
        pass


def tws_running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Wire a raw event stream into the processor: project the integer
    accumulator inputs scan-side (floor(value*100) cents, µs epoch) so
    the Python boundary carries three longs per row, and group by the
    key.  Returns the update-mode emission stream
    ``(key, n_events, sum_cents, last_ts_us)``."""
    projected = stream.select(
        F.col(key_col),
        F.floor(F.col(value_col) * 100).cast("long").alias("_cents"),
        F.unix_micros(F.col(ts_col)).alias("_ts_us"),
    )
    out_schema = (
        f"{key_col} BIGINT, n_events BIGINT, sum_cents BIGINT, "
        "last_ts_us BIGINT"
    )
    return projected.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(key_col),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def run_tws_totals(
    spark,
    stream: DataFrame,
    sink_dir: str,
    checkpoint: str,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Run the totals stream to completion (availableNow) against a
    RocksDB store and return the FINAL totals per key: update-mode
    emits a row per key per touching batch, so the last emission per
    key (max batch id, which is monotone per lineage) is the answer."""
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    try:
        emissions = tws_running_totals(stream, key_col, value_col, ts_col)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.withColumn("_bid", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sink_dir)

        q = (
            emissions.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        from cassandra_data_migration_spark.streaming import await_or_raise

        await_or_raise(q, 600)
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col("_bid").desc())
    return (
        spark.read.parquet(sink_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key_col, "n_events", "sum_cents", "last_ts_us")
    )
