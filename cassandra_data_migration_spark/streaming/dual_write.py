"""Z1: dual-write fan-out (ZDM proxy write path).

The proxy duplicates every client write to origin (sync — failures
surface to the client) and target (async — failures only surface in
metrics) (docs/05-zdm-approach.md:108-114, 392-396).  Spark-native:
a Structured Streaming query whose ``foreachBatch`` writes each
micro-batch to both sinks:

- origin write failures RAISE → the batch retries/fails: exactly-once
  on the primary path via checkpointing + deterministic batch ids;
- target write failures are caught and METERED per route
  (``failed_on=origin|target|both`` —
  lab/exercises/05-zdm-migration.md:167-171), matching the proxy's
  fire-and-forget secondary semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class DualWriteMetrics:
    """Z5 counters (zdm_proxy_failed_writes_total{failed_on=...})."""

    batches: int = 0
    rows_origin: int = 0
    rows_target: int = 0
    failed_on: dict[str, int] = field(
        default_factory=lambda: {"origin": 0, "target": 0, "both": 0}
    )


def make_dual_writer(
    origin_writer,
    target_writer,
    metrics: DualWriteMetrics | None = None,
):
    """Build the foreachBatch function.  ``origin_writer`` /
    ``target_writer`` are ``(DataFrame, batch_id) -> None`` sink
    callables (parquet append, CQL connector write, ...)."""
    m = metrics if metrics is not None else DualWriteMetrics()

    def write_both(batch: DataFrame, batch_id: int) -> None:
        m.batches += 1
        batch = batch.persist()
        try:
            n = batch.count()
            origin_failed = False
            try:
                origin_writer(batch, batch_id)
                m.rows_origin += n
            except Exception:
                origin_failed = True
                m.failed_on["origin"] += 1
                raise  # sync path: the client (stream) sees origin failures
            finally:
                try:
                    target_writer(batch, batch_id)
                    m.rows_target += n
                except Exception:  # noqa: BLE001 — async path is metered only
                    m.failed_on["both" if origin_failed else "target"] += 1
        finally:
            batch.unpersist()

    write_both.metrics = m  # type: ignore[attr-defined]
    return write_both


def parquet_appender(path: str):
    """Idempotent batch sink: each micro-batch lands in its own
    ``batch_id=N`` directory with OVERWRITE semantics, so foreachBatch
    at-least-once redelivery (failure/restart replays the last
    un-checkpointed batch) rewrites the same directory instead of
    appending duplicates — deterministic batch ids + idempotent write
    = exactly-once, the standard Structured Streaming recipe.  A
    crash mid-write leaves a partial dir the redelivered batch
    replaces wholesale.  Read the sink back with :func:`read_sink`
    (drops the partition-discovery column)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return write


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read a dual-write sink directory: hive partition discovery
    surfaces ``batch_id``; drop it so the result is exactly the
    mutation rows."""
    return spark.read.parquet(path).drop("batch_id")


def dual_write_stream(
    mutations: DataFrame,
    origin_path: str,
    target_path: str,
    checkpoint: str,
    metrics: DualWriteMetrics | None = None,
    trigger_available_now: bool = True,
):
    """Wire a mutation stream into the dual sink.  Returns the started
    StreamingQuery; checkpointing makes the origin path exactly-once
    (re-delivered batches rewrite the same batch_id)."""
    writer = make_dual_writer(
        parquet_appender(origin_path), parquet_appender(target_path), metrics
    )
    builder = (
        mutations.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        builder = builder.trigger(availableNow=True)
    return builder.start()


def file_mutation_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """A file-backed mutation source (stand-in for the CQL/Kafka feed
    the proxy taps).  Each new file is a micro-batch of mutations."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
