"""Streaming operators (Structured Streaming twins of the batch
plans) plus two shared harness utilities every bounded
(``availableNow``) run needs: :func:`await_or_raise` and
:func:`state_scaled_shuffle`."""

import math
from contextlib import contextmanager

_SHUFFLE_CONF = "spark.sql.shuffle.partitions"


@contextmanager
def state_scaled_shuffle(
    spark,
    input_bytes: int,
    bytes_per_partition: int = 32 << 20,
    min_partitions: int = 8,
):
    """Scope ``spark.sql.shuffle.partitions`` to a STATE-sized value
    while a streaming query runs.

    A stateful streaming query's state-store partition count is fixed
    by the shuffle-partition setting at first checkpoint — and unlike
    batch shuffles, AQE can NEVER coalesce it afterwards.  Each
    microbatch then pays per-partition state-store open/commit/
    maintenance costs, so an oversized count is pure overhead forever
    (measured: the stream-stream interval join at sf0.1 runs 2.2x
    faster at 8 state partitions than at 32) while an undersized one
    caps state parallelism forever.  Sizing: ~one partition per
    32 MB of input, floored at ``min_partitions`` and capped at
    2 x cluster parallelism (the standard guidance of a small
    multiple of cores — state partitions beyond that only add
    per-batch fixed cost).

    Only the STREAM started inside the ``with`` block binds this
    value; lazily-returned batch DataFrames execute after restore and
    keep the session's setting.
    """
    cap = max(min_partitions, 2 * spark.sparkContext.defaultParallelism)
    target = max(
        min_partitions,
        min(cap, math.ceil(max(1, input_bytes) / bytes_per_partition)),
    )
    prev = spark.conf.get(_SHUFFLE_CONF)
    spark.conf.set(_SHUFFLE_CONF, str(target))
    try:
        yield target
    finally:
        spark.conf.set(_SHUFFLE_CONF, prev)


def await_or_raise(query, timeout_sec: float) -> None:
    """``awaitTermination`` that FAILS LOUDLY on timeout.

    ``StreamingQuery.awaitTermination(t)`` returns ``False`` when the
    query is still running after ``t`` seconds — silently proceeding
    past that reads a partial sink and returns stale totals with no
    error.  Every bounded run in this repo goes through here: on
    timeout the query is stopped and a ``TimeoutError`` is raised so
    the caller can never mistake a half-finished stream for a result.
    """
    if not query.awaitTermination(timeout_sec):
        try:
            query.stop()
        finally:
            raise TimeoutError(
                f"streaming query {query.name or query.id} did not "
                f"terminate within {timeout_sec}s; sink contents would "
                f"be partial"
            )
