"""Stream-static enrichment: decorate a mutation stream with columns
from a slowly-changing dimension table — the streaming twin of the FK
broadcast join (operators/joins.py fk_join_enrich; reference
analogue: the per-row lookup enrichment a migration proxy performs,
docs/04-cdm-approach.md custom transforms).

The dimension is static within a run and tiny relative to the
stream, so it joins as a BROADCAST stream-static join: evaluated
inside each micro-batch's scan, no stream-side shuffle, no state
store, append-mode safe (enrichment of a row depends only on that
row).  At 100 TB-of-stream scale this is the only join shape that
keeps the stream a narrow map — the dim refreshes by restarting the
query (or a foreachBatch re-read for per-batch freshness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Left-enrich ``stream`` with ``dim`` on the ``on`` key via an
    explicit broadcast hint.  Rows with no dim match keep NULL dim
    columns (the stream must never drop events because a dimension
    row is late — the LWW reconcile path handles those)."""
    return stream.join(F.broadcast(dim), on, how)
