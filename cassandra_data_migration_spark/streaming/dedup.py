"""Streaming exact dedup — the Structured Streaming twin of
``operators.dedup.dedup_exact`` / ``incremental_dedup`` (same
canonical fingerprint: md5 of the normalized text).

``dropDuplicates`` over a streaming DataFrame keeps the state store
keyed by the dedup column: each arriving document probes the store
and passes through only if its fingerprint is unseen — exactly the
fingerprint-anti-join the batch incremental operator performs against
its "seen" table, with the state store playing the seen table.

Scale notes: state is one row per DISTINCT fingerprint (16-byte key),
not per document; ``dropDuplicatesWithinWatermark`` bounds it by time
when corpus-wide exactness can be relaxed to a horizon (re-crawls
arrive within days, not years).  The sink side persists surviving
fingerprints, which re-enter a cold restart as the ``seen_df`` of the
batch operator — the two tiers share one fingerprint definition, so
they compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.text import normalize_text


def dedup_stream(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """First-seen-wins exact dedup over a stream.  With ``ts_col`` +
    ``watermark``, state is bounded to the watermark horizon via
    ``dropDuplicatesWithinWatermark``; without, state grows with
    distinct fingerprints (corpus-exact, like the batch operator)."""
    keyed = stream.withColumn("_fp", F.md5(normalize_text(text_col)))
    if ts_col is not None and watermark is not None:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["_fp"]
        )
    return keyed.dropDuplicates(["_fp"])
