"""Incremental Merkle range digests over a mutation stream — the
streaming twin of ``operators/merkle.py``.

The reference's continuous validation re-scans both clusters every
60 s (reference lab/exercises/06-validation-monitoring.md:410-449).
With an order-independent range digest (sum of row digests mod 2**60)
the origin side never needs re-scanning: a stateful streaming
aggregation keyed by token-range bucket folds every new mutation into
its leaf digest incrementally.  Comparing the maintained leaf table
against a target-side snapshot digest (operators/merkle.range_digests)
flags divergent ranges continuously, at O(leaves) compare cost per
tick instead of O(rows) re-validation.

Plan shape: one watermark-free global aggregation with
``fanout**depth`` keys — state is a fixed-size table of (count,
decimal sum) pairs, bounded regardless of stream length, and the
map-side partial aggregation means each micro-batch ships at most
O(leaves) rows to the state store.  The mod-2**60 reduction happens
in the projection AFTER the stateful sum, so the running state stays
a plain associative DECIMAL sum that Spark can merge in any order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.functions.hashing import md5_draw
from cassandra_data_migration_spark.operators.merkle import (
    TOKEN_SPACE,
    _row_digest,
    portable_digest_cols,
)


def incremental_range_digests(
    stream: DataFrame,
    key_col: str,
    digest_cols: list[str],
    depth: int = 3,
    fanout: int = 4,
    seed: str = "merkle",
) -> DataFrame:
    """Streaming (bucket, n_rows, digest) leaf table, incrementally
    maintained from an insert stream.  Identical output to the batch
    ``range_digests`` over the same rows (asserted by the
    stream-equals-batch test and the DuckDB oracle), so the two frames
    are directly comparable in a ``merkle_diff``-style join."""
    leaves = fanout**depth
    width = -(-TOKEN_SPACE // leaves)
    tok = md5_draw(seed + ":tok", key_col)
    dig = _row_digest(portable_digest_cols(stream, digest_cols))
    return (
        stream.select(
            F.floor(tok / F.lit(width)).cast("long").alias("bucket"),
            dig.alias("_dig"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_dig").cast("decimal(38,0)")).alias("_sum"),
        )
        .select(
            "bucket",
            "n_rows",
            F.pmod(F.col("_sum"), F.lit(TOKEN_SPACE).cast("decimal(38,0)"))
            .cast("long")
            .alias("digest"),
        )
    )
