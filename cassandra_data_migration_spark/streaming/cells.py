"""Streaming twin of cell-level LWW: a continuously maintained
merged-cell view over a mutation stream.

Batch :func:`~cassandra_data_migration_spark.operators.cells.cell_lww_compact`
merges cell versions across sstable generations; this maintains the
same per-(key, column) winner INCREMENTALLY as mutations arrive —
the coordinator's read-path view, always current, no compaction run
needed.  The winner rule is identical (max writetime, tombstone
beats live on a tie, then greater value), so the streamed view over
any prefix of the mutation log equals the batch merge of that prefix
— the stream-equals-batch oracle the rest of the streaming suite
uses.

Shape: ONE stateful streaming aggregation — ``groupBy(key, column)``
with a ``max(struct(...))`` state cell.  State is one 3-field struct
per live (key, column) pair: bounded by the table's cell cardinality
(the thing being maintained), NOT by stream length — every further
version of a cell folds into the same struct.  max is idempotent and
commutative, so redelivery and batch-boundary placement cannot
change the result (same argument as streaming/hll.py's register
max-merge).  Deliberately NO watermark: this is a VIEW, not a
windowed metric — state is the product.

Row tombstones are represented as their own column
(:data:`~cassandra_data_migration_spark.operators.cells.ROW_TOMBSTONE`)
and surface as a row of the view like any other cell; the read-path
shadowing filter (drop cells older than the key's row tombstone) is
a stateless projection a consumer applies on top, exactly as the
batch operator does after its aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_lww_view_stream(
    cells: DataFrame,
    key_col: str = "pk",
    column_col: str = "column_name",
    value_col: str = "value",
    writetime_col: str = "writetime_us",
    tombstone_col: str = "is_tombstone",
) -> DataFrame:
    """Current winner per (key, column) over the cell-version stream:
    (key, column, value, writetime, is_deleted).  Update-mode — each
    micro-batch emits only the cells whose winner changed."""
    k, c, v, w, t = key_col, column_col, value_col, writetime_col, tombstone_col
    return (
        cells.groupBy(k, c)
        .agg(
            F.max(
                F.struct(
                    F.col(w).alias("wt"),
                    F.col(t).cast("int").alias("tomb"),
                    F.col(v).alias("val"),
                )
            ).alias("_win")
        )
        .select(
            F.col(k),
            F.col(c),
            F.col("_win.val").alias(v),
            F.col("_win.wt").alias(w),
            (F.col("_win.tomb") == 1).alias("is_deleted"),
        )
    )
