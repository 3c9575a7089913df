"""Data-layout operators: Z-order (Morton) clustering keys.

Cassandra fixes physical order by (partition key, clustering columns);
an analytics lake gets the same effect — and more — by choosing the
SORT ORDER of the files it writes.  Sorting on a Z-order key
interleaves the bits of several columns so that rows close in ANY of
those dimensions land close on disk; parquet row-group min/max stats
then prune multi-dimensional range queries that a single-column sort
could only prune on its leading column.  (Same technique Delta/Iceberg
expose as ``OPTIMIZE ... ZORDER BY``; reference analogue: the
token-range data placement in SURVEY.md §1.3.)

Scale notes
-----------
- The key is a pure scan-side integer expression (shift/and/or adds):
  zero shuffle to compute, whole-stage codegen compiles it flat.
- ``zorder_write`` does ONE range-repartition + in-partition sort —
  the identical cost of any sorted write, no extra pass.
- Pruning is engine-side: parquet stats do the skipping, so the gain
  compounds with scan width (a 100 TB table skips row groups before
  reading a byte of data pages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (values
    must be non-negative; quantize/clamp first).  For k columns, bit b
    of column j lands at position ``b·k + j`` — a flat sum of
    shift/mask terms that stays inside codegen.

    The result is deterministic integer arithmetic, so any engine
    reproduces it bit-for-bit (the DuckDB oracle uses ``>>``/``&``/
    multiplies on BIGINT).
    """
    k = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        v = c.cast("long")
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * k + j
            )
    return out


def zorder_key_sql(cols: list[str], bits: int = 8) -> str:
    """DuckDB twin of :func:`zorder_key` (same bit placement)."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * k + j})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[Column | str],
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-repartition on the key (equal-size output files, preserving
    global key order across files) then sort within partitions (tight
    row-group min/max ranges inside each file)."""
    keyed = df.withColumn("_z", zorder_key(cols, bits))
    part = (
        keyed.repartitionByRange(num_files, "_z")
        if num_files
        else keyed.repartitionByRange("_z")
    )
    part.sortWithinPartitions("_z").drop("_z").write.mode("overwrite").parquet(
        path
    )
