"""Canonical row hashing & token functions (SURVEY.md §2.8 F8, §7.4.2).

The reference hashes rows with Python
``md5(str(sorted(row.items())))`` (lab/exercises/
06-validation-monitoring.md:95-98) — representation-dependent and
driver-side.  Here the hash is computed JVM-side from a canonical
string: columns in sorted-name order, values cast to string,
NULL encoded distinctly from the empty string, joined with an
unambiguous separator.  Engine-reproducible (the DuckDB oracle can
compute the identical md5) and fully codegen'd — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\x01NULL\x01"
SEP = "\x1f"


def canonical_concat(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Deterministic string form of a row: sorted column order,
    NULL-sentinel'd, SEP-joined."""
    names = sorted(cols if cols is not None else df.columns)
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)) for c in names
    ]
    return F.concat_ws(SEP, *parts)


def row_md5(df: DataFrame, cols: list[str] | None = None) -> Column:
    """F8: canonical md5 row hash (hex string)."""
    return F.md5(canonical_concat(df, cols))


def row_xxhash(df: DataFrame, cols: list[str] | None = None) -> Column:
    """64-bit xxhash of the canonical row string — the cheap hash for
    100 TB-scale diffing (8 bytes/row of shuffle instead of 32)."""
    return F.xxhash64(canonical_concat(df, cols))


def with_row_hash(
    df: DataFrame,
    cols: list[str] | None = None,
    out: str = "row_hash",
    algo: str = "md5",
) -> DataFrame:
    fn = row_md5 if algo == "md5" else row_xxhash
    return df.withColumn(out, fn(df, cols))


def md5_draw(seed: int | str, *cols: Column | str) -> Column:
    """Deterministic non-negative 60-bit draw from (seed, cols): the
    integer value of the first 15 hex digits of md5("seed:v1:v2…") —
    the portable analogue of a seeded RNG.  Any engine (including the
    DuckDB correctness oracle) recomputes identical draws from the
    same row; xxhash64 is ~3× cheaper but Spark-only, so it is kept
    for internal join keys where only equality matters.  15 hex
    digits = 60 bits, inside BIGINT range everywhere."""
    parts = [F.lit(str(seed))] + [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts)), 1, 15), 16, 10
    ).cast("long")


def md5_draw_sql(seed: int | str, *exprs: str) -> str:
    """DuckDB twin of :func:`md5_draw`, kept beside it so the two
    definitions cannot drift."""
    joined = ", ".join([f"'{seed}'"] + [f"CAST({e} AS VARCHAR)" for e in exprs])
    return f"CAST('0x' || substr(md5(concat_ws(':', {joined})), 1, 15) AS BIGINT)"
