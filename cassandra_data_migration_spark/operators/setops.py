"""Set operations (SURVEY.md §2.7 U1-U3)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """U1/U3: multi-DataFrame union by name."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def per_table_summary(tables: dict[str, DataFrame]) -> DataFrame:
    """U1: the validation report's cross-table roll-up
    (lab/scripts/validate_migration.py:21-74) — one count per table,
    unioned into a single result."""
    parts = [
        df.agg(F.count(F.lit(1)).alias("row_count")).select(
            F.lit(name).alias("table_name"), "row_count"
        )
        for name, df in tables.items()
    ]
    return union_all(parts)


def value_set_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2 primitive: bag difference (EXCEPT ALL) of two same-schema
    sides — the normalized schema diff uses this over
    (column, type) rows."""
    return a.exceptAll(b)
