"""Test-data table registry (S1: full-table scan source).

The driver materializes TPC-H-ish tables as parquet under
``/root/testdata/sf*/``.  A full-table scan in the reference is a
paged ``SELECT * FROM t`` (docs/02-native-tooling.md:434,
lab/scripts/validate_migration.py:43); the Spark-native equivalent is
a parquet scan, which Catalyst splits into ~``maxPartitionBytes``
tasks (the analogue of the reference's token-range splits,
docs/04-cdm-approach.md:290-299) and pushes projections/predicates
into (column pruning + PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Declarative — Catalyst prunes columns and pushes
    filters applied downstream into this scan."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so pipelines can be written
    in pure SQL (``spark.sql``) as well as the DataFrame API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
