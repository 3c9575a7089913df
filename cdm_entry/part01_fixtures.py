"""Shared fixtures: origin/target pair, table loader, base imports.

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    export_all,
    register_queries,
)


import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators import aggregates as agg
from cassandra_data_migration_spark.operators import filters as flt
from cassandra_data_migration_spark.operators import joins as jn
from cassandra_data_migration_spark.operators.sampling import bucket_sql
from cassandra_data_migration_spark.sources.tables import load_table
from cassandra_data_migration_spark.streaming import await_or_raise

# ---------------------------------------------------------------------------
# deterministic origin/target pair for validation operators
# ---------------------------------------------------------------------------

ORDERS_PK = ["o_orderkey"]


def _origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


def _target(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _origin(spark, sf_dir)
    return o.filter(F.pmod("o_orderkey", F.lit(10)) != 0).withColumn(
        "o_totalprice",
        F.when(
            F.pmod("o_orderkey", F.lit(7)) == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )

_TARGET_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 <> 0
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------



register_queries(globals())
__all__ = export_all(globals())
