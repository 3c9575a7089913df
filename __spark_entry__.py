"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one implemented operator from
SURVEY.md §2, expressed through the ``cassandra_data_migration_spark``
package; ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.
Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).

Validation-operator queries (J1/J2/J3/J5…) need an origin/target
pair; the reference's lab builds one by actually migrating a cluster.
Here both engines derive the same deterministic pair from ``orders``:
  origin = orders
  target = orders minus every 10th key (missing rows),
           with o_totalprice corrupted on every 7th key (mismatches).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators import aggregates as agg
from cassandra_data_migration_spark.operators import filters as flt
from cassandra_data_migration_spark.operators import joins as jn
from cassandra_data_migration_spark.sources.tables import load_table

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

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def q_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1: full-table scan
    return load_table(spark, sf_dir, "nation")


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P1
    return flt.project(
        load_table(spark, sf_dir, "customer"), ["c_custkey", "c_name", "c_mktsegment"]
    )


def q_column_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P2
    return flt.exclude(load_table(spark, sf_dir, "customer"), ["c_acctbal", "c_name"])


def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P3
    return flt.filter_eq(
        load_table(spark, sf_dir, "customer"), "c_mktsegment", "BUILDING"
    )


def q_token_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P4
    return flt.token_range_filter(
        load_table(spark, sf_dir, "orders"), "o_orderkey", 3, 7, num_buckets=32
    )


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P6
    return flt.point_lookup(
        load_table(spark, sf_dir, "lineitem"), {"l_orderkey": 7, "l_linenumber": 1}
    )


def q_grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1/A3
    return agg.grouped_count(load_table(spark, sf_dir, "orders"), "o_orderstatus")


def q_writetime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5: incremental migration — rows written after T µs.  Writetime is
    # derived from the event-time column (functions.metadata).
    from cassandra_data_migration_spark.functions.metadata import (
        attach_derived_writetime,
    )
    from cassandra_data_migration_spark.operators.filters import writetime_filter

    ev = attach_derived_writetime(load_table(spark, sf_dir, "events"), "ts")
    return writetime_filter(ev, 1705276800000000)  # 2024-01-15T00:00:00Z


def q_guardrail_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P7: guardrail size predicate — documents whose text exceeds the cap
    docs = load_table(spark, sf_dir, "documents")
    _, violations = flt.guardrail_split(docs, {"text": 0.35})
    return violations


def q_missing_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1
    return jn.missing_rows(_origin(spark, sf_dir), _target(spark, sf_dir), ORDERS_PK)


def q_mismatch_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2 — PKs of rows whose non-key values differ (hash-compare inside)
    return jn.mismatched_rows(
        _origin(spark, sf_dir), _target(spark, sf_dir), ORDERS_PK
    ).select("o_orderkey")


def q_reconcile_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J3 — repair set: missing ∪ mismatched (origin wins; no writetime col here)
    return jn.reconcile(_origin(spark, sf_dir), _target(spark, sf_dir), ORDERS_PK)


def q_bucket_count_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J5
    return jn.per_bucket_count_compare(
        _origin(spark, sf_dir), _target(spark, sf_dir), "o_orderkey", 32
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "full_scan": q_full_scan,
    "projection": q_projection,
    "column_exclude": q_column_exclude,
    "filter_eq": q_filter_eq,
    "token_range_filter": q_token_range_filter,
    "point_lookup": q_point_lookup,
    "grouped_count": q_grouped_count,
    "writetime_filter": q_writetime_filter,
    "guardrail_violations": q_guardrail_violations,
    "missing_rows": q_missing_rows,
    "mismatch_detect": q_mismatch_detect,
    "reconcile_rows": q_reconcile_rows,
    "bucket_count_compare": q_bucket_count_compare,
}

ORACLES: dict[str, str] = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "full_scan": "SELECT * FROM nation",
    "projection": "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "column_exclude": "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer",
    "filter_eq": "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'",
    "token_range_filter": "SELECT * FROM orders WHERE (o_orderkey % 32) BETWEEN 3 AND 7",
    "point_lookup": "SELECT * FROM lineitem WHERE l_orderkey = 7 AND l_linenumber = 1",
    "grouped_count": (
        "SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus"
    ),
    "writetime_filter": """
        SELECT *, epoch_us(ts) AS _writetime
        FROM events WHERE epoch_us(ts) >= 1705276800000000
    """,
    "guardrail_violations": """
        SELECT * FROM documents
        WHERE octet_length(encode(text)) / 1024.0 > 0.35
    """,
    "missing_rows": f"""
        SELECT o.* FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM ({_TARGET_SQL}) t WHERE t.o_orderkey = o.o_orderkey
        )
    """,
    "mismatch_detect": f"""
        SELECT o.o_orderkey
        FROM orders o JOIN ({_TARGET_SQL}) t USING (o_orderkey)
        WHERE o.o_custkey IS DISTINCT FROM t.o_custkey
           OR o.o_orderstatus IS DISTINCT FROM t.o_orderstatus
           OR o.o_totalprice IS DISTINCT FROM t.o_totalprice
           OR o.o_orderdate IS DISTINCT FROM t.o_orderdate
           OR o.o_orderpriority IS DISTINCT FROM t.o_orderpriority
    """,
    "reconcile_rows": f"""
        WITH target AS ({_TARGET_SQL}),
        missing AS (
            SELECT o.* FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = o.o_orderkey)
        ),
        mismatched AS (
            SELECT o.* FROM orders o JOIN target t USING (o_orderkey)
            WHERE o.o_custkey IS DISTINCT FROM t.o_custkey
               OR o.o_orderstatus IS DISTINCT FROM t.o_orderstatus
               OR o.o_totalprice IS DISTINCT FROM t.o_totalprice
               OR o.o_orderdate IS DISTINCT FROM t.o_orderdate
               OR o.o_orderpriority IS DISTINCT FROM t.o_orderpriority
        )
        SELECT * FROM missing UNION ALL SELECT * FROM mismatched
    """,
    "bucket_count_compare": f"""
        WITH target AS ({_TARGET_SQL}),
        o AS (SELECT o_orderkey % 32 AS bucket, COUNT(*) AS origin_cnt
              FROM orders GROUP BY 1),
        t AS (SELECT o_orderkey % 32 AS bucket, COUNT(*) AS target_cnt
              FROM target GROUP BY 1)
        SELECT COALESCE(o.bucket, t.bucket) AS bucket,
               COALESCE(origin_cnt, 0) AS origin_cnt,
               COALESCE(target_cnt, 0) AS target_cnt
        FROM o FULL OUTER JOIN t ON o.bucket = t.bucket
        WHERE COALESCE(origin_cnt, 0) <> COALESCE(target_cnt, 0)
    """,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
