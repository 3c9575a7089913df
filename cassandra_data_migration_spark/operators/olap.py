"""Multi-join OLAP report queries (TPC-H Q3/Q5 shapes) over the
fixture schema — the join-ordering / broadcast-strategy workout that a
Cassandra-side engine cannot express at all (CQL has no joins;
SURVEY.md §2.3 — the reference bolts joins on via client-side Python
loops in validate_migration.py).

Plan shape at 100 TB
--------------------
- Dimension chains (region → nation → customer/supplier) resolve to
  BROADCAST joins: Catalyst sees their sizes and ships the dim maps to
  every task, so the only shuffles left are the fact-fact join
  (orders ⋈ lineitem on the order key) and the final aggregation.
- Filters sit against the scans (pushed into parquet row-group
  pruning) BEFORE any join — the fact tables arrive pre-filtered.
- Sums are DECIMAL (exact, order-independent) cast to double at the
  edge for the cross-engine compare; top-k is TakeOrdered, never a
  global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D182 = "decimal(18,2)"


def shipping_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1997-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by order, for one
    market segment — top-k orders by revenue.  One fact-fact shuffle
    (orders ⋈ lineitem), customer broadcast, TakeOrdered top-k."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
    li = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
    revenue = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    ).cast(_D182)
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(F.broadcast(cust), ords["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def region_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer AND supplier
    share the nation, customers restricted to one region.  The entire
    dimension chain (region → nation → customer, supplier) broadcasts;
    the plan's only exchanges are the fact-fact join and the final
    tiny aggregation."""
    nat = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == nat["n_nationkey"]
    ).select("c_custkey", F.col("n_nationkey").alias("c_nat"))
    supp = supplier.join(
        F.broadcast(nat), supplier["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", F.col("n_nationkey").alias("s_nat"), "n_name")
    revenue = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    ).cast(_D182)
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (lineitem["l_suppkey"] == supp["s_suppkey"])
            & (F.col("c_nat") == F.col("s_nat")),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )
