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


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 30,
    date_from: str = "1995-01-01",
    date_to: str = "1995-04-01",
) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders in a date window
    that had at least one LATE lineitem (shipped more than
    ``late_days`` after the order date).  Exercises the EXISTS /
    left-semi join with a mixed equi + theta condition.

    Plan (round 12): the raw EXISTS planned as a broadcast-left-semi
    whose BUILD side was the full (l_orderkey, l_shipdate) projection
    — the per-task hashed relation grew linearly with lineitem volume
    (SCALE_PROBE_r11: task-peak exponent 1.061, 403 MB at sf1 — the
    suite's last volume-proportional profile).  But the theta is
    monotone in l_shipdate, so EXISTS(l_shipdate > T) ⟺
    max(l_shipdate) > T per order key: pre-aggregate lineitem to one
    (l_orderkey, max shipdate) row — a spillable, map-side-combined
    HashAggregate — and inner-join that O(orders)-sized table instead
    (unique key ⇒ at most one match ⇒ still no fan-out).  AQE picks
    the join strategy from the aggregate's ACTUAL size (broadcast at
    bench scale, shuffle join at 100 TB) and every stage is now
    bounded per task (guide §2.3, §3.1, §5.1).  The date filter
    still pushes into the orders scan; lineitem is still never read
    wider than (l_orderkey, l_shipdate).  NULL semantics: max()
    ignores NULL shipdates and a NULL result fails the `>` predicate,
    exactly as the semi-join theta did."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    )
    # Per-task state bounded BY DESIGN (round 12, VERDICT r11 ask #1):
    # the bare groupBy's scan-side partial agg held total/cores
    # distinct orderkeys below the maxPartitionBytes split ceiling
    # (measured 151→285→554 MB linear at 10/20/40×) and its reduce
    # side was a STATIC shuffle-partition count — linear at any scale.
    # Project to the two needed columns, then repartition by orderkey
    # to a stats-scaled count (~64 MB of scan-width input per task,
    # plan-time estimate, no job): scan stage = project+shuffle-write,
    # agg task state ≤ one bounded partition's keys, no second
    # exchange (key partitioning satisfies the grouping).  Trade: raw
    # (orderkey, shipdate) rows cross instead of map-combined maxes —
    # 12 B/row — for a flat per-task ceiling (the salted/bucketed-join
    # plateau doctrine).
    from cassandra_data_migration_spark.sources.tables import (
        scaled_shuffle_partitions,
    )

    li = lineitem.select("l_orderkey", "l_shipdate")
    li_max = (
        li.repartition(scaled_shuffle_partitions(li), "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_max_ship"))
    )
    return (
        o.join(li_max, F.col("o_orderkey") == F.col("l_orderkey"), "inner")
        .filter(
            F.col("_max_ship") > F.date_add(F.col("o_orderdate"), late_days)
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def top_value_parts(
    lineitem: DataFrame, fraction: float = 0.001
) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds ``fraction`` of
    TOTAL revenue — a grouped aggregate filtered against a global
    scalar subquery.

    Plan: one map-combined groupBy for per-part revenue, PERSISTED —
    the frame feeds both the filter and the global total (a diamond
    dependency Spark would otherwise recompute, i.e. a second fact
    scan at 100 TB); the O(parts) persisted rows re-aggregate to the
    1-row total that broadcasts into the cross join.  DECIMAL sums
    keep both aggregations order-independent."""
    from pyspark.storagelevel import StorageLevel

    rev = F.sum(
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).cast("decimal(28,4)")
    )
    per_part = lineitem.groupBy("l_partkey").agg(rev.alias("revenue")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    total = per_part.agg(
        F.sum("revenue").cast("decimal(38,4)").alias("_total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("revenue")
            > F.col("_total") * F.lit(fraction).cast("decimal(10,6)")
        )
        .select("l_partkey", F.col("revenue").cast("decimal(28,4)").alias("revenue"))
    )


def above_average_parts(
    lineitem: DataFrame, num: int = 3, den: int = 2
) -> DataFrame:
    """Scale-invariant Q11 variant: parts whose revenue exceeds
    ``num/den`` times the AVERAGE per-part revenue.  Unlike a fixed
    share-of-total threshold (which every part falls under once the
    part count grows), the average-relative cut selects a stable tail
    fraction at any scale factor — non-degenerate at sf0.01 and sf1000
    alike.

    Revenue is integer-exact: price and discount are money columns
    with two decimals, so ``round(price*100) * (100 - round(disc*100))``
    is a lossless BIGINT in 1e-4 currency units, and the filter
    ``rev * n_parts * den > total * num`` is pure integer arithmetic —
    bit-identical across engines, no decimal-rounding divergence.

    Plan: one map-combined groupBy persisted (the diamond: it feeds
    both the filter and the global 1-row total that broadcasts back),
    so the fact table is scanned exactly once at 100 TB."""
    from pyspark.storagelevel import StorageLevel

    rev_e4 = F.sum(
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    per_part = (
        lineitem.groupBy("l_partkey")
        .agg(rev_e4.alias("revenue_e4"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = per_part.agg(
        F.sum("revenue_e4").alias("_total"),
        F.count(F.lit(1)).alias("_n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("revenue_e4") * F.col("_n_parts") * F.lit(den)
            > F.col("_total") * F.lit(num)
        )
        .select("l_partkey", "revenue_e4")
    )


def large_volume_orders(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    min_quantity: float = 150.0,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``min_quantity``, with customer attribution — the IN-subquery +
    grouped HAVING pattern.

    Plan: the HAVING filter runs on the grouped aggregate BEFORE any
    join, so only qualifying order keys (a tiny set) reach the joins;
    both the orders probe and the customer lookup then broadcast that
    set — the big table is scanned once, everything after is
    broadcast-sized."""
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty")
        )
        .filter(F.col("total_qty") > F.lit(min_quantity).cast("decimal(18,2)"))
    )
    return (
        orders.join(
            F.broadcast(qty),
            orders["o_orderkey"] == qty["l_orderkey"],
        )
        .join(customer, F.col("o_custkey") == customer["c_custkey"])
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


def priority_line_counts(
    lineitem: DataFrame,
    orders: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape: per return-flag, how many lines belong to
    high- vs low-priority orders — the conditional-aggregation (CASE
    inside SUM) pattern, one fact-fact join.

    Plan: the date filter pushes into the lineitem scan; orders joins
    on the order key carrying only (key, priority); both CASE sums
    map-combine, so the post-join shuffle is one row per flag."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from))
        & (F.col("l_shipdate") < F.lit(date_to))
    ).select("l_orderkey", "l_returnflag")
    o = orders.select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q14 shape: the share of revenue from PROMO-type parts in
    a window — a conditional numerator over a common denominator in
    ONE aggregation (no second scan, no subquery).

    Plan: part broadcasts (dimension), the date filter pushes into
    the fact scan, DECIMAL sums make numerator and denominator exact,
    and the ratio is computed on the single output row."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from))
        & (F.col("l_shipdate") < F.lit(date_to))
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(28,4)"))).alias("_promo"),
        F.sum(rev).alias("_total"),
    )
    return agg.select(
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        F.round(
            F.lit(100.0) * (F.col("_promo").cast("double") / F.col("_total").cast("double")),
            4,
        ).alias("promo_pct"),
    )


def disjunctive_predicate_revenue(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    both tables' columns (brand × size × quantity bands) — the
    optimizer workout where per-branch constraints must still push
    partial filters to both scans.

    Plan: the parts of the predicate that touch only one side
    (brand/size sets; the overall quantity envelope) are applied
    BEFORE the join so both scans pre-filter; the cross-table
    conjunctions evaluate on join output.  Part broadcasts."""
    p = part.select("p_partkey", "p_brand", "p_size").filter(
        (F.col("p_brand").isin("Brand#1", "Brand#2") & (F.col("p_size") <= 20))
        | (F.col("p_brand").isin("Brand#3", "Brand#4") & (F.col("p_size") <= 30))
    )
    li = lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).filter(F.col("l_quantity").between(1, 30))
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    branch1 = (
        F.col("p_brand").isin("Brand#1", "Brand#2")
        & (F.col("p_size") <= 20)
        & F.col("l_quantity").between(1, 15)
    )
    branch2 = (
        F.col("p_brand").isin("Brand#3", "Brand#4")
        & (F.col("p_size") <= 30)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(branch1 | branch2)
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer
    INCLUDING zero-order customers — the left-outer-join + two-level
    aggregation pattern (join, count per key, then histogram of the
    counts) that no equi/semi/anti query covers.

    Plan: orders pre-aggregate to (custkey, n) BEFORE the join — the
    join input shrinks from |orders| to |customers-with-orders| and
    the left join attaches one long per customer; the second groupBy
    is over at most |distinct order counts| keys (map-combined,
    O(100) rows out).  At 100 TB both sides shuffle once on custkey;
    AQE handles the skewed zero-heavy tail of the histogram."""
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    counts = (
        customer.select("c_custkey")
        .join(per_cust, "c_custkey", "left")
        .select(F.coalesce("_n", F.lit(0)).cast("long").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )
