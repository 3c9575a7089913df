"""Round-10 families: pair-producing binned range join kept under its
own oracle (the in-transit COUNT query moved to the linear
interval-stabbing sweep), and the LSH-tier auto-route contract.

Part chain continues from part13 (star-import preserves the shared
namespace/evaluation order of the former monolith).
"""
from __future__ import annotations

from cdm_entry.part13_round9 import *  # noqa: F401,F403


def q_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the PAIR-producing overlapping-interval range join (bin
    # bucketing restores a hash join for a keyless range predicate;
    # bin width auto-derived from the interval-span median).  One
    # target day keeps the pair OUTPUT bounded — the operator's growth
    # is the qualifying pairs themselves, which is why the in-transit
    # COUNT query uses the stabbing sweep instead.  Oracle: the plain
    # quadratic BETWEEN join, proving the binning + auto width are
    # lossless pair for pair.
    from cassandra_data_migration_spark.operators.joins import (
        binned_range_join,
    )

    epoch = F.lit("1970-01-01")
    pts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").cast("date") == "1995-03-15")
        .select(
            "o_orderkey",
            F.datediff("o_orderdate", epoch).alias("p_day"),
        )
    )
    lo = F.datediff("l_shipdate", epoch)
    iv = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("iv_orderkey"),
        lo.alias("lo_day"),
        (lo + (F.col("l_quantity").cast("int") % 14 + 2)).alias("hi_day"),
    )
    return binned_range_join(
        pts, iv, "p_day", "lo_day", "hi_day", bin_width=None
    ).select("o_orderkey", "iv_orderkey", "lo_day", "hi_day")


ORACLES["range_join_pairs"] = """
    WITH pts AS (
        SELECT o_orderkey,
               date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS p_day
        FROM orders
        WHERE CAST(o_orderdate AS DATE) = DATE '1995-03-15'
    ), iv AS (
        SELECT l_orderkey AS iv_orderkey,
               date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE)) AS lo_day,
               date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE))
                 + (CAST(l_quantity AS INTEGER) % 14 + 2) AS hi_day
        FROM lineitem
    )
    SELECT o_orderkey, iv_orderkey, lo_day, hi_day
    FROM pts JOIN iv ON p_day BETWEEN lo_day AND hi_day
"""


register_queries(globals())
__all__ = export_all(globals())
