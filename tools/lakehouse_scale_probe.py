"""Lakehouse COW-merge scale probe: merge cost must track the UPDATE
footprint, not table size — which at fixture scale means the right
measurement is the GROWTH SHAPE, not an absolute win (at 600K rows a
full rewrite costs ~1 s, so COW's fixed costs — footer-scan job,
touch-test join, write commit — cannot beat it; they exist to beat
the 100 TB rewrite).

Tables: lineitem at sf0.1 keyed by a synthetic unique long,
range-partitioned into 64 sorted files, at 1x (600K rows) and 4x
(2.4M).  Per table size:

- ``point``: 200 consecutive keys (one file's range) — wall must stay
  ~FLAT as the table grows (1 of 64 files rewritten either way),
- ``spread``: 200 keys uniform across the space — worst-case COW
  (every file touched), the shape that says "batch updates or
  re-cluster"; grows with the table like a rewrite,
- ``full_rewrite``: the naive alternative — grows ~linearly.

Pass condition: point wall ratio (4x/1x) << full-rewrite ratio, and
files_rewritten matches the range math.  Prints one JSON line merged
into SCALE_PROBE_r05.json.

Usage: python tools/lakehouse_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_data_migration_spark.session import get_spark  # noqa: E402
from cassandra_data_migration_spark.sources.lakehouse import (  # noqa: E402
    cow_merge,
)

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="cdm-lakehouse-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="lh_probe_")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    from pyspark.sql import Window

    base1 = li.withColumn(
        "rid",
        F.row_number()
        .over(
            Window.orderBy(
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
            )
        )
        .cast("long"),
    )
    n1 = base1.count()
    copies = spark.range(4).select(F.col("id").alias("_c"))
    base4 = (
        base1.crossJoin(F.broadcast(copies))
        .withColumn("rid", F.col("rid") + F.col("_c") * (n1 + 1))
        .drop("_c")
    )

    # warm the session so tier-1 numbers aren't JIT/fixture-cold
    base1.repartitionByRange(4, "rid").write.mode("overwrite").parquet(
        f"{work}/warm"
    )

    results: dict[str, dict] = {}
    for tag, b, n in (("1x", base1, n1), ("4x", base4, 4 * n1)):
        bt = f"{work}/tbl_{tag}"
        b.repartitionByRange(64, "rid").sortWithinPartitions(
            "rid"
        ).write.parquet(bt)
        tier: dict[str, dict] = {}

        upd = b.filter(
            (F.col("rid") >= 1000) & (F.col("rid") < 1200)
        ).withColumn("l_quantity", F.lit(0.0))
        t0 = time.perf_counter()
        st = cow_merge(spark, bt, upd, "rid")
        tier["point"] = {
            "wall_s": round(time.perf_counter() - t0, 2),
            "files_rewritten": st.files_rewritten,
            "files_total": st.files_total,
            "rows_written": st.rows_written,
        }

        upd = b.filter(F.pmod("rid", F.lit(n // 200)) == 0).withColumn(
            "l_quantity", F.lit(0.0)
        )
        t0 = time.perf_counter()
        st = cow_merge(spark, bt, upd, "rid")
        tier["spread"] = {
            "wall_s": round(time.perf_counter() - t0, 2),
            "files_rewritten": st.files_rewritten,
            "files_total": st.files_total,
            "rows_written": st.rows_written,
        }

        t0 = time.perf_counter()
        spark.read.parquet(bt).withColumn(
            "l_quantity", F.lit(0.0)
        ).write.mode("overwrite").parquet(f"{work}/full_out_{tag}")
        tier["full_rewrite"] = {
            "wall_s": round(time.perf_counter() - t0, 2),
            "files_rewritten": 64,
            "files_total": 64,
        }
        results[tag] = tier
        for k, v in tier.items():
            print(
                f"{tag} {k:14s} {v['wall_s']:6.2f}s  "
                f"{v['files_rewritten']}/{v['files_total']} files",
                flush=True,
            )

    pr = results["4x"]["point"]["wall_s"] / results["1x"]["point"]["wall_s"]
    fr = (
        results["4x"]["full_rewrite"]["wall_s"]
        / results["1x"]["full_rewrite"]["wall_s"]
    )
    print(f"4x/1x wall ratio: point={pr:.2f} vs full_rewrite={fr:.2f}")
    print(json.dumps({"lakehouse_probe": results}))


if __name__ == "__main__":
    main()
