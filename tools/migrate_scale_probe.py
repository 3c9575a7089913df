"""Migrate-throughput scale probe: does the S10 pipeline's rows/s
hold when the table grows 10x?

BASELINE.md's comparable numbers are CDM's 50K rows/s read / 45K
write and DSBulk's ~5 min per 100K rows; bench.py measures
`migrate_bulk` at sf0.1 (600K rows).  This probe runs the SAME
end-to-end migrate (read -> feature pipeline -> observed write, no
tracking) at 1x and 10x rows (~6M — the sf1 tier) and reports
rows/s for both.  Linear-ish wall growth and flat-or-better rows/s
is the pass condition: the pipeline is scan+map+write with zero
shuffles (plan inventory: migrate_* exchanges=0), so throughput
should track I/O, not row count.

Output: one JSON line {"migrate_probe": {...}} merged into
SCALE_PROBE_r05.json.  Usage: python tools/migrate_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_data_migration_spark.plans.migrate import (  # noqa: E402
    MigrationConfig,
    migrate,
)
from cassandra_data_migration_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="cdm-migrate-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="migrate_probe_")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n1 = li.count()
    # 10x tier: fresh key space per copy (same construction as the
    # dedup probe's corpus builder)
    copies = spark.range(10).select(F.col("id").alias("_copy"))
    (
        li.crossJoin(F.broadcast(copies))
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("_copy") * (n1 * 10)
        )
        .drop("_copy")
        .write.mode("overwrite")
        .parquet(f"{work}/x10_src")
    )

    results = {}
    for tier, src in (("1x", f"{SF_DIR}/lineitem.parquet"), ("x10", f"{work}/x10_src")):
        tgt = f"{work}/tgt_{tier}"
        cfg = MigrationConfig(origin_path=src, target_path=tgt)
        t0 = time.perf_counter()
        res = migrate(spark, cfg)
        wall = time.perf_counter() - t0
        results[tier] = {
            "rows": res.rows_written,
            "wall_s": round(wall, 2),
            "rows_per_s": int(res.rows_written / wall),
        }
        print(
            f"{tier}: {res.rows_written} rows in {wall:.2f}s "
            f"= {int(res.rows_written / wall):,} rows/s",
            flush=True,
        )

    r1, r10 = results["1x"], results["x10"]
    print(
        f"wall ratio (10x/1x): {r10['wall_s'] / r1['wall_s']:.2f} "
        f"(linear = 10.0); throughput ratio: "
        f"{r10['rows_per_s'] / r1['rows_per_s']:.2f}"
    )
    print(json.dumps({"migrate_probe": results}))


if __name__ == "__main__":
    main()
