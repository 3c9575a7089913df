"""Quick per-query timing loop for iterating on a named subset at a
given SF dir — the micro feedback loop between full bench runs.

Usage: python tools/time_queries.py name1,name2 [--sf DIR] [--reps N]
Prints per-query wall seconds (best of N) plus the bench calibration
workload so numbers are comparable across host-noise windows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from cassandra_data_migration_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries["pricing_summary"](spark, args.sf).count()  # warm

    t0 = time.perf_counter()
    for _ in range(3):
        queries["pricing_summary"](spark, args.sf).count()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    cal = time.perf_counter() - t0
    print(f"calibration {cal:.3f}s")

    for name in args.names.split(","):
        best = None
        rows = None
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t = time.perf_counter()
            rows = queries[name](spark, args.sf).count()
            dt = time.perf_counter() - t
            best = dt if best is None else min(best, dt)
        print(f"{name:40s} {best:8.3f}s  rows={rows}")
    spark.stop()


if __name__ == "__main__":
    main()
