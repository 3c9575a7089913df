"""Within-session repetition spread for named queries — the noise
attribution tool for cross-round deltas on UNCHANGED code paths.

A cross-round raw delta is only a regression if it exceeds what the
same code shows run-to-run in one session.  This runs each named
query R reps (clearCache between reps, same as bench.py), interleaved
round-robin so slow host drift hits every query equally, and prints
min/median/max plus the spread ratio max/min.  If a cross-round delta
sits inside the same-session spread, the delta is measurement noise,
not code cost.

Usage: python tools/rep_spread.py name1,name2 [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from cassandra_data_migration_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    names = args.names.split(",")
    spark = get_spark(app_name="rep-spread")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries["pricing_summary"](spark, args.sf).count()  # warm

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.reps):
        for n in names:  # interleaved: drift hits every query equally
            spark.catalog.clearCache()
            t = time.perf_counter()
            queries[n](spark, args.sf).count()
            samples[n].append(round(time.perf_counter() - t, 3))
    out = {}
    for n, xs in samples.items():
        out[n] = {
            "min": min(xs),
            "median": round(statistics.median(xs), 3),
            "max": max(xs),
            "spread": round(max(xs) / min(xs), 3),
            "samples": xs,
        }
        print(
            f"{n:32s} min={out[n]['min']:7.3f} med={out[n]['median']:7.3f}"
            f" max={out[n]['max']:7.3f} spread=x{out[n]['spread']:.2f}"
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
