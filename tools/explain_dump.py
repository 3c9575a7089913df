"""Dump `.explain("formatted")` for named queries to files — the
before/after plan artifacts for optimization rounds (plans/r{N}/).

Usage:
  python tools/explain_dump.py name1,name2 --outdir plans/r12 \
      [--suffix before] [--sf DIR]

Each query's plan goes to ``<outdir>/<name>_<suffix>.txt``.  Queries
whose builder executes jobs eagerly (streaming twins, migrate runs)
still dump the plan of the frame they return.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from cassandra_data_migration_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n]
    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building {name}: {type(exc).__name__}: {exc}"
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
