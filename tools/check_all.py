"""Driver-simulating correctness gate: run every queries() entry at
sf0.01 against its oracle_sql() in DuckDB, compare rows+schema+values
(order-insensitive, columns sorted by name), print one verdict line per
query and a summary. Mirrors the driver's CORRECTNESS check so
regressions surface before the round snapshot.

Usage: python tools/check_all.py [--only name1,name2] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cassandra_data_migration_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def frame_sig(df):
    import numpy as np

    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(norm(np.asarray(v).tolist() if hasattr(v, "tolist") else v) for v in row))
    rows.sort()
    return cols, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--timeout", type=float, default=180.0)
    ap.add_argument(
        "--out",
        default="/tmp/check_all.json",
        help="artifact path; pass CORRECTNESS_full_r{N}.json at round end "
        "so every round commits the FULL contract verdict, not the "
        "driver's 50-query sample",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="cdm-spark-checkall")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    os.environ["CDM_ORACLE_SF_DIR"] = args.sf
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    results = {}
    t_start = time.perf_counter()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        sc.setJobGroup(name, name, interruptOnCancel=True)
        watchdog = threading.Timer(args.timeout, lambda g=name: sc.cancelJobGroup(g))
        watchdog.daemon = True
        watchdog.start()
        verdict = "pass"
        detail = ""
        try:
            sdf = fn(spark, args.sf).toPandas()
            scols, srows = frame_sig(sdf)
            if name in oracles:
                ddf = con.execute(oracles[name]).fetchdf()
                dcols, drows = frame_sig(ddf)
                if scols != dcols:
                    verdict, detail = "FAIL", f"schema {scols} vs {dcols}"
                elif len(srows) != len(drows):
                    verdict, detail = "FAIL", f"rows {len(srows)} vs {len(drows)}"
                elif srows != drows:
                    bad = next(
                        i for i, (a, b) in enumerate(zip(srows, drows)) if a != b
                    )
                    verdict = "FAIL"
                    detail = (
                        f"values differ at sorted-row {bad}: "
                        f"spark={srows[bad]} duck={drows[bad]}"[:400]
                    )
                else:
                    # The driver hashes raw value reprs, so an int column on
                    # one side vs float64 on the other (DuckDB HUGEINT ->
                    # pandas float) hash-mismatches even when norm() agrees.
                    # Flag dtype-kind divergence as a failure here too.
                    bad_kinds = [
                        c
                        for c in scols
                        if {sdf[c].dtype.kind, ddf[c].dtype.kind} == {"i", "f"}
                        and not ddf[c].isna().any()
                        and not sdf[c].isna().any()
                    ]
                    if bad_kinds:
                        verdict = "DTYPE"
                        detail = "int-vs-float dtype on " + ",".join(
                            f"{c}({sdf[c].dtype.kind}/{ddf[c].dtype.kind})"
                            for c in bad_kinds
                        )
            else:
                verdict = "rows-only"
                detail = f"{len(srows)} rows"
        except Exception as exc:  # noqa: BLE001
            verdict, detail = "ERR", f"{type(exc).__name__}: {exc}"[:300]
        finally:
            watchdog.cancel()
            sc.setJobGroup("", "")
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"verdict": verdict, "sec": dt, "detail": detail}
        flag = "" if verdict == "pass" else f"  << {verdict} {detail}"
        print(f"{name:40s} {verdict:9s} {dt:7.2f}s{flag}", flush=True)

    total = round(time.perf_counter() - t_start, 1)
    fails = {
        k: v for k, v in results.items() if v["verdict"] in ("FAIL", "ERR", "DTYPE")
    }
    print(f"\n== {len(results)} queries, {len(fails)} failing, {total}s total ==")
    for k, v in fails.items():
        print(f"  {k}: {v['verdict']} {v['detail']}")
    artifact = {
        "queries": len(results),
        "failing": len(fails),
        "total_sec": total,
        "sf_dir": args.sf,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
