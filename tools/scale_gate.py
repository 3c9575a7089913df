"""sf0.1 -> sf1 scale gate (VERDICT r7 "Next round" #1).

Builds a 10x corpus from the sf0.1 fixtures (key-shifted replication:
copy 0 is the original rows, copies 1-9 shift every key column by
copy * 1e9 and vary document text with a per-copy token so dedup
multiplicity stays realistic instead of exploding pair counts), then
runs the most expensive contract queries at BOTH scales in one JVM,
recording per-query wall seconds and shuffle-read bytes (completed-
stage deltas from the status API).

The headline number per query is the SCALING EXPONENT
``log10(t_sf1 / t_sf01)`` — 1.0 is perfectly linear in the 10x data,
<= ~1.2 passes the gate (constant factors + AQE noise), anything
materially super-linear is a round fix.  Shuffle bytes get the same
exponent so a wall regression can be attributed to data volume vs
plan shape.

Usage: python tools/scale_gate.py [--skip-build] [--only a,b]
Writes SCALE_PROBE_r08.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassandra_data_migration_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
WORK = "/tmp/sf1_gate"
STRIDE = 1_000_000_000
COPIES = 10

# key columns shifted per copy (FK consistency: orders.o_custkey moves
# with customer.c_custkey, lineitem.l_orderkey with orders.o_orderkey)
SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation", "supplier", "part"]

# the ~25 most expensive contract queries by BENCH_FULL (excluding
# connector_write_audit — a fixed-cost seam audit, not a data path)
TARGETS = [
    "repair_pipeline_pruned", "dup_clusters", "classifier_auc",
    "dedup_survivors", "stream_cow_upsert", "prefix_filter_pairs",
    "lsh_index_incremental", "mmr_diverse_select",
    "lab_migration_report", "winnow_fingerprints",
    "dedup_ngram_jaccard", "minhash_lsh_dedup", "repair_pipeline",
    "bucketed_join", "local_quorum_repair", "stream_cms",
    "replica_ownership_nts", "stream_mv_refresh", "stream_cell_lww",
    "snapshot_changes_feed", "stream_attribution", "cow_merge_upsert",
    "kmv_set_ops", "stream_irate", "histogram_quantile_rated",
    # round-8 additions: artifact probes and the liveness family —
    # probes should stay near-flat (pruned partitions / O(state))
    "ivf_index_probe", "ivf_index_append", "bpe_vocab_persisted",
    "alert_node_down", "stream_node_down",
]


def build_sf1(spark) -> None:
    copies = spark.range(COPIES).select(F.col("id").alias("_copy"))
    for t, keys in SHIFTS.items():
        df = spark.read.parquet(f"{SF01}/{t}.parquet")
        out = df.crossJoin(F.broadcast(copies))
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("_copy") * STRIDE)
        if t == "documents":
            # vary the text per copy so exact-duplicate groups stay the
            # fixture's natural size — a 10x-duplicated corpus measures
            # multiplicity collapse (tools/scale_probe.py does that),
            # this gate measures VOLUME scaling
            out = out.withColumn(
                "text",
                F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.col("text"),
                        F.lit(" c"),
                        F.col("_copy").cast("string"),
                    )
                ),
            )
        out.drop("_copy").write.mode("overwrite").parquet(
            f"{WORK}/{t}.parquet"
        )
    for t in VERBATIM:
        spark.read.parquet(f"{SF01}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{WORK}/{t}.parquet")


def _stages(spark) -> list:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete",
        timeout=10,
    ) as r:
        return json.loads(r.read())


def total_shuffle(spark) -> int:
    try:
        return sum(s.get("shuffleReadBytes", 0) for s in _stages(spark))
    except Exception:
        return -1


def peak_memory_since(spark, seen_stage_ids: set) -> tuple[int, set]:
    """Max per-stage peakExecutionMemory over stages completed since
    ``seen_stage_ids`` — the task-memory high-water mark a query's
    sorts/aggregations/joins reached (spill pressure proxy), plus the
    updated seen set."""
    try:
        stages = _stages(spark)
    except Exception:
        return -1, seen_stage_ids
    ids = {(s["stageId"], s["attemptId"]) for s in stages}
    peak = max(
        (
            s.get("peakExecutionMemory", 0)
            for s in stages
            if (s["stageId"], s["attemptId"]) not in seen_stage_ids
        ),
        default=0,
    )
    return peak, ids


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    spark = get_spark(
        app_name="cdm-scale-gate",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_build:
        t0 = time.perf_counter()
        build_sf1(spark)
        print(f"built {WORK} in {time.perf_counter() - t0:.1f}s")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    targets = [t for t in TARGETS if t in qs]
    if args.only:
        keep = set(args.only.split(","))
        targets = [t for t in targets if t in keep]

    results: dict[str, dict] = {t: {} for t in targets}
    for sf_name, sf_dir in (("sf01", SF01), ("sf1", WORK)):
        # warm JVM/footers; pre-warm the repair lake layout so the
        # pruned repair reports steady-state cost at both scales
        qs["pricing_summary"](spark, sf_dir).count()
        try:
            entry_mod._repair_lake_layout(spark, sf_dir)
        except Exception:
            pass
        seen: set = set()
        _, seen = peak_memory_since(spark, seen)
        for t in targets:
            sh0 = total_shuffle(spark)
            t0 = time.perf_counter()
            try:
                n = qs[t](spark, sf_dir).count()
                wall = round(time.perf_counter() - t0, 3)
                err = None
            except Exception as e:  # keep probing the rest
                wall, n, err = round(time.perf_counter() - t0, 3), -1, repr(e)[:200]
            peak, seen = peak_memory_since(spark, seen)
            results[t][sf_name] = {
                "wall_s": wall,
                "rows": n,
                "shuffle_bytes": max(0, total_shuffle(spark) - sh0),
                "peak_task_memory_bytes": peak,
                **({"err": err} if err else {}),
            }
            print(f"{sf_name:5s} {t:28s} {wall:8.2f}s rows={n}")

    for t in targets:
        a, b = results[t].get("sf01"), results[t].get("sf1")
        if a and b and a["wall_s"] > 0 and not a.get("err") and not b.get("err"):
            results[t]["wall_exponent"] = round(
                math.log10(max(b["wall_s"] / a["wall_s"], 1e-9)), 3
            )
            if a["shuffle_bytes"] > 0 and b["shuffle_bytes"] > 0:
                results[t]["shuffle_exponent"] = round(
                    math.log10(b["shuffle_bytes"] / a["shuffle_bytes"]), 3
                )
            pa = a.get("peak_task_memory_bytes", 0)
            pb = b.get("peak_task_memory_bytes", 0)
            if pa > 0 and pb > 0:
                results[t]["peak_memory_exponent"] = round(
                    math.log10(pb / pa), 3
                )

    out = {
        "scale_gate": {
            "sf01_dir": SF01,
            "sf1_dir": WORK,
            "copies": COPIES,
            "queries": results,
        }
    }
    with open("SCALE_PROBE_r08.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        "\n| query | sf0.1 s | sf1 s | wall exp | shuffle exp |"
        " peak-mem exp |"
    )
    print("|---|---|---|---|---|---|")
    for t in targets:
        r = results[t]
        a, b = r.get("sf01", {}), r.get("sf1", {})
        print(
            f"| {t} | {a.get('wall_s', '-')} | {b.get('wall_s', '-')} |"
            f" {r.get('wall_exponent', '-')} |"
            f" {r.get('shuffle_exponent', '-')} |"
            f" {r.get('peak_memory_exponent', '-')} |"
        )


if __name__ == "__main__":
    main()
