"""Physical-plan inventory over every contract query — the shuffle
ledger for "would this survive a 100x scale-up".

For each ``queries()`` entry, build the DataFrame at the given SF and
record from its (pre-execution, AQE-initial) physical plan:

- ``exchanges``: shuffle Exchange count (each is a full materialize +
  network pass at scale — the number to watch),
- ``broadcasts``: BroadcastExchange count (fine when the broadcast
  side is bounded; every broadcast here is a dim table, sketch, or
  driver-bounded set),
- ``bnlj``/``cartesian``: nested-loop / cartesian joins — red flags
  unless one side is a literal 1-row frame (the whitelisted scalar
  cross-joins),
- ``sorts``: SortExec count,
- ``wsc``: WholeStageCodegen span count (codegen coverage proxy).

Output: one JSON line ``{"plan_inventory": {...}}`` — committed as
``PLAN_INVENTORY_r{N}.json`` so the next round diffs exchange counts
instead of discovering a new shuffle in a bench regression.  Queries
that EXECUTE inside their builder (streaming twins, migrate runs,
file roundtrips) still report the plan of the frame they return —
usually a trivial staged-read; their runtime cost is bench.py's and
the probes' job, not this ledger's.

Usage: python tools/plan_inventory.py [--sf DIR] [--only a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from cassandra_data_migration_spark.session import get_spark  # noqa: E402

# scalar/1-row cross joins (broadcast of a literal or a driver-bounded
# aggregate) are legitimate BNLJ sites; everything else must justify
# itself here or be fixed.
BNLJ_ALLOWED = {
    "zipf_head_coverage",  # 1-row total joined to the rank table
    "dsir_select",  # scalar importance-normalizer broadcast
    "token_budget_select",  # scalar budget row
    "percentile_normalize",  # per-corpus scalar quantiles
    "robust_scale",  # per-corpus scalar median/IQR
    "winsorized_stats",  # scalar clip bounds
    "temperature_mixture",  # per-source weight row set (|sources|)
    "mixture_sample",  # same
    "corpus_sample",  # scalar corpus size
    "benford_profile",  # scalar row count
    "quantized_topk",  # scalar quantization range row
    "cosine_topk",  # 1-row query vector
    "hybrid_rrf",  # two 1-row query frames
    "semantic_decontaminate",  # benchmark matrix broadcast (bounded)
    "semantic_dedup",  # same
    "rp_projection",  # projection matrix broadcast (dim x k)
    "knn_join",  # bounded query-side broadcast
    "hard_negatives",  # same
    "negative_pairs",  # same
    "gram_matrix",  # block-matmul scalar dims
    "embedding_near_dup",  # guarded brute tier (max_broadcast_rows)
    "ann_lsh_pairs",  # bounded probe set
    "mmr_diverse_select",  # <=k-row broadcast per greedy round
    "label_centroids",  # k centroid rows
    "kmeans_clusters",  # k centroid rows
    "ivf_topk",  # centroid table broadcast (k rows)
    "ivf_pq_topk",  # same + codebook
    "pq_adc_topk",  # codebook broadcast
    "pq_codes",  # codebook broadcast
    "vocab_oov",  # bounded vocab broadcast
    "dp_group_counts",  # scalar epsilon/sensitivity row
    "stable_dense_ids",  # per-partition offset row set (O(parts))
    "sample_validate",  # scalar sample-rate row
    "id_gap_islands",  # scalar bounds row
    "ab_test_readout",  # scalar variance rows per arm
    "lsh_index_incremental",  # scalar corpus-half boundary row
    "bigram_logprob",  # scalar corpus token total
    "bloom_membership",  # bit-set membership vs scalar bit rows
    "bm25_topk",  # scalar avgdl/N row
    "dq_report",  # scalar table row-count row
    "join_cardinality_audit",  # scalar NDV rows per side
    "key_skew_report",  # scalar total-rows row
    "kmv_set_ops",  # scalar union-sketch-size row
    "lab_migration_report",  # scalar per-table count rows
    "perplexity_buckets",  # scalar corpus logprob total
    "pmi_collocations",  # scalar corpus token/pair totals
    "replica_ownership",  # token-ring bounds rows (O(vnodes))
    "ring_ownership",  # same
    "tfidf_keywords",  # scalar doc-count N row
    "top_value_parts",  # scalar global-total row
    "unigram_logprob",  # scalar corpus token total
    "doremi_weights",  # the two LM scalar totals + 1-row weight denom
    "repair_pipeline",  # pre x post report: two 1-row aggregate frames
    "repair_pipeline_pruned",  # same report shape over the pruned legs
    "replica_ownership_nts",  # per-DC ring bounds rows (O(nodes*rf))
    "histogram_percentiles",  # 3 quantile rows x O(buckets) frame
    "histogram_quantile_rated",  # same interpolation, same 3-row side
    "classifier_pr_curve",  # O(thresholds) literal row set broadcast
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    spark = get_spark(app_name="cdm-plan-inventory")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    inv: dict[str, dict] = {}
    flagged: list[str] = []
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, args.sf)
            # simple-mode tree of the AQE-initial physical plan; no
            # execution is triggered
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            inv[name] = {"error": str(e).splitlines()[0][:200]}
            flagged.append(f"{name}: ERROR building plan")
            continue
        rec = {
            # shuffle exchanges only — BroadcastExchange is its own
            # node name, so the negative lookbehind excludes it
            "exchanges": len(re.findall(r"(?<!Broadcast)Exchange ", plan)),
            "broadcasts": len(re.findall(r"\bBroadcastExchange\b", plan)),
            "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
            "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
            "sorts": len(re.findall(r"\bSort \[", plan)),
            # codegen spans = distinct *(id) stage markers
            "wsc": len(set(re.findall(r"\*\((\d+)\)", plan))),
            "build_s": round(time.perf_counter() - t0, 2),
        }
        inv[name] = rec
        if rec["cartesian"]:
            flagged.append(f"{name}: CartesianProduct in plan")
        if rec["bnlj"] and name not in BNLJ_ALLOWED:
            flagged.append(f"{name}: unexplained BroadcastNestedLoopJoin")
        print(
            f"{name:32s} exch={rec['exchanges']:<3d} bcast={rec['broadcasts']:<3d}"
            f" bnlj={rec['bnlj']} cart={rec['cartesian']} wsc={rec['wsc']}",
            flush=True,
        )

    print()
    if flagged:
        print("FLAGGED:")
        for f in flagged:
            print(" -", f)
    else:
        print("FLAGGED: none")
    print(json.dumps({"plan_inventory": inv, "flagged": flagged}))


if __name__ == "__main__":
    main()
