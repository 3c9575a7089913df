"""Measured recall of the routed (approximate-LSH) tier of
``all_pairs_cosine`` at a fixture where routing actually engages
(VERDICT r10 #6).

The shipped oracle/bench fixtures (≤2,000 vectors) all sit on the
exact tier, so the >8,192-row auto-route was correct-by-contract but
never recall-MEASURED at a routing fixture.  This tool runs both
tiers on the replicated scale fixtures' embeddings table — 20-copy =
40k vectors, well past the boundary — and records:

- exact ground truth: ``route_above_rows=None`` (brute-force BLAS
  tier; raises rather than degrade),
- routed output: default auto-route (identical call shape to the
  ``embedding_near_dup`` contract query),
- pair recall = |routed ∩ exact| / |exact|, plus precision (expected
  1.0: the routed tier EXACT-verifies every candidate).

Usage: python tools/recall_gate.py [--fixture DIR] [--threshold T]
       [--floor R] [--out RECALL_r11.json]
Exits non-zero if measured recall < floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_data_migration_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="/tmp/sf20x_gate")
    ap.add_argument("--threshold", type=float, default=0.45)
    ap.add_argument(
        "--floor",
        type=float,
        default=0.8,
        help="minimum acceptable pair recall for the routed tier at "
        "the contract threshold (documented floor; the verify stage "
        "makes precision exactly 1.0, so recall is the only loss)",
    )
    ap.add_argument("--out", default="RECALL_r11.json")
    args = ap.parse_args()

    from cassandra_data_migration_spark.operators.similarity import (
        all_pairs_cosine,
    )

    spark = get_spark(app_name="recall-gate")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{args.fixture}/embeddings.parquet")
    n_rows = emb.count()

    t0 = time.perf_counter()
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in all_pairs_cosine(
            emb, threshold=args.threshold, route_above_rows=None
        ).collect()
    }
    exact_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the routing warning — expected
        routed_df = all_pairs_cosine(emb, threshold=args.threshold)
    routed = {
        (r.id_a, r.id_b): r.cos_sim for r in routed_df.collect()
    }
    routed_s = round(time.perf_counter() - t0, 2)

    # single-bucket (n_probe=0) tier for comparison: what the routed
    # tier was before multi-probe — the recall delta the probes buy
    from cassandra_data_migration_spark.operators.similarity import (
        lsh_bucketed_pairs,
    )
    import pyspark.sql.functions as F

    t0 = time.perf_counter()
    dim = len(emb.select("embedding").first()[0])
    noprobe = {
        (r.id_a, r.id_b): r.cos_sim
        for r in lsh_bucketed_pairs(
            emb.select(
                F.col("vec_id").cast("long").alias("vec_id"), "embedding"
            ),
            dim=dim,
            threshold=args.threshold,
            num_planes=6,
            n_probe=0,
        ).collect()
    }
    noprobe_s = round(time.perf_counter() - t0, 2)

    hit = len(set(routed) & set(exact))
    recall = hit / len(exact) if exact else 1.0
    precision = hit / len(routed) if routed else 1.0
    out = {
        "fixture": args.fixture,
        "n_vectors": n_rows,
        "routing_engaged": n_rows > 8_192,
        "threshold": args.threshold,
        "exact_pairs": len(exact),
        "routed_pairs": len(routed),
        "pair_recall": round(recall, 4),
        "pair_precision": round(precision, 4),
        "recall_floor": args.floor,
        "passed": recall >= args.floor and precision == 1.0,
        "exact_tier_wall_s": exact_s,
        "routed_tier_wall_s": routed_s,
        "noprobe_pairs": len(noprobe),
        "noprobe_recall": round(
            len(set(noprobe) & set(exact)) / len(exact), 4
        )
        if exact
        else 1.0,
        "noprobe_wall_s": noprobe_s,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    if not out["passed"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
