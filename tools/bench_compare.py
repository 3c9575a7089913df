"""Calibration-normalized per-query bench comparison.

Usage: python tools/bench_compare.py OLD.json NEW.json [--top N]
Both files are BENCH_FULL-shaped. Divides each per-query wall by its
file's ``calibration_sec`` and prints the biggest normalized movers in
both directions plus the common-query normalized total ratio — the
comparison convention every round's verdict uses (raw cross-round
deltas are meaningless on a shared host).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    co, cn = old["calibration_sec"], new["calibration_sec"]
    qo = {k: v / co for k, v in old["queries"].items()}
    qn = {k: v / cn for k, v in new["queries"].items()}
    common = sorted(set(qo) & set(qn))
    to, tn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    print(
        f"calibration {co} -> {cn}; common {len(common)} queries; "
        f"normalized total {to:.1f} -> {tn:.1f} (x{tn / to:.3f})"
    )
    movers = sorted(
        (
            (qn[k] / qo[k], k, qo[k], qn[k])
            for k in common
            if max(qo[k], qn[k]) >= 0.5  # ignore sub-noise entries
        ),
    )
    print("\nbiggest improvements (normalized):")
    for r, k, a, b in movers[: args.top]:
        print(f"  {k:32s} {a:7.2f} -> {b:7.2f}  x{r:.2f}")
    print("\nbiggest regressions (normalized):")
    for r, k, a, b in movers[-args.top:][::-1]:
        if r <= 1.0:
            break
        print(f"  {k:32s} {a:7.2f} -> {b:7.2f}  x{r:.2f}")
    added = sorted(set(qn) - set(qo))
    if added:
        print(f"\nnew queries: {', '.join(added)}")


if __name__ == "__main__":
    main()
