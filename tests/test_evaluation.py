"""Classifier-evaluation operators (operators/evaluation.py): exact
AUC with tie handling, PR at thresholds, calibration bins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F  # noqa: F401

from cassandra_data_migration_spark.operators.evaluation import (
    calibration_bins,
    pr_at_thresholds,
    roc_auc,
)

PPM = 1_000_000


def _scored(spark, rows):
    return spark.createDataFrame(rows, "q long, y int")


def _auc(spark, rows):
    out = roc_auc(_scored(spark, rows), "q", "y").collect()
    assert len(out) == 1
    return out[0]


def test_auc_perfect_and_reversed(spark):
    perfect = [(10 + i, 1) for i in range(5)] + [(i, 0) for i in range(5)]
    assert _auc(spark, perfect)["auc_ppm"] == PPM
    reverse = [(i, 1) for i in range(5)] + [(10 + i, 0) for i in range(5)]
    assert _auc(spark, reverse)["auc_ppm"] == 0


def test_auc_all_ties_is_half(spark):
    rows = [(7, 1)] * 4 + [(7, 0)] * 6
    r = _auc(spark, rows)
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (4, 6, 500_000)


def test_auc_hand_computed_with_ties(spark):
    # scores: pos {3, 5, 5}, neg {1, 5, 7}
    # pairs (pos > neg) + 0.5 (ties):
    #  3 vs {1}: 1 win; 3 vs {5,7}: 0
    #  5 vs 1: win, 5 vs 5: tie(0.5), 5 vs 7: 0  (x2 positives at 5)
    # total = 1 + 2*(1 + 0.5) = 4 ; AUC = 4 / 9
    rows = [(3, 1), (5, 1), (5, 1), (1, 0), (5, 0), (7, 0)]
    r = _auc(spark, rows)
    assert r["auc_ppm"] == round(4 / 9 * PPM)  # half-up of exact 4/9


def test_auc_matches_numpy_reference(spark):
    import numpy as np

    rng_scores = [((i * 37) % 101, 1 if (i * 53) % 7 < 3 else 0)
                  for i in range(200)]
    r = _auc(spark, rng_scores)
    s = np.array([q for q, _ in rng_scores], float)
    y = np.array([y for _, y in rng_scores])
    # Mann-Whitney with average ranks, computed directly
    order = np.argsort(s, kind="stable")
    ranks = np.empty(len(s))
    sorted_s = s[order]
    i = 0
    pos_rank = 1
    while i < len(s):
        j = i
        while j < len(s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (pos_rank + (pos_rank + (j - i) - 1)) / 2
        pos_rank += j - i
        i = j
    n_pos, n_neg = y.sum(), (1 - y).sum()
    auc = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert r["auc_ppm"] == pytest.approx(auc * PPM, abs=1)


def test_auc_single_class_yields_no_row(spark):
    assert roc_auc(_scored(spark, [(1, 1), (2, 1)]), "q", "y").count() == 0


def test_pr_at_thresholds_counts_and_undefined_precision(spark):
    rows = [(10, 1), (8, 1), (6, 0), (4, 1), (2, 0)]
    out = {
        r["threshold"]: r
        for r in pr_at_thresholds(
            _scored(spark, rows), "q", "y", [5, 7, 100]
        ).collect()
    }
    t5 = out[5]  # predicted+: {10,8,6} -> tp=2 fp=1; fn=1 tn=1
    assert (t5["tp"], t5["fp"], t5["fn"], t5["tn"]) == (2, 1, 1, 1)
    assert t5["precision_ppm"] == round(2 / 3 * PPM)
    assert t5["recall_ppm"] == round(2 / 3 * PPM)
    # f1 = 2*2/(2*2+1+1) = 4/6
    assert t5["f1_ppm"] == round(4 / 6 * PPM)
    t100 = out[100]  # nothing predicted positive
    assert (t100["tp"], t100["fp"]) == (0, 0)
    assert t100["precision_ppm"] is None  # undefined, not zero
    assert t100["recall_ppm"] == 0
    with pytest.raises(ValueError):
        pr_at_thresholds(_scored(spark, rows), "q", "y", [])


def test_calibration_bins_and_ece(spark):
    # two bins: low-confidence docs (200000 ppm) with 50% accuracy
    # (perfectly calibrated would be 200000 acc); high-confidence
    # (900000 ppm) with 100% accuracy
    rows = [(200_000, 1), (200_000, 0), (900_000, 1), (900_000, 1)]
    df = spark.createDataFrame(rows, "conf_ppm long, y int")
    out = {
        r["bin"]: r for r in calibration_bins(df, "conf_ppm", "y", 10).collect()
    }
    lo, hi = out[2], out[9]
    assert (lo["n_docs"], lo["avg_conf_ppm"], lo["acc_ppm"]) == (
        2, 200_000, 500_000,
    )
    assert lo["gap_ppm"] == 300_000
    assert (hi["n_docs"], hi["avg_conf_ppm"], hi["acc_ppm"]) == (
        2, 900_000, PPM,
    )
    assert hi["gap_ppm"] == 100_000
    # ECE = (2*300000 + 2*100000) / 4 = 200000
    ece = sum(r["n_docs"] * r["gap_ppm"] for r in out.values()) / sum(
        r["n_docs"] for r in out.values()
    )
    assert round(ece) == 200_000


def test_calibration_top_edge_folds_into_last_bin(spark):
    df = spark.createDataFrame([(PPM, 1)], "conf_ppm long, y int")
    out = calibration_bins(df, "conf_ppm", "y", 10).collect()
    assert len(out) == 1 and out[0]["bin"] == 9
    with pytest.raises(ValueError):
        calibration_bins(df, "conf_ppm", "y", 0)


def test_grouped_auc_matches_global_per_group(spark):
    from cassandra_data_migration_spark.operators.evaluation import (
        grouped_roc_auc,
    )

    rows_a = [(3, 1), (5, 1), (5, 1), (1, 0), (5, 0), (7, 0)]  # AUC 4/9
    rows_b = [(10 + i, 1) for i in range(3)] + [(i, 0) for i in range(3)]
    df = spark.createDataFrame(
        [("a",) + r for r in rows_a] + [("b",) + r for r in rows_b]
        + [("c", 5, 1), ("c", 6, 1)],  # single-class group -> no row
        "g string, q long, y int",
    )
    out = {r["g"]: r for r in grouped_roc_auc(df, "g", "q", "y").collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["auc_ppm"] == round(4 / 9 * PPM)
    assert out["b"]["auc_ppm"] == PPM
    # each group's grouped result equals the global operator run on it
    solo = roc_auc(_scored(spark, rows_a), "q", "y").collect()[0]
    assert (solo["n_pos"], solo["n_neg"], solo["auc_ppm"]) == (
        out["a"]["n_pos"], out["a"]["n_neg"], out["a"]["auc_ppm"],
    )
