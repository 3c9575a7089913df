"""Round-10 additions: hot-bucket rebanding (second-level LSH recall
recovery), the fused single-aggregation bounded_bucket_pairs, the
interval-stabbing count sweep, auto bin-width derivation, the bounded
operator-cache registry, and the artifact-vacuum robustness fix.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bounded_bucket_pairs: fused design invariants
# ---------------------------------------------------------------------------


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_small_buckets_enumerate_all_pairs(spark):
    from cassandra_data_migration_spark.operators.dedup import (
        bounded_bucket_pairs,
    )

    entries = spark.createDataFrame(
        [("k1", i) for i in range(5)] + [("k2", 10), ("k2", 11)],
        ["key", "member"],
    )
    got = _pairs(bounded_bucket_pairs(entries, "key", "member", cap=8))
    want = {(i, j) for i in range(5) for j in range(i + 1, 5)} | {(10, 11)}
    assert got == want


def test_hot_bucket_survivors_connect_and_bound(spark):
    from cassandra_data_migration_spark.operators.dedup import (
        bounded_bucket_pairs,
    )

    n = 40
    entries = spark.createDataFrame(
        [("hot", i) for i in range(n)], ["key", "member"]
    )
    got = _pairs(bounded_bucket_pairs(entries, "key", "member", cap=8))
    # chain (n-1) + star to min skipping the chained neighbor (n-2)
    assert len(got) == 2 * n - 3
    # connectivity: union-find over the survivor edges reaches all
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n)}) == 1


def test_duplicate_member_under_one_key_no_self_pair(spark):
    from cassandra_data_migration_spark.operators.dedup import (
        bounded_bucket_pairs,
    )

    entries = spark.createDataFrame(
        [("k", 1), ("k", 1), ("k", 2)], ["key", "member"]
    )
    assert _pairs(bounded_bucket_pairs(entries, "key", "member")) == {(1, 2)}


def test_dedup_false_unique_by_construction(spark):
    from cassandra_data_migration_spark.operators.dedup import (
        bounded_bucket_pairs,
    )

    # disjoint buckets: every member in exactly one bucket -> the
    # dedup=False fast path must already be duplicate-free
    entries = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 10), ("b", 11)],
        ["key", "member"],
    )
    rows = bounded_bucket_pairs(
        entries, "key", "member", dedup=False
    ).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(pairs) == len(set(pairs)) == 4


# ---------------------------------------------------------------------------
# reband: second-level LSH recall inside hot buckets (VERDICT r9 #3)
# ---------------------------------------------------------------------------


def test_reband_recovers_subfamily_pairs_in_hot_bucket(spark):
    from cassandra_data_migration_spark.operators.dedup import (
        bounded_bucket_pairs,
    )

    # one hot bucket (16 members > cap 10) holding two sub-families
    # distinguished by a finer content key: rebanding must emit ALL
    # intra-sub-family pairs, which plain chain+star cannot
    rows = [("hot", i, 100) for i in range(8)] + [
        ("hot", i, 200) for i in range(50, 58)
    ]
    entries = spark.createDataFrame(rows, ["key", "member", "rb"])
    got = _pairs(
        bounded_bucket_pairs(
            entries, "key", "member", cap=10, reband_col="rb"
        )
    )
    fam_a = {(i, j) for i in range(8) for j in range(i + 1, 8)}
    fam_b = {(i, j) for i in range(50, 58) for j in range(i + 1, 58)}
    assert fam_a <= got and fam_b <= got
    # and the bucket stays connected across the sub-families
    ids = sorted({i for p in got for i in p})
    idx = {m: k for k, m in enumerate(ids)}
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        parent[find(idx[a])] = find(idx[b])
    assert len({find(k) for k in range(len(ids))}) == 1


def test_reband_degree_cap_on_giant_subbucket(spark):
    from cassandra_data_migration_spark.operators.dedup import (
        bounded_bucket_pairs,
    )

    # a hot bucket whose members ALL share one reband key must not
    # regress to O(n^2): each member pairs with at most cap same-
    # reband successors (plus chain+star)
    n, cap = 60, 5
    entries = spark.createDataFrame(
        [("hot", i, 7) for i in range(n)], ["key", "member", "rb"]
    )
    cnt = bounded_bucket_pairs(
        entries, "key", "member", cap=cap, reband_col="rb"
    ).count()
    assert cnt <= n * cap + 2 * n
    assert cnt < n * (n - 1) // 2


def test_ngram_jaccard_reband_end_to_end_recall(spark):
    """Two near-dup families whose EVERY shared shingle is hot (df >
    cap): without rebanding only survivor-edge candidates reach the
    exact verify and most intra-family pairs are lost; the reband
    MinHash recovers the full lossless output."""
    from cassandra_data_migration_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    def fam(tag, base):
        # one unique PREFIX token per doc -> exactly one unique
        # shingle against 58 shared ones, so the family's reband
        # MinHash is uniform under the fixed re-hash seed (verified:
        # both families land in a single sub-bucket each) and the
        # recovery is deterministic
        docs = []
        for i in range(8):
            toks = [f"u{base + i}"] + [f"{tag}{t}" for t in range(60)]
            docs.append((base + i, " ".join(toks)))
        return docs

    df = spark.createDataFrame(
        fam("a", 0) + fam("b", 100), ["doc_id", "text"]
    )
    lossless = _pairs(
        ngram_jaccard_pairs(df, threshold=0.5, bucket_cap=10_000)
    )
    # cap 7 < family size 8: every within-family shingle bucket is
    # hot; the reband sub-bucket (one run of 8) is fully paired
    # because the banded window (next `cap` positions) spans the
    # run's max pair distance of 7
    capped = _pairs(ngram_jaccard_pairs(df, threshold=0.5, bucket_cap=7))
    # every emitted pair is verified-exact, so capped <= lossless ...
    assert capped <= lossless
    # ... and the reband recovers the full intra-family pair sets
    assert capped == lossless
    fam_a = {(i, j) for i in range(8) for j in range(i + 1, 8)}
    assert fam_a <= capped


def test_intra_group_pairs_honor_bucket_cap_override(spark):
    """ADVICE r9: a caller-raised bucket_cap must reach the identical-
    set intra-group path too (it used to stay at the default 64)."""
    from cassandra_data_migration_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # 70 identical docs: one fingerprint group of 70 > DEFAULT(64)
    df = spark.createDataFrame(
        [(i, "x y z w v u t s r q p o n m") for i in range(70)],
        ["doc_id", "text"],
    )
    out = ngram_jaccard_pairs(df, threshold=0.5, bucket_cap=10_000)
    assert out.count() == 70 * 69 // 2  # lossless all-pairs at J=1.0


# ---------------------------------------------------------------------------
# stabbing_count_join: exactness vs brute force, edge cases
# ---------------------------------------------------------------------------


def _brute_counts(points, intervals):
    out = {}
    for pid, p in points:
        out[(pid, p)] = sum(1 for lo, hi in intervals if lo <= p <= hi)
    return out


def test_stabbing_count_matches_brute_force(spark):
    from cassandra_data_migration_spark.operators.joins import (
        stabbing_count_join,
    )

    import random

    rnd = random.Random(10)
    pts = [(i, rnd.randint(-50, 150)) for i in range(200)]
    ivs = [
        (lo, lo + rnd.randint(0, 30))
        for lo in (rnd.randint(-40, 140) for _ in range(300))
    ]
    p_df = spark.createDataFrame(pts, ["pid", "p"])
    i_df = spark.createDataFrame(ivs, ["lo", "hi"])
    got = {
        (r["pid"], r["p"]): r["n_covering"]
        for r in stabbing_count_join(p_df, i_df, "p", "lo", "hi").collect()
    }
    assert got == _brute_counts(pts, ivs)


def test_stabbing_count_zero_coverage_and_empty_intervals(spark):
    from cassandra_data_migration_spark.operators.joins import (
        stabbing_count_join,
    )

    p_df = spark.createDataFrame([(1, 5), (2, 1000)], ["pid", "p"])
    i_df = spark.createDataFrame([(0, 10)], ["lo", "hi"])
    got = {
        r["pid"]: r["n_covering"]
        for r in stabbing_count_join(p_df, i_df, "p", "lo", "hi").collect()
    }
    assert got == {1: 1, 2: 0}
    empty = spark.createDataFrame([], "lo long, hi long")
    out = stabbing_count_join(p_df, empty, "p", "lo", "hi")
    assert {r["n_covering"] for r in out.collect()} == {0}


def test_binned_range_join_auto_width(spark):
    from cassandra_data_migration_spark.operators.joins import (
        binned_range_join,
    )

    import random

    rnd = random.Random(4)
    pts = [(i, rnd.randint(0, 300)) for i in range(100)]
    ivs = [
        (lo, lo + rnd.randint(0, 40))
        for lo in (rnd.randint(0, 280) for _ in range(120))
    ]
    p_df = spark.createDataFrame(pts, ["pid", "p"])
    i_df = spark.createDataFrame(ivs, ["lo", "hi"])
    got = binned_range_join(p_df, i_df, "p", "lo", "hi", bin_width=None)
    want = sum(1 for _, p in pts for lo, hi in ivs if lo <= p <= hi)
    assert got.count() == want


# ---------------------------------------------------------------------------
# bounded operator-cache registry (ADVICE r9: persist leak)
# ---------------------------------------------------------------------------


def test_pin_registry_bounds_live_caches(spark):
    from cassandra_data_migration_spark import caching

    caching.release_pinned()
    frames = [
        caching.pin(spark.range(5).withColumn("_t", F.lit(i)))
        for i in range(caching.MAX_PINNED + 3)
    ]
    live = [f for f in frames if f.storageLevel.useMemory or f.storageLevel.useDisk]
    assert len(live) <= caching.MAX_PINNED
    n = caching.release_pinned()
    assert n == caching.MAX_PINNED
    assert not any(
        f.storageLevel.useMemory or f.storageLevel.useDisk for f in frames
    )


# ---------------------------------------------------------------------------
# artifact vacuum: non-version siblings must not abort the sweep
# ---------------------------------------------------------------------------


def test_vacuum_skips_non_numeric_layout_dirs(spark, tmp_path):
    from cassandra_data_migration_spark.operators.ann_index import (
        persist_sq8_table,
        vacuum_sq8_table,
    )

    root = str(tmp_path / "sq8")
    emb = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(8)],
        ["vec_id", "embedding"],
    )
    for _ in range(3):
        persist_sq8_table(spark, emb, root)
    os.makedirs(os.path.join(root, "q8_v2_tmp"))
    removed = vacuum_sq8_table(root, keep_versions=2)
    assert removed  # old version reclaimed despite the stray sibling
    assert os.path.isdir(os.path.join(root, "q8_v2_tmp"))


def test_stabbing_weighted_coverage(spark):
    from cassandra_data_migration_spark.operators.joins import (
        stabbing_count_join,
    )

    p_df = spark.createDataFrame([(1, 5), (2, 12)], ["pid", "p"])
    i_df = spark.createDataFrame(
        [(0, 10, 3), (4, 6, 10), (11, 20, 7)], ["lo", "hi", "w"]
    )
    got = {
        r["pid"]: r["covered_weight"]
        for r in stabbing_count_join(
            p_df, i_df, "p", "lo", "hi",
            out_col="covered_weight", weight_col="w",
        ).collect()
    }
    assert got == {1: 13, 2: 7}


def test_ngram_jaccard_stop_shingle_capping(spark):
    """max_shingle_freq (the head-of-Zipf guard) takes the explode +
    document-frequency branch of _set_groups: shingles above the df
    cap drop out of every doc's set BEFORE grouping, and a very high
    cap reproduces the scan-side (no-filter) output exactly."""
    from cassandra_data_migration_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    boiler = " ".join(f"b{t}" for t in range(10))
    docs = [(i, f"{boiler} u{i} v{i} w{i} x{i} y{i} z{i}") for i in range(6)]
    # one true near-dup pair sharing private content too
    docs += [(10, "p q r s t u v w x y z1"), (11, "p q r s t u v w x y z2")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    uncapped = ngram_jaccard_pairs(df, threshold=0.4)
    # every boilerplate shingle appears in >=6 docs; capping at 4
    # removes them, so the boilerplate-only family loses its overlap
    # and only the true near-dup pair (private 9-shingle core) remains
    capped = ngram_jaccard_pairs(df, threshold=0.4, max_shingle_freq=4)
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(10, 11)}
    # a cap above every df is a no-op: identical to the scan-side path
    loose = ngram_jaccard_pairs(df, threshold=0.4, max_shingle_freq=1000)
    assert sorted(map(tuple, loose.collect())) == sorted(
        map(tuple, uncapped.collect())
    )
