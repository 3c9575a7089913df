"""Connected components (operators/graph.py) and deterministic
sampling (operators/sampling.py) unit/property tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.graph import connected_components
from cassandra_data_migration_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
    weighted_mixture,
)
from tests.conftest import SF_CORRECT


def _cc(spark, edges, nodes):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    out = connected_components(e, n, "id")
    return {r["id"]: r["component"] for r in out.collect()}


def test_cc_chain_converges_past_one_round(spark):
    # a 6-node path: min label must propagate the full diameter,
    # which exercises the fixpoint loop (one round is not enough)
    got = _cc(spark, [(i, i + 1) for i in range(1, 6)], range(1, 7))
    assert got == {i: 1 for i in range(1, 7)}


def test_cc_singletons_and_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_cc_ignores_self_loops_and_direction(spark):
    got = _cc(spark, [(5, 5), (7, 4)], [4, 5, 7])
    assert got == {4: 4, 5: 5, 7: 4}


def _cc_star(spark, edges, nodes):
    from cassandra_data_migration_spark.operators.graph import (
        connected_components_star,
    )

    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    out = connected_components_star(e, n, "id")
    return {r["id"]: r["component"] for r in out.collect()}


def test_cc_star_matches_label_on_small_graphs(spark):
    cases = [
        ([(i, i + 1) for i in range(1, 6)], range(1, 7)),
        ([(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99]),
        ([(5, 5), (7, 4)], [4, 5, 7]),
        # near-clique (the dup-cluster shape)
        ([(a, b) for a in range(4) for b in range(a + 1, 4)] + [(8, 9)],
         range(10)),
    ]
    for edges, nodes in cases:
        assert _cc_star(spark, edges, nodes) == _cc(spark, edges, nodes)


def test_cc_star_converges_on_long_chain(spark):
    # a 400-node path has diameter 399: min-label propagation moves
    # the label ONE hop per round, so any bounded round count returns
    # unconverged labels — the star contraction telescopes the chain
    # in O(log^2 n) rounds and must land every node on component 0
    n = 400
    got = _cc_star(spark, [(i, i + 1) for i in range(n - 1)], range(n))
    assert got == {i: 0 for i in range(n)}


def test_cc_label_falls_back_to_star_past_max_iter(spark):
    # 80-node path with max_iter=5: label propagation cannot finish,
    # so the star fallback must still produce fully-converged labels
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(79)], "src long, dst long"
    )
    n = spark.createDataFrame([(x,) for x in range(80)], "id long")
    out = connected_components(e, n, "id", max_iter=5)
    assert {r["id"]: r["component"] for r in out.collect()} == {
        i: 0 for i in range(80)
    }


def test_cc_star_random_graph_vs_union_find(spark):
    import random

    rng = random.Random(42)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(260)
    ]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize: component = min id reachable
    comp = {}
    for v in range(n):
        r = find(v)
        comp.setdefault(r, []).append(v)
    want = {v: min(vs) for r, vs in comp.items() for v in vs}
    assert _cc_star(spark, edges, range(n)) == want


def test_hash_sample_nests_and_is_plan_independent(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.4).collect()}
    assert small < big  # supersets nest for a fixed salt
    # membership survives an arbitrary repartitioning (pure row function)
    re = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), "doc_id", 0.1).collect()
    }
    assert re == small


def test_hash_split_is_total_and_disjoint(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]  # weights roughly respected


def test_salt_decorrelates_buckets(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    b = docs.select(
        hash_bucket("doc_id", "a").alias("ba"),
        hash_bucket("doc_id", "b").alias("bb"),
    )
    frac_equal = b.filter(F.col("ba") == F.col("bb")).count() / b.count()
    assert frac_equal < 0.01  # independent draws collide ~1/10000


def test_weighted_mixture_sources_and_rates(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    mix = weighted_mixture([("all", docs, 1.0), ("none", docs, 0.0)], "doc_id")
    counts = {
        r["source"]: r["n"]
        for r in mix.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts.get("all") == docs.count()
    assert "none" not in counts


def test_stratified_sample_rates_and_independence(spark):
    """Realized per-stratum rates track the targets, and changing one
    stratum's rate never moves another stratum's survivors."""
    from cassandra_data_migration_spark.operators.sampling import stratified_sample
    from cassandra_data_migration_spark.sources.tables import load_table
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    rates = {"en": 0.3, "es": 0.6}
    out = stratified_sample(docs, "lang", rates, "doc_id", default_fraction=1.0)
    kept = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    for lang, frac in rates.items():
        assert abs(kept[lang] / totals[lang] - frac) < 0.15
    for lang in set(totals) - set(rates):  # default 1.0 keeps everything
        assert kept[lang] == totals[lang]

    bumped = stratified_sample(
        docs, "lang", {"en": 0.3, "es": 0.9}, "doc_id", default_fraction=1.0
    )
    es_before = {r.doc_id for r in out.filter("lang='es'").collect()}
    es_after = {r.doc_id for r in bumped.filter("lang='es'").collect()}
    en_before = {r.doc_id for r in out.filter("lang='en'").collect()}
    en_after = {r.doc_id for r in bumped.filter("lang='en'").collect()}
    assert es_before <= es_after  # superset nesting within the stratum
    assert en_before == en_after  # untouched stratum unchanged


def test_group_split_is_leakage_free(spark):
    # splitting on the GROUP key: every source's docs land in exactly
    # one split — provenance can never straddle train/eval
    from cassandra_data_migration_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    out = hash_split(
        docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="grp"
    )
    per = out.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    ).collect()
    assert per and all(r.k == 1 for r in per)


def test_negative_samples_never_self_and_deterministic(spark):
    from cassandra_data_migration_spark.operators.sampling import negative_samples
    from cassandra_data_migration_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    n = docs.count()
    out = negative_samples(docs, "doc_id", corpus_size=n, k=3).collect()
    assert len(out) == 3 * n
    for r in out:
        assert 0 <= r.neg_id < n and r.neg_id != r.doc_id
    again = negative_samples(docs, "doc_id", corpus_size=n, k=3).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))
    # draws are roughly uniform: no partner dominates
    from collections import Counter

    c = Counter(r.neg_id for r in out)
    assert max(c.values()) <= 12  # 1500 draws over 500 ids, mean 3


def test_doremi_weights_upweight_hard_domains(spark):
    """A domain of SHUFFLED text (same unigram stats, destroyed token
    order) must carry higher excess loss — the bigram proxy explains
    it worst — and therefore a larger mixture weight than the natural
    domains."""
    from cassandra_data_migration_spark.operators.sampling import (
        doremi_domain_weights,
    )

    words = [f"w{i}" for i in range(30)]
    base = " ".join(words)
    natural = [(i, base, "nat") for i in range(30)]
    # same unigram stats, but a DIFFERENT word order per doc (stride
    # permutations over a 30-word sentence; strides coprime to 30 and
    # not 1, so every doc is genuinely reordered) — with the bigram
    # table capped below the shuffled domain's bigram diversity, its
    # token order stays unexplained while the natural sentence's 29
    # bigrams are fully memorized
    strides = [7, 11, 13, 17, 19, 23, 29]
    shuffled = [
        (
            100 + i,
            " ".join(
                words[(j * strides[i % len(strides)]) % 30]
                for j in range(30)
            ),
            "shuf",
        )
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        natural + shuffled, "doc_id long, text string, source string"
    )
    got = {
        r["source"]: (r["excess_e6"], r["weight_ppm"], r["n_docs"])
        for r in doremi_domain_weights(
            docs, bigram_vocab=40, bigram_context=40
        ).collect()
    }
    assert got["nat"][2] == got["shuf"][2] == 30
    assert got["shuf"][0] > got["nat"][0], got
    assert got["shuf"][1] > got["nat"][1], got
    # ppm weights form a distribution
    assert abs(sum(v[1] for v in got.values()) - 1_000_000) <= len(got)


def test_doremi_weights_oracle(spark, duck):
    import pandas as pd

    import __spark_entry__ as m
    from tests.conftest import SF_CORRECT

    sdf = m.queries()["doremi_weights"](spark, SF_CORRECT).toPandas()
    odf = duck.execute(m.oracle_sql()["doremi_weights"]).fetchdf()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) == 20 and a["weight_ppm"].nunique() > 1  # non-degenerate
