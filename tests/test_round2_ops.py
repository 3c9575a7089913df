"""Semantic tests for round-2 operators: RRF fusion, URL
canonicalization/dedup, the hashed linear quality classifier, and
token-budget selection — crafted inputs with answers known by
construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.retrieval import (
    ranked_list,
    rrf_fuse,
)
from cassandra_data_migration_spark.operators.sampling import (
    token_budget_select,
)
from cassandra_data_migration_spark.operators.text import hashed_linear_score
from cassandra_data_migration_spark.operators.web import (
    canonicalize_url,
    url_canonical_groups,
)


def test_rrf_doc_in_both_lists_outranks_single_list_leaders(spark):
    # doc 5 is mid-ranked in BOTH lists; docs 1 and 9 each lead one
    # list only.  1/(c+2)+1/(c+2) > 1/(c+1) for c=60, so 5 must win.
    a = spark.createDataFrame(
        [(1, 100), (5, 90), (2, 80)], "id long, score long"
    )
    b = spark.createDataFrame(
        [(9, 100), (5, 90), (3, 80)], "id long, score long"
    )
    fused = rrf_fuse(
        [
            ranked_list(a, [F.desc("score"), F.asc("id")], "id", "a"),
            ranked_list(b, [F.desc("score"), F.asc("id")], "id", "b"),
        ],
        k=10,
        c=60,
    ).collect()
    assert fused[0]["doc_id"] == 5
    assert fused[0]["n_lists"] == 2
    by_id = {r["doc_id"]: r for r in fused}
    assert by_id[1]["n_lists"] == by_id[9]["n_lists"] == 1
    # rank-1 singles tie exactly (same integer contribution), broken by id
    assert by_id[1]["rrf_e9"] == by_id[9]["rrf_e9"]
    ids = [r["doc_id"] for r in fused]
    assert ids.index(1) < ids.index(9)


def test_canonicalize_url_rules(spark):
    cases = [
        ("https://WWW.Example.COM:443/a/b/page.html?utm=x#frag",
         "https://example.com/a/b/"),
        ("http://example.com:80/a/index.php?ref=1",
         "http://example.com/a/"),
        ("https://sub.example.com/x/y/", "https://sub.example.com/x/y/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_canonical_groups_keeps_min_id(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/d/one.html?x=1"),
            (2, "https://www.a.com/d/two.html"),
            (3, "https://a.com/other/one.html"),
        ],
        "doc_id long, url string",
    )
    out = {r["canonical_url"]: r for r in url_canonical_groups(df).collect()}
    g = out["https://a.com/d/"]
    assert g["keeper_id"] == 1 and g["n_docs"] == 2 and g["n_dropped"] == 1
    assert out["https://a.com/other/"]["n_docs"] == 1


def test_hashed_linear_score_is_token_additive(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha alpha alpha"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in hashed_linear_score(df).collect()}
    # repeated token: weight sum scales linearly, mean (and prob) unchanged
    assert out[2]["w_sum_e3"] == 3 * out[1]["w_sum_e3"]
    assert out[2]["quality_prob"] == out[1]["quality_prob"]
    assert out[3]["n_tokens"] == 2
    assert out[1]["accept"] == (out[1]["quality_prob"] >= 0.5)
    # weights live in [-1000, 1000] e3 fixed point
    assert -1000 <= out[1]["w_sum_e3"] <= 1000


def test_token_budget_select_matches_naive_walk(spark):
    rows = [(i, (i * 7) % 5, 10 + (i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, prio long, n_tok long")
    budget = 200
    got = sorted(
        (r["doc_id"], r["prio"], r["n_tokens"])
        for r in token_budget_select(
            df, budget, priority_col="prio", token_col="n_tok"
        ).collect()
    )
    # naive reference: global (prio desc, id asc) walk, inclusive cumsum
    walk = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, want = 0, []
    for i, p, t in walk:
        cum += t
        if cum <= budget:
            want.append((i, p, t))
    assert got == sorted(want)
    assert 0 < len(got) < len(rows)  # the budget actually bites


def test_token_budget_select_whole_corpus_fits(spark):
    df = spark.createDataFrame(
        [(1, 5, 10), (2, 3, 10)], "doc_id long, prio long, n_tok long"
    )
    out = token_budget_select(df, 100, priority_col="prio", token_col="n_tok")
    assert out.count() == 2


def test_heavy_hitters_equals_naive_groupby(spark):
    rows = [(i, "a b c " + ("hot " * (i % 3))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from cassandra_data_migration_spark.operators.text import heavy_hitters, tokens

    got = {
        (r["term"], r["cnt"])
        for r in heavy_hitters(df, min_count=20, n_buckets=8).collect()
    }
    naive = {
        (r["term"], r["cnt"])
        for r in df.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 20)
        .collect()
    }
    assert got == naive and len(naive) >= 3  # a b c are hot; sketch adds none


def test_stable_dense_ids_equal_global_row_number(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(13)
    from cassandra_data_migration_spark.operators.ids import stable_dense_ids

    out = stable_dense_ids(
        df, ["n", "doc_id"], descending=[True, False], buckets=8
    ).collect()
    want = {
        r[0]: rank + 1
        for rank, r in enumerate(sorted(rows, key=lambda r: (-r[1], r[0])))
    }
    assert {r["doc_id"]: r["stable_id"] for r in out} == want


def test_scd2_history_builds_change_intervals(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, s)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, t(1), "free"),
            (1, t(2), "free"),   # no change -> folded into v1
            (1, t(3), "pro"),
            (1, t(5), "free"),
            (2, t(4), "pro"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    from cassandra_data_migration_spark.operators.windows import scd2_history

    out = sorted(
        scd2_history(df, "user_id", "ts", "event_type").collect(),
        key=lambda r: (r["user_id"], r["version"]),
    )
    assert [(r["user_id"], r["version"], r["event_type"]) for r in out] == [
        (1, 1, "free"), (1, 2, "pro"), (1, 3, "free"), (2, 1, "pro"),
    ]
    assert out[0]["valid_from"] == t(1) and out[0]["valid_to"] == t(3)
    assert out[2]["valid_to"] is None and out[3]["valid_to"] is None


def test_percentile_normalize_and_robust_scale(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "en", 30), (4, "de", 7)],
        "doc_id long, lang string, v long",
    )
    from cassandra_data_migration_spark.operators.aggregates import robust_scale
    from cassandra_data_migration_spark.operators.windows import (
        percentile_normalize,
    )

    pr = {
        r["doc_id"]: r["pct_rank"]
        for r in percentile_normalize(df, "lang", "v", "doc_id").collect()
    }
    assert pr[1] == 0.0 and pr[2] == 0.5 and pr[3] == 1.0 and pr[4] == 0.0
    rs = {
        r["doc_id"]: r
        for r in robust_scale(df, "lang", "v", "doc_id").collect()
    }
    # en: median 20, deviations {10,0,10} -> MAD 10 -> z = (v-20)/10
    assert rs[1]["robust_z"] == -1.0 and rs[3]["robust_z"] == 1.0
    # singleton group: MAD 0 -> z is NULL, never a division blowup
    assert rs[4]["robust_z"] is None and rs[4]["group_mad"] == 0.0
