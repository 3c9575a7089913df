"""Semantic tests for BM25 retrieval, unigram-LM scoring, fuzzy
matching, time-series resampling, and funnel analysis on crafted
inputs where the right answer is known by construction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.aggregates import event_funnel
from cassandra_data_migration_spark.operators.joins import fuzzy_name_match
from cassandra_data_migration_spark.operators.text import (
    bm25_topk,
    unigram_logprob,
)
from cassandra_data_migration_spark.operators.windows import resample_ffill


def test_bm25_ranks_term_dense_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join filler filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "filler filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["spark", "join"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1  # densest in query terms
    assert 3 not in ids  # no query term -> not a candidate
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_query_terms == 2 and by_id[2].n_query_terms == 1
    assert by_id[1].score_e6 > by_id[2].score_e6 > 0


def test_unigram_logprob_prefers_common_tokens(spark):
    # 'the' dominates the corpus; a doc of rare tokens must score lower
    rows = [(i, "the the the the") for i in range(10)]
    rows += [(100, "the the the the"), (101, "zq xv qj wk")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_logprob(docs, vocab_size=3).collect()}
    assert out[100].avg_logprob > out[101].avg_logprob
    assert out[100].n_tokens == out[101].n_tokens == 4
    # integer e6 sums: total = avg * n within rounding
    for r in out.values():
        assert abs(r.logprob_e6 / r.n_tokens / 1e6 - r.avg_logprob) < 1e-3


def test_fuzzy_name_match_respects_block_and_distance(spark):
    parts = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widget"),  # exact dup: counted, not paired
            (3, "ted widget"),  # dist 1 from red widget, same block
            (4, "crimson widget"),  # same block, dist > 2 from both
            (5, "red bolt"),  # different block entirely
        ],
        "p_partkey long, p_name string",
    )
    out = fuzzy_name_match(parts, name_col="p_name", max_dist=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.name_a, r.name_b, r.dist) == ("red widget", "ted widget", 1)
    assert (r.n_a, r.n_b) == (2, 1)  # dup rows roll into the count


def test_resample_ffill_fills_gaps_and_carries_value(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(hours=3), 30.0),  # 2-hour gap between
        (2, t0, 5.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = resample_ffill(ev).orderBy("user_id", "bucket").collect()
    u1 = [r for r in out if r.user_id == 1]
    assert len(u1) == 4  # hours 0..3 inclusive
    assert [r.n_events for r in u1] == [1, 0, 0, 1]
    assert [r.value_ffill for r in u1] == [10.0, 10.0, 10.0, 30.0]
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].value_ffill == 5.0


def test_event_funnel_requires_stage_order(spark):
    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1 completes in order
        (1, t, "view"), (1, t + h, "click"), (1, t + 2 * h, "purchase"),
        # user 2 clicks before viewing -> stops at stage 0
        (2, t, "click"), (2, t + h, "view"),
        # user 3 views only
        (3, t, "view"),
        # user 4 never views -> not even stage 0
        (4, t, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    ev = ev.withColumn("value", F.lit(1.0))
    out = {r.stage: r for r in event_funnel(ev).collect()}
    assert out["view"].users == 3
    assert out["click"].users == 1
    assert out["purchase"].users == 1
    assert out["view"].conversion is None
    assert abs(out["click"].conversion - round(1 / 3, 4)) < 1e-9
    assert out["purchase"].conversion == 1.0


def test_bigram_logprob_punishes_shuffled_order(spark):
    # same vocabulary, different ORDER: the natural ordering dominates
    # the corpus so its bigrams are in-table; the shuffled doc's
    # bigrams are unseen and must score lower
    from cassandra_data_migration_spark.operators.text import bigram_logprob

    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows += [(100, "the cat sat on the mat"), (101, "mat the on sat cat the")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert out[100].avg_logprob > out[101].avg_logprob
    assert out[100].n_bigrams == out[101].n_bigrams == 5
    # single-token docs have no bigrams and are excluded
    one = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    assert bigram_logprob(one).count() == 0


def test_winnow_shared_substring_shares_fingerprint(spark):
    # guarantee: a shared substring of length >= k+window-1 (=8) must
    # produce at least one shared fingerprint; disjoint texts share none
    from cassandra_data_migration_spark.operators.text import winnow_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "xxxx THE SHARED PHRASE IS HERE yyyy"),
            (2, "aaaa THE SHARED PHRASE IS HERE bbbb"),
            (3, "zzzz completely different content qqqq"),
        ],
        "doc_id long, text string",
    )
    fps = {r.doc_id: set(r.fingerprints) for r in winnow_fingerprints(docs).collect()}
    assert fps[1] & fps[2], "shared phrase must yield a shared fingerprint"
    assert not (fps[1] & fps[3] and fps[2] & fps[3]), "disjoint docs should not all collide"
    # deterministic
    again = {r.doc_id: set(r.fingerprints) for r in winnow_fingerprints(docs).collect()}
    assert fps == again
