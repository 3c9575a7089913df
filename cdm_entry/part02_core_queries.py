"""Core §2 operator queries: scans, filters, joins, aggregates, files, migrate, streaming ZDM (registration block A).

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part01_fixtures import *  # noqa: F401,F403

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def q_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1: full-table scan
    return load_table(spark, sf_dir, "nation")


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P1
    return flt.project(
        load_table(spark, sf_dir, "customer"), ["c_custkey", "c_name", "c_mktsegment"]
    )


def q_column_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P2
    return flt.exclude(load_table(spark, sf_dir, "customer"), ["c_acctbal", "c_name"])


def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P3
    return flt.filter_eq(
        load_table(spark, sf_dir, "customer"), "c_mktsegment", "BUILDING"
    )


def q_token_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P4
    return flt.token_range_filter(
        load_table(spark, sf_dir, "orders"), "o_orderkey", 3, 7, num_buckets=32
    )


def q_connector_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S10/P4 through the LIVE connector code path: the fake Cassandra
    # DataSource (sources/fake_cassandra.py) registers under the real
    # org.apache.spark.sql.cassandra format name, so
    # CassandraTableSource.read() — option translation, token() CQL
    # pushdown string, paged Arrow batches sized by fetchSizeInRows —
    # executes end-to-end instead of being declared-only.
    from cassandra_data_migration_spark.sources.connector import (
        CassandraTableSource,
    )
    from cassandra_data_migration_spark.sources.fake_cassandra import (
        register_fake_cassandra,
    )

    register_fake_cassandra(spark)
    src = CassandraTableSource(
        keyspace=sf_dir,
        partition_keys={"orders": ["o_orderkey"]},
        fetch_size_rows=1000,
    )
    orders = src.read(spark, "orders", token_min=3, token_max=7)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P6
    # key chosen to exist at every fixture scale factor (sf0.001-sf0.1)
    # so the oracle compares real row values, not just an empty plan
    return flt.point_lookup(
        load_table(spark, sf_dir, "lineitem"), {"l_orderkey": 0, "l_linenumber": 4}
    )


def q_grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1/A3
    return agg.grouped_count(load_table(spark, sf_dir, "orders"), "o_orderstatus")


def q_writetime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5: incremental migration — rows written after T µs.  Writetime is
    # derived from the event-time column (functions.metadata).
    from cassandra_data_migration_spark.functions.metadata import (
        attach_derived_writetime,
    )
    from cassandra_data_migration_spark.operators.filters import writetime_filter

    ev = attach_derived_writetime(load_table(spark, sf_dir, "events"), "ts")
    return writetime_filter(ev, 1705276800000000)  # 2024-01-15T00:00:00Z


def q_guardrail_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P7: guardrail size predicate — documents whose text exceeds the cap
    docs = load_table(spark, sf_dir, "documents")
    _, violations = flt.guardrail_split(docs, {"text": 0.35})
    return violations


def q_traffic_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A4
    return agg.traffic_summary(load_table(spark, sf_dir, "events"))


def q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A6 — exact percentiles per event type
    return agg.latency_percentiles(
        load_table(spark, sf_dir, "events"), "value", by=["event_type"]
    )


def q_windowed_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A7 — 5-minute tumbling window counts
    return agg.rate_over_window(load_table(spark, sf_dir, "events"), "ts", 5)


def q_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A7 sliding form: 10-min windows every 5 min — each event lands in
    # exactly two overlapping windows
    from cassandra_data_migration_spark.operators.aggregates import sliding_rate

    return sliding_rate(load_table(spark, sf_dir, "events"))


def q_rowwise_greatest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A8 — row-level max (CDM's writetime/TTL collapse shape)
    return agg.rowwise_max(
        flt.project(
            load_table(spark, sf_dir, "lineitem"),
            ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
        ),
        ["l_quantity", "l_discount", "l_tax"],
        "row_max",
    )


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.5 — clustering-order top-1 per partition key
    from cassandra_data_migration_spark.operators.windows import latest_per_key

    return latest_per_key(
        load_table(spark, sf_dir, "events"), ["user_id"], "ts", tiebreak=["event_id"]
    )


def q_limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L1 — deterministic LIMIT via clustering order
    return (
        load_table(spark, sf_dir, "orders").orderBy("o_orderkey").limit(10)
    )


def q_union_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U1 — per-table counts rolled into one report
    from cassandra_data_migration_spark.operators.setops import per_table_summary

    return per_table_summary(
        {t: load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")}
    )


def q_value_set_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U2 — EXCEPT ALL over projected sides (the schema-diff primitive)
    from cassandra_data_migration_spark.operators.setops import value_set_diff

    # nations with customers but no high-balance supplier (threshold
    # chosen so the diff is non-empty at every test scale factor)
    c = load_table(spark, sf_dir, "customer").select("c_nationkey").distinct()
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("c_nationkey"))
        .distinct()
    )
    return value_set_diff(c, s)


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F4/F5 — concat/lower/prefix-match
    from cassandra_data_migration_spark.functions.scalars import like_prefix

    return (
        load_table(spark, sf_dir, "customer")
        .filter(like_prefix("c_name", "Customer#0000001"))
        .select(
            "c_custkey",
            F.lower("c_name").alias("name_lower"),
            F.concat(F.lower("c_mktsegment"), F.lit("@example.com")).alias("segment_email"),
        )
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F3 — date derivation & arithmetic
    # date outputs rendered as ISO strings: engine-portable (a raw DATE
    # column round-trips as datetime64 vs date object across engines)
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


def q_round_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F7 — round + Decimal(18,2) cast
    from cassandra_data_migration_spark.functions.scalars import money_round

    # decimal math happens at DECIMAL(18,2); final cast to double is for
    # engine-portable comparison only
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", money_round("o_totalprice").cast("double").alias("total_decimal")
    )


def q_row_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F8 — canonical md5 row hash (int/string columns: engine-portable)
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5(
            F.concat_ws(
                "|", F.col("n_nationkey").cast("string"), "n_name",
                F.col("n_regionkey").cast("string"),
            )
        ).alias("row_hash"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F11 — extractJson
    from cassandra_data_migration_spark.functions.scalars import json_get

    return load_table(spark, sf_dir, "events").select(
        "event_id", json_get("props", "k").alias("k_value")
    )


def q_word_explode_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F11 explode (UDTF shape) + grouped count over documents tokens
    from cassandra_data_migration_spark.functions.scalars import explode_tokens

    return (
        explode_tokens(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"), "text"
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )


def q_missing_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1
    return jn.missing_rows(_origin(spark, sf_dir), _target(spark, sf_dir), ORDERS_PK)


def q_mismatch_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2 — PKs of rows whose non-key values differ (hash-compare inside)
    return jn.mismatched_rows(
        _origin(spark, sf_dir), _target(spark, sf_dir), ORDERS_PK
    ).select("o_orderkey")


def q_reconcile_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J3 — repair set: missing ∪ mismatched (origin wins; no writetime col here)
    return jn.reconcile(_origin(spark, sf_dir), _target(spark, sf_dir), ORDERS_PK)


def q_bucket_count_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J5
    return jn.per_bucket_count_compare(
        _origin(spark, sf_dir), _target(spark, sf_dir), "o_orderkey", 32
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators: text analysis, dedup, similarity,
# multimodal plumbing
# ---------------------------------------------------------------------------


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.text import token_count

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.text import quality_features

    return quality_features(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "text"
    ).drop("text")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.text import lang_id

    return lang_id(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "text"
    ).select("doc_id", "predicted_lang")


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.text import fingerprint

    return fingerprint(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "text"
    ).select("doc_id", "fingerprint")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.dedup import dedup_exact

    return dedup_exact(load_table(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.dedup import minhash_signatures

    return minhash_signatures(
        load_table(spark, sf_dir, "documents"), n=3, num_hashes=4
    )


def q_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(load_table(spark, sf_dir, "documents"), n=3, num_hashes=4)
    return lsh_candidate_pairs(sigs, num_hashes=4, band_size=2)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.dedup import simhash

    return simhash(load_table(spark, sf_dir, "documents"))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return cosine_topk(emb, qv, k=10, exclude_ids=[0])


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.similarity import all_pairs_cosine

    return all_pairs_cosine(load_table(spark, sf_dir, "embeddings"), threshold=0.45)


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    # α-sampling domain mixture (n_i^α weighting): events by type —
    # a skewed natural distribution — at α=0.5, target 30% of the
    # corpus; admission is an integer-e6 rate compare on md5 draws so
    # the SELECTED SET is engine-exact
    from cassandra_data_migration_spark.operators.sampling import (
        temperature_mixture,
    )

    return temperature_mixture(
        load_table(spark, sf_dir, "events"),
        group_col="event_type",
        id_col="event_id",
        alpha=0.5,
        target_fraction=0.3,
    )


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # embedding-level benchmark decontamination: every 20th vector is
    # the held-out eval set (broadcast matrix), the rest is the corpus
    # streaming through one BLAS block-matmul per Arrow batch
    from cassandra_data_migration_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.pmod("vec_id", F.lit(20)) == 0)
    corpus = emb.filter(F.pmod("vec_id", F.lit(20)) != 0)
    return semantic_decontaminate(corpus, bench, threshold=0.4)


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # skew-salted big-big equi-join: result identical to the plain
    # join (the oracle), physically spread over (key, salt) partitions
    from cassandra_data_migration_spark.operators.joins import salted_equi_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    return (
        salted_equi_join(li, orders, "o_orderkey", num_salts=8)
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the full near-dup pipeline: MinHash sigs → LSH banding → exact
    # Jaccard verify on candidates only (sub-quadratic end to end)
    from cassandra_data_migration_spark.operators.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(
        load_table(spark, sf_dir, "documents"),
        n=3,
        num_hashes=4,
        band_size=2,
        jaccard_threshold=0.5,
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF ANN, full-probe mode: probing all 16 inverted lists is exactly
    # brute force, so the whole assign→probe→score path oracle-checks
    # against the exact top-k SQL.  The approximate path (n_probe < 16)
    # is covered by the recall-floor test in
    # tests/test_training_data_ops.py — approximate-by-design results
    # don't belong in the exact-oracle gate.
    from cassandra_data_migration_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_topk(emb, qv, k=10, n_centroids=16, n_probe=16)


def q_ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # random-hyperplane LSH buckets → same-bucket exact-cosine verify;
    # hyperplanes are hash-derived so the oracle regenerates them in SQL
    from cassandra_data_migration_spark.operators.similarity import lsh_bucketed_pairs

    return lsh_bucketed_pairs(
        load_table(spark, sf_dir, "embeddings"),
        dim=64,
        threshold=0.3,
        num_planes=4,
        seed=42,
    )


def q_rp_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Johnson-Lindenstrauss random projection 64→8 dims: the cheap ANN
    # front-tier; hash-derived projection matrix so the oracle
    # regenerates it, e4-rounded components for cross-engine parity
    from cassandra_data_migration_spark.operators.similarity import rp_project

    return rp_project(
        load_table(spark, sf_dir, "embeddings"), in_dim=64, out_dim=8, seed=7
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(docs).select("doc_id", "n_bytes", "content_md5")


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # near-dup pairs → transitive closure: min-label propagation as a
    # driver-side loop over distributed joins (operators/graph.py);
    # the DuckDB oracle is the same fixpoint via a recursive CTE
    from cassandra_data_migration_spark.operators.graph import dup_clusters

    return dup_clusters(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


def q_hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stable train/val/test assignment: membership is a pure function
    # of the row id (survives repartitioning and corpus growth)
    from cassandra_data_migration_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.sampling import hash_sample

    return hash_sample(
        load_table(spark, sf_dir, "documents"), "doc_id", 0.25, salt="sample"
    ).select("doc_id")


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dataset-mixture assembly: per-source rates, independent draws
    from cassandra_data_migration_spark.operators.sampling import (
        weighted_mixture,
    )

    docs = load_table(spark, sf_dir, "documents")
    short = docs.filter(F.length("text") < 330)
    long_ = docs.filter(F.length("text") >= 330)
    return weighted_mixture(
        [("short", short, 0.9), ("long", long_, 0.3)], "doc_id"
    ).select("doc_id", "source")


def q_group_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # leakage-safe split: keyed on the GROUP (source), so every doc of
    # a provenance lands on one side — near-dups within a source can
    # never straddle train/eval
    from cassandra_data_migration_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(
        docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="grp"
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
    )


def q_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # contrastive negative sampling: 3 deterministic never-self
    # partners per anchor, drawn row-locally (dense-id arithmetic);
    # the only shuffle is the join attaching partner payload
    from cassandra_data_migration_spark.operators.sampling import negative_samples

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    pairs = negative_samples(docs, "doc_id", corpus_size=n, k=3)
    partner = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    return pairs.join(partner, "neg_id").select(
        "doc_id", "neg_ix", "neg_id", "neg_source"
    )


def q_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher duplicate-ngram-fraction filter: share of 3-gram
    # occurrences that repeat an earlier one — catches docs cycling
    # through many repeated phrases, scan-side and shuffle-free
    from cassandra_data_migration_spark.operators.text import dup_ngram_fraction

    return dup_ngram_fraction(load_table(spark, sf_dir, "documents"))


def q_zipf_head_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus QC one-liner: what fraction of all token occurrences the
    # top-100 terms cover — natural text ~0.4-0.6, template spam → 1.0
    from cassandra_data_migration_spark.operators.text import zipf_head_coverage

    return zipf_head_coverage(load_table(spark, sf_dir, "documents"))


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # winnowing (MOSS) local fingerprints: any shared substring of
    # length >= k+window-1 across docs yields a shared fingerprint —
    # substring-level dedup keys, one scan-stage expression chain
    from cassandra_data_migration_spark.operators.text import winnow_fingerprints

    fps = winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    return fps.select("doc_id", F.explode("fingerprints").alias("fp"))


def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # suffix-array-style EXACT substring dedup (Lee et al. 2022):
    # per-doc coverage of word sequences >= 5 tokens that occur twice
    # anywhere in the corpus — k-gram postings + interval union, the
    # distributed equivalent of the SA adjacent-LCP test
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    return substring_dup_spans(load_table(spark, sf_dir, "documents"), k=5)


def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T5 denoising data prep: seeded 15% token mask, runs collapsed to
    # numbered sentinels, masked runs emitted as the target sequence —
    # deterministic (md5 coin), so re-runs are byte-identical
    from cassandra_data_migration_spark.operators.text import span_corrupt

    return span_corrupt(load_table(spark, sf_dir, "documents"), density=0.15)


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DPO/RLHF data prep: per source, pair i-th best with i-th worst
    # by the scalar quality score, strict-positive margin only — two
    # row_number windows share one exchange, join input is 2k rows/group
    from cassandra_data_migration_spark.operators.sampling import preference_pairs
    from cassandra_data_migration_spark.operators.text import quality_score_e6

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score_e6(docs).select("doc_id", "source", "quality_e6x10")
    return preference_pairs(
        scored, "quality_e6x10", group_col="source", id_col="doc_id", k=5
    )


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bigram LM scoring: conditional p(w2|w1) punishes improbable token
    # ORDER (shuffled/boilerplate text), one rung up from the unigram
    # perplexity proxy; integer e6 sums keep it engine-exact
    from cassandra_data_migration_spark.operators.text import bigram_logprob

    return bigram_logprob(load_table(spark, sf_dir, "documents"))


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # end-to-end curation pipeline: quality gate → exact-dedup keep
    # canonical → stable split → per-split stats, one composed plan
    from cassandra_data_migration_spark.operators.dedup import dedup_exact
    from cassandra_data_migration_spark.operators.sampling import hash_split
    from cassandra_data_migration_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    qf = quality_features(docs).filter(
        (F.col("n_tokens") >= 20) & (F.col("stopword_ratio") >= 0.02)
    )
    canon = (
        dedup_exact(docs)
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .select("doc_id")
    )
    kept = qf.join(canon, "doc_id")
    return (
        hash_split(kept, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # context-length chunking: corpus → fixed-token-budget sequences
    from cassandra_data_migration_spark.operators.text import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=32
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pattern redaction (PII-scrub shape) + per-doc audit count
    from cassandra_data_migration_spark.operators.text import redact

    return redact(
        load_table(spark, sf_dir, "documents"),
        pattern=r"\bcustomer\b",
        replacement="<ENTITY>",
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-k per group: the per-partition LIMIT k read as a window rank
    from cassandra_data_migration_spark.operators.windows import top_k_per_key

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return top_k_per_key(
        docs, ["lang"], "n_chars", k=3, descending=True, tiebreak=["doc_id"]
    )


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-label embedding centroids via exact decimal sums (order-
    # independent, so bit-identical across engines and partitionings)
    from cassandra_data_migration_spark.operators.similarity import (
        label_centroids,
    )

    return label_centroids(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# file staging (S4-S8), Migrate pipeline (S10/T4/T5), reconciliation
# extras (J3+LWW, U2, Z3, Z8), scalar/metadata extras (F9, F13, counters)
# ---------------------------------------------------------------------------


def q_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hive-partitioned layout + partition pruning: events land in
    # event_type=... directories; the filter prunes 4/5 of the data at
    # planning time (PartitionFilters — zero I/O for other types), then
    # a decimal-exact per-user aggregate runs over the survivors
    import tempfile

    from cassandra_data_migration_spark.sources.tables import (
        load_partitioned,
        write_partitioned,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    d = tempfile.mkdtemp(prefix="part_ev_")
    write_partitioned(ev, f"{d}/events_part", ["event_type"])
    clicks = load_partitioned(spark, f"{d}/events_part").filter(
        F.col("event_type") == "click"
    )
    return clicks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum(F.col("value").cast("decimal(20,6)")), 4)
        .cast("double")
        .alias("click_value"),
    )


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # metadata-only COUNT/MIN/MAX from parquet footers (DSv2 aggregate
    # pushdown) — the table-size probe CDM runs before sizing numParts
    from cassandra_data_migration_spark.sources.tables import fast_table_stats

    # numeric/date columns only: parquet footer min/max stats don't
    # cover timestamps or strings, so those would force a data read
    return fast_table_stats(
        spark, sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]
    )


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S4+S5: COPY TO / COPY FROM — export then re-import must be lossless
    import tempfile

    from cassandra_data_migration_spark.sources.files import csv_export, csv_import

    n = load_table(spark, sf_dir, "nation")
    d = tempfile.mkdtemp(prefix="csv_rt_")
    csv_export(n, f"{d}/nation_csv")
    return csv_import(spark, f"{d}/nation_csv", schema=n.schema)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S6-adjacent: columnar ORC staging (Hive/Trino interchange) —
    # export then re-import must be lossless; aggregate proves values,
    # not just row counts, survived
    import tempfile

    from cassandra_data_migration_spark.sources.files import orc_export, orc_import

    s = load_table(spark, sf_dir, "supplier")
    d = tempfile.mkdtemp(prefix="orc_rt_")
    orc_export(s, f"{d}/supplier_orc")
    back = orc_import(spark, f"{d}/supplier_orc", schema=s.schema)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("sum_acctbal"),
    )


def q_csv_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S8: compressed staging (dsbulk --connector.csv.compression gzip)
    import tempfile

    from cassandra_data_migration_spark.sources.files import csv_export, csv_import

    r = load_table(spark, sf_dir, "region")
    d = tempfile.mkdtemp(prefix="csv_gz_")
    csv_export(r, f"{d}/region_csv", delimiter="|", compression="gzip")
    return csv_import(spark, f"{d}/region_csv", schema=r.schema, delimiter="|")


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S6: dsbulk unload/load --connector.name json
    import tempfile

    from cassandra_data_migration_spark.sources.files import json_export, json_import

    s = load_table(spark, sf_dir, "supplier")
    d = tempfile.mkdtemp(prefix="json_rt_")
    json_export(s, f"{d}/supplier_json")
    return json_import(spark, f"{d}/supplier_json", schema=s.schema).select(*s.columns)


def q_csv_import_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S5+T3: maxErrors semantics — malformed rows are dropped, the load
    # survives (docs/03-dse-tooling.md:217-228).  Every 7th key's
    # c_acctbal is corrupted before staging; import drops exactly those.
    import tempfile

    from cassandra_data_migration_spark.sources.files import csv_export, csv_import

    c = load_table(spark, sf_dir, "customer")
    staged = c.withColumn(
        "c_acctbal",
        F.when(F.pmod("c_custkey", F.lit(7)) == 0, F.lit("NOT_A_NUMBER")).otherwise(
            F.col("c_acctbal").cast("string")
        ),
    )
    d = tempfile.mkdtemp(prefix="csv_bad_")
    csv_export(staged, f"{d}/customer_csv")
    return csv_import(spark, f"{d}/customer_csv", schema=c.schema, max_errors=10**9)


def q_migrate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S10: the flagship Migrate job — read origin, feature pipeline
    # (projection + predicate + constant column), write target, read it
    # back (lab/exercises/04-cdm-migration.md:116-124)
    import tempfile

    from cassandra_data_migration_spark.plans.migrate import (
        MigrationConfig,
        migrate,
    )

    d = tempfile.mkdtemp(prefix="migrate_")
    cfg = MigrationConfig(
        origin_path=f"{sf_dir}/customer.parquet",
        target_path=f"{d}/customer_target",
        include_columns=["c_custkey", "c_name", "c_acctbal"],
        where_condition="c_acctbal > 5000",
        constant_columns={"source_cluster": "origin"},
        batch_partition_cols=["c_custkey"],
    )
    migrate(spark, cfg)
    return spark.read.parquet(cfg.target_path)


def q_migrate_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S10 at bulk scale: migrate the LARGEST fixture table (lineitem —
    # 600K rows at sf0.1) with projection + constant column; this is
    # the query whose rows/sec lands in BENCH as migrate_rows_per_sec,
    # the direct comparable to BASELINE.md's DSBulk/CDM tiers
    import tempfile

    from cassandra_data_migration_spark.plans.migrate import (
        MigrationConfig,
        migrate,
    )

    d = tempfile.mkdtemp(prefix="migrate_bulk_")
    cfg = MigrationConfig(
        origin_path=f"{sf_dir}/lineitem.parquet",
        target_path=f"{d}/lineitem_target",
        include_columns=[
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        ],
        constant_columns={"source_cluster": "origin"},
        batch_size=5,
    )
    migrate(spark, cfg)
    return spark.read.parquet(cfg.target_path)


def q_migrate_dry_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T4: --dryRun — plan + count, no write
    import tempfile

    from cassandra_data_migration_spark.plans.migrate import (
        MigrationConfig,
        migrate,
    )

    cfg = MigrationConfig(
        origin_path=f"{sf_dir}/orders.parquet",
        target_path=tempfile.mkdtemp(prefix="dryrun_") + "/never_written",
        where_condition="o_orderstatus = 'O'",
        dry_run=True,
    )
    res = migrate(spark, cfg)
    return spark.createDataFrame(
        [(res.rows_read, res.rows_written)],
        "rows_read long, rows_written long",
    )


def q_run_tracker_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T5: trackRun/autoRerun — buckets 0-3 already PASSED (3 after a
    # FAILED attempt), so the resumed scan covers only buckets 4-7
    import tempfile

    from cassandra_data_migration_spark.plans.tracker import RunTracker

    tracker = RunTracker(spark, tempfile.mkdtemp(prefix="track_"), num_buckets=8)
    run_id = tracker.new_run()
    for b in (0, 1, 2):
        tracker.record_bucket(run_id, b, "PASSED", rows=100)
    tracker.record_bucket(run_id, 3, "FAILED")
    tracker.record_bucket(run_id, 3, "PASSED", rows=100)
    return tracker.filter_pending(
        load_table(spark, sf_dir, "orders"), "o_orderkey", run_id
    )


def q_lab_migration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §3.2 end-to-end lab parity: migrate all four training-table
    # analogues (user_activity carries a derived row writetime through
    # the pipeline), then per-table count check + deterministic 100-row
    # sample probe — one PASS/FAIL row per table, the exact report
    # shape of validate_migration.py:69-81
    from cassandra_data_migration_spark.plans.lab import lab_migration_report

    return lab_migration_report(spark, sf_dir)


def q_paged_fetch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S3 paged fetch (fetchSizeInRows analogue): stream the customer
    # table through the bounded-memory page iterator and re-aggregate —
    # every page but the last is exactly full, page count = ceil(n/p),
    # and the key checksum proves no row was dropped or duplicated
    from cassandra_data_migration_spark.sources.tables import paged_fetch

    df = load_table(spark, sf_dir, "customer").select("c_custkey")
    sizes: list[int] = []
    key_sum = 0
    for page in paged_fetch(df, page_size=100):
        sizes.append(len(page))
        key_sum += sum(r.c_custkey for r in page)
    out = spark.createDataFrame(
        list(enumerate(sizes)), "page_id long, page_rows long"
    )
    return out.select(
        "page_id",
        "page_rows",
        F.lit(sum(sizes)).cast("long").alias("total_rows"),
        F.lit(key_sum).cast("long").alias("total_key_sum"),
    )


def q_lww_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z3: last-write-wins upsert — incoming rows (every 3rd key) carry a
    # newer writetime and overwrite; everything else keeps current
    from cassandra_data_migration_spark.streaming.lww import lww_merge

    o = load_table(spark, sf_dir, "orders")
    current = o.select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderkey") * 2).cast("long").alias("_writetime"),
    )
    incoming = (
        o.filter(F.pmod("o_orderkey", F.lit(3)) == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 10).alias("o_totalprice"),
            (F.col("o_orderkey") * 2 + 1).cast("long").alias("_writetime"),
        )
    )
    return lww_merge(current, incoming, ["o_orderkey"])


def q_autocorrect_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J3 full form: AutoCorrect repaired target — insert missing,
    # overwrite mismatches where origin wins on writetime, never delete
    from cassandra_data_migration_spark.plans.validate import autocorrect

    origin = _origin(spark, sf_dir).withColumn(
        "_writetime", F.lit(1000).cast("long")
    )
    target = _target(spark, sf_dir).withColumn(
        "_writetime",
        F.when(F.pmod("o_orderkey", F.lit(14)) == 0, F.lit(2000))
        .otherwise(F.lit(500))
        .cast("long"),
    )
    return autocorrect(origin, target, ORDERS_PK, writetime_col="_writetime")


def q_writetime_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F13: transform.custom.writetime.incrementBy
    from cassandra_data_migration_spark.functions.metadata import (
        attach_derived_writetime,
        shift_writetime,
    )

    ev = attach_derived_writetime(load_table(spark, sf_dir, "events"), "ts")
    return shift_writetime(ev, 1_000_000).select("event_id", "_writetime")


def q_counter_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §1.2 counters: counter-table migration = sum() merge of increments
    # per key (docs/04-cdm-approach.md:401-411)
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 0).cast("long").alias("counter_value"))
    )


def q_order_items_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F9: collection construction — per-order sorted item list (the
    # orders.items list<text> shape, generate_data.py:116)
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("l_partkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("items")
        )
    )


def q_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F11: CDM explodeMap — map column → one row per entry
    from cassandra_data_migration_spark.functions.scalars import (
        explode_map,
        json_get,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.create_map(
            F.lit("event_type"),
            F.col("event_type"),
            F.lit("k"),
            json_get("props", "k"),
        ).alias("props_map"),
    )
    return explode_map(ev, "props_map")


def q_alert_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z8: threshold alerting — 1-hour windows whose error count breaches
    # the limit become alert rows (exercise 6:455-497)
    from cassandra_data_migration_spark.streaming.metrics import (
        alert_filter,
        windowed_error_rate,
    )

    windowed = windowed_error_rate(
        load_table(spark, sf_dir, "events"), window="1 hour", watermark="2 hours"
    )
    return alert_filter(windowed, "errors", 5.0, "error_count_breach").select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "errors",
        "alert",
    )


def q_fk_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4: FK enrichment with an explicitly broadcast dimension
    from cassandra_data_migration_spark.operators.joins import fk_generate_join

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return fk_generate_join(orders, dim, "c_custkey").select(
        "o_orderkey", "c_custkey", "c_name", "c_mktsegment"
    )


def q_write_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T2: CDM batchSize as a declarative assignment — rows grouped into
    # UNLOGGED-BATCH-sized chunks within their partition-key group
    # (cdm.properties:28); md5-ranked so the oracle reproduces it
    from cassandra_data_migration_spark.plans.throttle import assign_write_batches

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return assign_write_batches(
        orders, ["o_custkey"], ["o_orderkey"], batch_size=5
    )


def q_writetime_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §1.1/F10: ttlwritetime.calc.useCollections
    # (docs/04-cdm-approach.md:830) — per-cell writetimes collapse to
    # the row max, excluding collection cells by default and including
    # them when the flag is set; both variants in one result row
    from cassandra_data_migration_spark.functions.metadata import collapse_writetime

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.array(F.col("o_orderpriority")).alias("tags"),
        (F.col("o_orderkey") * 1_000_000 + 1)
        .cast("long")
        .alias("o_totalprice_writetime"),
        (F.col("o_orderkey") * 1_000_000 + 2).cast("long").alias("tags_writetime"),
    )
    no_coll = collapse_writetime(base, use_collections=False).withColumnRenamed(
        "_writetime", "wt_no_collections"
    )
    both = collapse_writetime(no_coll, use_collections=True).withColumnRenamed(
        "_writetime", "wt_with_collections"
    )
    return both.select("o_orderkey", "wt_no_collections", "wt_with_collections")


def q_schema_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U2: normalized schema diff between origin and a target missing a
    # column (exercise 6:187-233)
    from cassandra_data_migration_spark.plans.validate import schema_diff

    c = load_table(spark, sf_dir, "customer")
    return schema_diff(c, c.drop("c_acctbal"))


def q_sample_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §3.2 layer 2: the reference's 100-row sampled spot-check
    # (validate_migration.py:42-66) as a deterministic md5-ranked
    # sample broadcast-probed into the target in one pass
    from cassandra_data_migration_spark.plans.validate import sample_validate

    return sample_validate(
        _origin(spark, sf_dir), _target(spark, sf_dir), ORDERS_PK, n=100
    )


def q_validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §3.2 layers 1-3 in one verdict row (validate_migration.py:69-81)
    from cassandra_data_migration_spark.plans.validate import validate_table

    res = validate_table(
        _origin(spark, sf_dir), _target(spark, sf_dir), ORDERS_PK, "orders"
    )
    return spark.createDataFrame(
        [
            (
                res.table,
                res.origin_count,
                res.target_count,
                res.missing,
                res.mismatched,
                res.extra_in_target,
                res.status,
            )
        ],
        "table_name string, origin_count long, target_count long, "
        "missing long, mismatched long, extra_in_target long, status string",
    )


def q_latency_harness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A5: test_read_performance.sh:14-47 — total ms, avg ms/req, req/s
    # per endpoint (event_type stands in for the endpoint label)
    ev = load_table(spark, sf_dir, "events")
    span = F.col("max_us") - F.col("min_us")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.sum("value"), 4).alias("total_ms"),
            F.round(F.avg("value"), 4).alias("avg_ms"),
            F.count(F.lit(1)).alias("n_requests"),
            F.unix_micros(F.min("ts")).alias("min_us"),
            F.unix_micros(F.max("ts")).alias("max_us"),
        )
        .select(
            "event_type",
            "total_ms",
            "avg_ms",
            "n_requests",
            F.round(F.col("n_requests") / (span / 1e6), 6).alias("req_per_sec"),
        )
    )


def q_continuous_validation_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z7: the 60s re-validation loop (exercise 6:410-449), two ticks
    # against a materialized target; each tick re-runs the J1/J2 plan
    import tempfile

    from cassandra_data_migration_spark.streaming.continuous_validate import (
        continuous_validation,
    )

    d = tempfile.mkdtemp(prefix="contval_")
    _target(spark, sf_dir).write.mode("overwrite").parquet(f"{d}/target")
    results = continuous_validation(
        spark,
        f"{sf_dir}/orders.parquet",
        f"{d}/target",
        ORDERS_PK,
        interval_secs=0.0,
        max_ticks=2,
    )
    return spark.createDataFrame(
        [
            (r.table, r.origin_count, r.target_count, r.missing, r.mismatched, r.status)
            for r in results
        ],
        "tick string, origin_count long, target_count long, "
        "missing long, mismatched long, status string",
    )


def q_observe_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A9: migration progress counters via observe() — rows processed and
    # error rows metered as the job runs (docs/04-cdm-approach.md:536-544)
    from pyspark.sql import Observation

    obs = Observation("progress")
    ev = load_table(spark, sf_dir, "events").observe(
        obs,
        F.count(F.lit(1)).alias("rows_processed"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "error_rows"
        ),
    )
    ev.write.format("noop").mode("overwrite").save()
    got = obs.get
    return spark.createDataFrame(
        [(got["rows_processed"], got["error_rows"])],
        "rows_processed long, error_rows long",
    )


def q_traffic_ops_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z6: deterministic op-mix assignment + end-of-run report — draws
    # are md5-derived, so the oracle regenerates the whole mix in SQL
    from cassandra_data_migration_spark.streaming.traffic import (
        assign_ops,
        traffic_report,
    )

    ops = assign_ops(load_table(spark, sf_dir, "events"), id_col="event_id")
    return traffic_report(ops)




register_queries(globals())
__all__ = export_all(globals())
