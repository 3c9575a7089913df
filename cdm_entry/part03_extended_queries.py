"""Extended operator queries: functions, windows, throttle/batch, text/dedup/similarity families (registration block B).

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part02_core_queries import *  # noqa: F401,F403

def q_part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4+A-family over the part dimension: revenue per part type via a
    # broadcast dimension join (TPC-H Q14 shape) — exercises every
    # remaining fixture table and the fact-side shuffle-free join
    from cassandra_data_migration_spark.operators.joins import fk_generate_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        fk_generate_join(li, part, "p_partkey")
        .groupBy("p_type")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F10/§1.1: TTL semantics — rows whose writetime+TTL elapsed are
    # dropped; NULL TTL never expires.  TTLs derived deterministically.
    from cassandra_data_migration_spark.functions.metadata import (
        attach_derived_writetime,
        expire_ttl,
    )

    ev = attach_derived_writetime(load_table(spark, sf_dir, "events"), "ts")
    ev = ev.withColumn(
        "_ttl",
        F.when(F.pmod("event_id", F.lit(10)) == 0, F.lit(None))
        .otherwise(F.pmod("event_id", F.lit(100)) * 3600)
        .cast("int"),
    )
    return expire_ttl(ev, now_us=1706000000000000).select(
        "event_id", "_writetime", "_ttl"
    )


def q_null_unset_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §1.1 null→UNSET (docs/04-cdm-approach.md:833): mark which cells
    # are set so the sink skips unset cells instead of writing
    # tombstones.  Nulls injected deterministically.
    from cassandra_data_migration_spark.functions.metadata import unset_nulls_mask

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.pmod("o_orderkey", F.lit(5)) == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.pmod("o_orderkey", F.lit(3)) == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return unset_nulls_mask(o, ["o_orderstatus", "o_orderpriority"]).select(
        "o_orderkey", "_set_mask"
    )


def q_custom_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F12: spark.cdm.transform.custom.class — an arbitrary DataFrame →
    # DataFrame stage in the feature pipeline (here: PII anonymization)
    from cassandra_data_migration_spark.plans.migrate import (
        MigrationConfig,
        build_feature_pipeline,
    )

    def anonymize(df: DataFrame) -> DataFrame:
        return df.withColumn("c_name", F.md5("c_name"))

    cfg = MigrationConfig(
        origin_path="",
        target_path="",
        include_columns=["c_custkey", "c_name", "c_mktsegment"],
        custom_transforms=[anonymize],
    )
    out, _ = build_feature_pipeline(load_table(spark, sf_dir, "customer"), cfg)
    return out


def q_read_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z2/Z4: phase-driven read routing — SHADOW_READS phase answers from
    # the primary (origin) and meters an async comparison against the
    # secondary; the caller only ever sees primary rows
    from cassandra_data_migration_spark.streaming.routing import (
        PhaseMachine,
        RouterMetrics,
    )

    machine = PhaseMachine()
    machine.advance()  # backfill
    machine.advance()  # shadow reads
    metrics = RouterMetrics()
    router = machine.router(metrics)
    result = router.route(
        _origin(spark, sf_dir),
        _target(spark, sf_dir),
        lambda df: df.filter(F.col("o_totalprice") > 450000),
    )
    assert metrics.shadow_reads == 1  # the secondary WAS consulted
    return result


def q_uuid_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1: uuid() — the deterministic md5-derived canonical-36-char form
    # used by the seeded generator (generate_data.py:41 analogue)
    from cassandra_data_migration_spark.generate import _uuid_from

    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", _uuid_from(42, "c_custkey").alias("user_uuid")
    )


def q_synthetic_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S11: seeded synthetic generation (generate_data.py:29-66) — every
    # draw is md5-derived, so the oracle regenerates the TABLE in SQL
    # (value-checked generation, not just row counts)
    from cassandra_data_migration_spark.generate import generate_users

    return (
        generate_users(spark, count=200, seed=42)
        .withColumn("prefs_json", F.to_json("preferences"))
        .drop("preferences")
    )


# ---------------------------------------------------------------------------
# streaming operators (Z1-Z8), driven bounded via availableNow triggers
# ---------------------------------------------------------------------------


def _events_stream(spark: SparkSession, sf_dir: str):
    """events as a file-backed mutation stream, normalizing ``ts`` to a
    µs timestamp exactly like the batch loader (older fixture drops
    store ns-longs, newer ones TIMESTAMP_NTZ)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # glob, not a bare file path: the file stream source requires its
    # basePath to be a directory
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    dtype = dict(stream.dtypes)["ts"]
    if dtype == "bigint":
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype.startswith("timestamp_ntz"):
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def q_stream_dual_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z1: mutation stream → foreachBatch dual sink; returns the origin
    # sink contents (must equal the full mutation set)
    import tempfile

    from cassandra_data_migration_spark.streaming.dual_write import (
        dual_write_stream,
        read_sink,
    )

    d = tempfile.mkdtemp(prefix="dualwrite_")
    stream = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = dual_write_stream(stream, f"{d}/origin", f"{d}/target", f"{d}/ckpt")
    await_or_raise(q, 300)
    origin = read_sink(spark, f"{d}/origin")
    target = read_sink(spark, f"{d}/target")
    # both sinks must agree before we hand the result back
    assert origin.count() == target.count()
    return origin


def q_stream_windowed_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z5/A7 streaming form: watermarked tumbling-window counts per type,
    # complete-mode memory sink; bounded via availableNow
    import uuid as _uuid

    from cassandra_data_migration_spark.streaming.metrics import windowed_ops

    name = f"winops_{_uuid.uuid4().hex[:8]}"
    windowed = windowed_ops(_events_stream(spark, sf_dir), window="5 minutes")
    q = (
        windowed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    return spark.sql(f"SELECT * FROM {name}")


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gap-based sessionization of the events stream (8h idle gap —
    # median inter-event gap in the synthetic table is ~7.3h, so
    # sessions are non-trivial in both directions)
    from cassandra_data_migration_spark.operators.windows import sessionize

    return sessionize(
        load_table(spark, sf_dir, "events"), gap_seconds=28800
    )


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher-style repetition quality signals over documents
    from cassandra_data_migration_spark.operators.text import repetition_signals

    return repetition_signals(load_table(spark, sf_dir, "documents"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # train-test overlap scrub: benchmark = the md5-bucket<1000 (10%)
    # slice of documents, corpus = the rest; flag corpus docs sharing
    # any 3-gram with the benchmark
    from cassandra_data_migration_spark.operators.sampling import hash_bucket
    from cassandra_data_migration_spark.operators.text import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id", "bench")
    return decontaminate(
        docs.filter(bucket >= 1000), docs.filter(bucket < 1000), n=3
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup: coarse clusters (8 md5-seeded centroids), drop
    # within-cluster cosine>=0.45 near-dups, keep min-id reps
    from cassandra_data_migration_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), n_clusters=8, threshold=0.45
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous-ingestion dedup: the md5-bucket<5000 half is the
    # already-ingested corpus, the rest is the new batch — survivors
    # are batch docs whose fingerprint is unseen, min-id per fp
    from cassandra_data_migration_spark.operators.dedup import incremental_dedup
    from cassandra_data_migration_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id", "seen")
    return incremental_dedup(
        docs.filter(bucket >= 5000), docs.filter(bucket < 5000)
    )


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # int8 scalar-quantized ANN: rank by integer cosine over
    # symmetric SQ8 vectors (4x less scan bandwidth than float32)
    from cassandra_data_migration_spark.operators.similarity import quantized_topk

    return quantized_topk(
        load_table(spark, sf_dir, "embeddings"), query_id=0, k=10
    )


def q_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sketch-tier corpus profiling, contract-shaped as its ERROR-BOUND
    # AUDIT: the HLL++/percentile_approx estimates are engine-specific,
    # but their accuracy guarantees are not — the query verifies
    # |approx−exact| ≤ 3·rsd·exact and the approx-median's rank bound
    # engine-side and emits per-group booleans, which the SQL oracle
    # asserts exactly (all bounds hold ⇒ all TRUE).
    from cassandra_data_migration_spark.operators.aggregates import (
        sketch_profile_audit,
    )

    return sketch_profile_audit(load_table(spark, sf_dir, "documents"))


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-3 TF-IDF keywords per document (smoothed sklearn idf);
    # per-doc term histograms are folded scan-side, df + corpus size
    # re-enter via broadcast, one doc-keyed top-k window
    from cassandra_data_migration_spark.operators.text import tfidf_topk

    return tfidf_topk(load_table(spark, sf_dir, "documents"), k=3)


def q_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenizer-coverage signal: top-20 corpus vocabulary by frequency,
    # then each document's out-of-vocabulary token fraction
    from cassandra_data_migration_spark.operators.text import vocab_oov

    return vocab_oov(load_table(spark, sf_dir, "documents"), vocab_size=20)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # context-window packing: per-source token-budget bins from an
    # exclusive running sum (integer DIV — engine-exact)
    from cassandra_data_migration_spark.operators.text import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"), budget=512)


def q_bpe_pack_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenize→pack END TO END: learn 8 BPE merges on-cluster, price
    # every document in LEARNED-tokenizer tokens (per-word symbol
    # counts broadcast back over the corpus — the word table is the
    # Heaps'-law working set, never the corpus), then pack documents
    # into per-source 256-token context bins via the same exclusive
    # running sum as pack_sequences.  The oracle replays the identical
    # merges (pure-Python learner + sentinel-replace CTEs) and packs
    # with the same window arithmetic.
    from pyspark.sql import Window

    from cassandra_data_migration_spark.operators.bpe import bpe_train
    from cassandra_data_migration_spark.operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    _merges, segmented = bpe_train(docs, num_merges=8)
    wlen = segmented.select(
        "word", F.size("symbols").cast("bigint").alias("_w_tokens")
    )
    doc_words = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(normalize_text("text"), " ")).alias("word"),
    ).filter(F.col("word") != "")
    per_doc = (
        doc_words.join(F.broadcast(wlen), "word")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.sum("_w_tokens").alias("bpe_tokens"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_doc.withColumn(
            "_prev", F.coalesce(F.sum("bpe_tokens").over(w), F.lit(0))
        )
        .withColumn("bin_id", F.expr("_prev DIV 256"))
        .select("doc_id", "source", "bpe_tokens", "bin_id")
    )


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # engine-exact Lloyd k-means (k=8, 2 rounds + final assign):
    # e4 fixed-point assignment, DECIMAL-sum centroid updates — the
    # refinement behind the IVF/PQ/SemDeDup coarse quantizers; the
    # oracle replays the identical iterations as unrolled CTEs
    from cassandra_data_migration_spark.operators.similarity import kmeans_fit

    assigned, _ = kmeans_fit(
        load_table(spark, sf_dir, "embeddings"), k=8, iters=2, tier="arrow"
    )
    return assigned


def q_interval_session_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # point-in-interval join: each error event looks up the activity
    # session (built from non-error events) whose window contains it,
    # NULL when it falls in an idle gap — SCD-2-style validity lookup
    # in the linear union-window shape, not a quadratic range join
    from cassandra_data_migration_spark.operators.joins import interval_join
    from cassandra_data_migration_spark.operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(
        ev.filter(F.col("event_type") != "error"), gap_seconds=28800
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    out = interval_join(
        errors,
        sessions,
        on=["user_id"],
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
        payload_cols=["session_id", "n_events"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("session_id_iv").alias("session_id"),
        F.col("n_events_iv").alias("session_n_events"),
    )


def q_pivot_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cross-tab: docs per (source row, lang column) with an explicit
    # category list — same single map-combined aggregate as a grouped
    # count, schema independent of the data
    from cassandra_data_migration_spark.operators.aggregates import pivot_counts

    return pivot_counts(
        load_table(spark, sf_dir, "documents"),
        "source",
        "lang",
        ["en", "zh", "es", "de", "fr"],
    )


def q_length_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # equal-frequency length bucketing (NTILE) with a pinned total
    # order — the length-balancing signal for batch packing; per-tile
    # summary keeps the result small
    from cassandra_data_migration_spark.operators.windows import ntile_buckets

    docs = load_table(spark, sf_dir, "documents")
    tiled = ntile_buckets(docs, "n_chars", n=4, tiebreak_col="doc_id")
    return tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def q_rollup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hierarchical corpus profile: per-(lang, source) cells + lang
    # subtotals + grand total in ONE pass (Expand → single map-side
    # combined aggregate); grouping_id labels the level
    from cassandra_data_migration_spark.operators.aggregates import rollup_profile

    return rollup_profile(
        load_table(spark, sf_dir, "documents"), ["lang", "source"]
    )


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-customer cumulative revenue in (date, key) order; decimal
    # accumulation keeps the cumulative sum engine-exact
    from cassandra_data_migration_spark.operators.windows import running_total

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    return running_total(
        o.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        "o_custkey",
        ["o_orderdate", "o_orderkey"],
        "o_totalprice",
    ).select("o_custkey", "o_orderkey", "running_total")


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sub-document exact dedup (Lee et al. ExactSubstr shape): share of
    # each doc's 32-token chunks that appear verbatim in other docs —
    # catches boilerplate document-level dedup misses; shuffles carry
    # md5 chunk keys, never chunk text
    from cassandra_data_migration_spark.operators.text import chunk_dedup_signals

    return chunk_dedup_signals(load_table(spark, sf_dir, "documents"))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # language-rebalancing sample: per-stratum deterministic rates
    # (down-sample high-resource langs, keep low-resource) — one
    # scan-side predicate, membership a pure function of (lang, id)
    from cassandra_data_migration_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs,
        "lang",
        {"en": 0.3, "es": 0.6, "de": 0.6},
        "doc_id",
        default_fraction=1.0,
    )
    return out.select("doc_id", "lang")


def q_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    # backward as-of join: each error event picks up the user's most
    # recent click at-or-before it — union-window shape (one shuffle
    # per input on user_id), not a quadratic range join; oracle uses
    # DuckDB's native ASOF JOIN as an independent implementation
    from cassandra_data_migration_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        errors,
        clicks,
        on=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "value", "ts"],
        tiebreak_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_matched").alias("click_event_id"),
        F.col("value_matched").alias("click_value"),
        (F.unix_micros("ts") - F.unix_micros("ts_matched")).alias("gap_us"),
    )


_PQ_CB_CACHE: dict[str, list] = {}


def _pq_inputs(spark: SparkSession, sf_dir: str):
    from cassandra_data_migration_spark.operators.similarity import pq_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    # the codebook is a deterministic pure function of the fixture
    # table — memoize the collect so encode and ADC search don't each
    # pay the TakeOrdered job
    cb = _PQ_CB_CACHE.get(sf_dir)
    if cb is None:
        cb = _PQ_CB_CACHE[sf_dir] = pq_codebook(emb, n_centroids=32)
    return emb, cb


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # product-quantization encode: 64-dim float32 → 8 subspace codes
    # (8 bytes/vector, 32x compression); nearest-centroid per subspace
    # compared as e4 fixed-point integers, ties to the smallest id —
    # engine-exact, scan-side, no UDF
    from cassandra_data_migration_spark.operators.similarity import pq_encode

    emb, cb = _pq_inputs(spark, sf_dir)
    # arrow tier: bit-identical to the SQL fold (tests/test_fast_tiers)
    # at vectorized-numpy speed; the oracle still mirrors the SQL form
    return pq_encode(emb, cb, tier="arrow").select(
        "vec_id", F.posexplode("codes").alias("j", "code")
    )


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PQ asymmetric-distance top-k: full-precision query scored
    # against 8-byte codes via a driver-built integer LUT — 8 lookups
    # per vector, shuffle-free TakeOrdered
    from cassandra_data_migration_spark.operators.similarity import pq_adc_topk

    emb, cb = _pq_inputs(spark, sf_dir)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    # arrow encode tier: bit-identical to the SQL fold
    # (tests/test_fast_tiers) at vectorized-numpy speed
    return pq_adc_topk(emb, qv, cb, k=10, exclude_ids=[0], tier="arrow")


def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FAISS-style IVF-PQ: integer-exact coarse routing (4 of 16 lists
    # probed) + oracle-exact PQ-ADC ranking of the probed lists only.
    # The full search — routing, assignment, shortlist, ADC order —
    # is deterministic, so the oracle replays it EXACTLY (approximate
    # vs brute force, but never approximate vs its own spec).
    from cassandra_data_migration_spark.operators.similarity import (
        ivf_pq_topk,
    )

    emb, cb = _pq_inputs(spark, sf_dir)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_pq_topk(
        emb, qv, cb, k=10, n_coarse=16, n_probe=4,
        exclude_ids=[0], tier="arrow",
    )


def q_throttle_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T1 rate limiting, declarative form: the per-worker admission
    # schedule (worker = PK hash, send_second = rank DIV per-worker
    # budget) aggregated to rows-per-second — pure row functions, so
    # the wall-clock limiter's plan is oracle-checkable
    from cassandra_data_migration_spark.plans.throttle import throttle_schedule

    sched = throttle_schedule(
        load_table(spark, sf_dir, "orders"),
        ["o_orderkey"],
        rows_per_sec_global=2000,
        num_workers=4,
    )
    return sched.groupBy("send_second").agg(
        F.count(F.lit(1)).alias("rows_sent"),
        F.countDistinct("worker").alias("n_workers"),
    )


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bloom-filter membership (the J1-at-scale pre-pass): fingerprint
    # the ordering-customer key set, probe every customer scan-side
    # via a 1-row broadcast bit array — no join shuffle; md5-derived
    # bits so the oracle rebuilds the identical filter
    from cassandra_data_migration_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    bloom = bloom_build(orders, "o_custkey")
    return bloom_might_contain(cust, bloom, "c_custkey").select(
        "c_custkey", "might_contain"
    )


def _docs_with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.web import (
        parse_url_parts,
        synthesize_url,
    )

    return parse_url_parts(synthesize_url(load_table(spark, sf_dir, "documents")))


def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # web-corpus keying: deterministic URL synthesis + built-in
    # parse_url split into protocol/host/domain/path/query — narrow
    # scan-side projection, no UDF
    return _docs_with_urls(spark, sf_dir).select(
        "doc_id", "protocol", "host", "domain", "path", "query_string"
    )


_HTML_WRAP_PARTS = (
    '<html><head><title>Page</title><style>body{font-size:10px}</style>'
    '</head><body><script type="text/javascript">var x = 1;</script><h1>',
    '</h1><br/><p>',
    '</p><!-- crawl footer --></body></html>',
)


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WARC-pipeline extraction stage: wrap each document in a full
    # HTML page (head/style/script/comment boilerplate), then strip it
    # back to visible text with the codegen'd regex chain — the oracle
    # runs the LITERALLY identical chain (generated from the same step
    # tables, html_strip_sql)
    from cassandra_data_migration_spark.operators.text import html_to_text

    a, b, c = _HTML_WRAP_PARTS
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(a), F.col("source"), F.lit(b), F.col("text"), F.lit(c)
    )
    return docs.select("doc_id", html_to_text(html).alias("extracted"))


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the web-scale front door end to end: synthesize 4 deterministic
    # .warc.gz files (each record its own gzip member, per spec) from
    # the documents fixture, read them back DISTRIBUTED (binaryFile →
    # one file per task → streaming parse), split HTTP headers off
    # response payloads, and extract page text — oracle recomputes
    # every column from the documents table
    import os as _os
    import tempfile

    from cassandra_data_migration_spark.operators.text import html_to_text
    from cassandra_data_migration_spark.sources.warc import (
        build_warc,
        read_warc,
    )

    rows = sorted(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select("doc_id", "source", "text")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    recs = [
        {
            "record_id": f"<urn:doc:{r['doc_id']}>",
            "warc_type": "response",
            "target_uri": f"http://example.org/{r['source']}/{r['doc_id']}",
            "warc_date": "2024-01-01T00:00:00Z",
            "http_status": 200,
            "http_content_type": "text/html; charset=utf-8",
            "payload": (
                f"<html><body><h1>{r['source']}</h1><p>{r['text']}</p>"
                "</body></html>"
            ).encode(),
        }
        for r in rows
    ]
    tmpd = tempfile.mkdtemp(prefix="warc_")
    per_file = (len(recs) + 3) // 4
    for i in range(4):
        chunk = recs[i * per_file : (i + 1) * per_file]
        if chunk:
            with open(_os.path.join(tmpd, f"part-{i}.warc.gz"), "wb") as f:
                f.write(build_warc(chunk))
    w = read_warc(spark, tmpd + "/*.warc.gz")
    return w.select(
        "target_uri",
        "warc_type",
        "http_status",
        "http_content_type",
        html_to_text(F.decode(F.col("payload"), "UTF-8")).alias("text"),
    )


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UT1-style safety gate: suffix-blocklisted domains (one exact
    # site, one whole TLD) + a URL pattern rule; survivors only.
    # Corpus text shuffles zero times — suffix explode → broadcast
    # semi join → id-keyed anti join
    from cassandra_data_migration_spark.operators.web import blocklist_filter

    docs = _docs_with_urls(spark, sf_dir).select("doc_id", "url")
    return blocklist_filter(
        docs,
        blocked_domains=["src3-site.com", "src7-site.org", "net"],
        blocked_patterns=[r"ref=r4$"],
    )


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # snapshot-drift monitor: PSI between the full events value
    # distribution and a skewed subsample (every 3rd user), fixed
    # 10-bin grid, Laplace-smoothed shares — the between-crawl
    # distribution check a corpus refresh signs off with
    from cassandra_data_migration_spark.operators.quality import psi_drift

    ev = load_table(spark, sf_dir, "events")
    return psi_drift(
        ev.select("value"),
        ev.filter(F.pmod("user_id", F.lit(3)) == 0).select("value"),
        "value",
        bins=10,
        lo=0.0,
        hi=500.0,
    )


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-domain corpus profile: one map-combined aggregation,
    # shuffle O(domains)
    from cassandra_data_migration_spark.operators.web import domain_stats

    return domain_stats(_docs_with_urls(spark, sf_dir))


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Common-Crawl-style per-domain cap: keep ≤5 docs per domain by a
    # deterministic md5 draw (stable across re-crawls and engines)
    from cassandra_data_migration_spark.operators.web import domain_quota_sample

    return domain_quota_sample(_docs_with_urls(spark, sf_dir), cap=5)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BM25 retrieval: top-10 documents for a 4-term query; per-term
    # scores are e6 fixed-point so the doc score is an exact integer
    # sum — scan-side scoring, broadcast stats, TakeOrdered top-k
    from cassandra_data_migration_spark.operators.text import bm25_topk

    return bm25_topk(
        load_table(spark, sf_dir, "documents"),
        query_terms=["spark", "join", "window", "vector"],
        k=10,
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet-style perplexity-proxy quality filter: top-50 unigram LM
    # with add-one smoothing, per-doc total/avg log-prob as exact e6
    # integer sums; LM re-enters as a 1-row broadcast map
    from cassandra_data_migration_spark.operators.text import unigram_logprob

    return unigram_logprob(load_table(spark, sf_dir, "documents"), vocab_size=50)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DSIR (Xie et al. 2023): top-100 raw docs by hashed-unigram
    # importance weight toward the English-document target
    # distribution; 64-bucket add-one models, exact e6 integer sums,
    # broadcast log-ratio map, TakeOrdered top-k
    from cassandra_data_migration_spark.operators.sampling import dsir_importance

    return dsir_importance(
        load_table(spark, sf_dir, "documents"),
        target_filter=F.col("lang") == "en",
        k=100,
        n_buckets=64,
    )


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet head/middle/tail tiering: per-language equal-frequency
    # thirds by unigram-LM per-token log-prob (deterministic NTILE
    # with doc_id tiebreak)
    from cassandra_data_migration_spark.operators.text import perplexity_buckets

    return perplexity_buckets(load_table(spark, sf_dir, "documents"), vocab_size=50)


def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet/RefinedWeb boilerplate scrub: 8-token chunks recurring in
    # >1 distinct doc are dropped corpus-wide, docs reassembled from
    # surviving chunks; frequency pass shuffles chunk hashes only
    from cassandra_data_migration_spark.operators.text import (
        strip_repeated_chunks,
    )

    return strip_repeated_chunks(
        load_table(spark, sf_dir, "documents"), chunk_tokens=8, max_docs=1
    )


_LINE_BOILER = "subscribe to our newsletter | terms of service | all rights reserved"

register_queries(globals())
__all__ = export_all(globals())
