"""Pipeline/composite queries: graph, lakehouse DML, sampling, multimodal, quality, retrieval (registration block C).

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part03b_extended_queries2 import *  # noqa: F401,F403

def q_stream_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous MV maintenance: the SAME deterministic changelog as
    # mv_incremental_refresh replayed in 3 micro-batch slices through
    # foreachBatch signed-delta merges — commutative deltas converge
    # to the batch answer under any slicing (same oracle)
    import tempfile

    from cassandra_data_migration_spark.operators.mv import mv_build
    from cassandra_data_migration_spark.streaming.mv import mv_maintain_stream

    # persist the 3-column projection: the view seed + three slice
    # writes re-scanned orders otherwise — four executions (the
    # stream_irate precedent, guide §5); unpersisted after the last
    # slice write below
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    ).persist()
    price = F.col("o_totalprice").cast("decimal(18,2)")
    base = o.filter(F.pmod("o_orderkey", F.lit(3)) != 0)
    inserts = o.filter(F.pmod("o_orderkey", F.lit(3)) == 0).select(
        "o_custkey",
        F.lit("I").alias("op"),
        F.lit(None).cast("decimal(18,2)").alias("before_v"),
        price.alias("after_v"),
    )
    deletes = base.filter(F.pmod("o_orderkey", F.lit(5)) == 0).select(
        "o_custkey",
        F.lit("D").alias("op"),
        price.alias("before_v"),
        F.lit(None).cast("decimal(18,2)").alias("after_v"),
    )
    updates = base.filter(
        (F.pmod("o_orderkey", F.lit(5)) != 0)
        & (F.pmod("o_orderkey", F.lit(7)) == 0)
    ).select(
        "o_custkey",
        F.lit("U").alias("op"),
        price.alias("before_v"),
        (price + F.lit(10)).cast("decimal(18,2)").alias("after_v"),
    )
    d = tempfile.mkdtemp(prefix="mv_stream_")
    view, src, ckpt = f"{d}/view", f"{d}/log", f"{d}/ckpt"
    mv_build(base, "o_custkey", "o_totalprice").write.parquet(view)
    inserts.repartition(1).write.parquet(src)
    deletes.repartition(1).write.mode("append").parquet(src)
    updates.repartition(1).write.mode("append").parquet(src)
    o.unpersist()
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = mv_maintain_stream(stream, view, "o_custkey", ckpt)
    await_or_raise(q, 300)
    return spark.read.parquet(view).select(
        "o_custkey",
        "n_rows",
        F.col("sum_val").cast("double").alias("sum_val"),
    )


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dataset-release versioning: added/removed/changed/unchanged
    # between two corpus snapshots by fingerprint full-outer join —
    # ids + 16-byte hashes shuffle, text never does
    from cassandra_data_migration_spark.operators.setops import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.pmod("doc_id", F.lit(10)) != 0)
    new = docs.filter(F.pmod("doc_id", F.lit(13)) != 0).withColumn(
        "text",
        F.when(
            F.pmod("doc_id", F.lit(7)) == 0,
            F.concat(F.col("text"), F.lit(" v2")),
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new)


def q_domain_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # degree-oriented triangle counting (Suri-Vassilvitskii): wedges
    # generated only at each triangle's min-(degree,id) vertex, closed
    # by one semi-join — O(m^1.5) wedges, hub-safe; local clustering
    # coefficient in integer micro-units
    from cassandra_data_migration_spark.operators.graph import domain_triangles

    return domain_triangles(load_table(spark, sf_dir, "documents"))


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # co-located bucketed join: both fact tables hash-bucketed on the
    # order key, so the join runs with zero Exchange (pinned by
    # tests/test_physical_plans.py); result equals the plain join
    from cassandra_data_migration_spark.sources.tables import (
        bucketed_join_revenue,
    )

    return bucketed_join_revenue(spark, sf_dir)


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # near-dup clusters → keep the highest-quality copy per cluster
    # (tie-break min id): the curation policy that preserves the best
    # duplicate instead of the arbitrary min-id one
    from cassandra_data_migration_spark.operators.graph import dedup_survivors

    return dedup_survivors(load_table(spark, sf_dir, "documents"))


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fraction of each doc's distinct 3-grams unseen anywhere else in
    # the corpus — boilerplate shows up as low novelty even below
    # pairwise dedup thresholds
    from cassandra_data_migration_spark.operators.dedup import ngram_novelty

    return ngram_novelty(load_table(spark, sf_dir, "documents"))


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream-static broadcast enrichment: events stream left-joined to
    # the customer dimension inside each micro-batch scan — no
    # stream-side shuffle, no state store; unmatched users keep NULLs
    import tempfile

    from cassandra_data_migration_spark.streaming.enrich import enrich_stream

    d = tempfile.mkdtemp(prefix="enrich_")
    stream = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    q = (
        enrich_stream(stream, dim, "user_id")
        .writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    return spark.read.parquet(f"{d}/out")


def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Morton (Z-order) clustering key over two quantized dimensions:
    # the multi-dim sort key that makes parquet min/max stats prune
    # range boxes on EITHER dimension (Delta/Iceberg's ZORDER BY)
    from cassandra_data_migration_spark.operators.layout import zorder_key

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.abs(F.col("user_id")) % 256).alias("x"),
        (F.abs(F.floor(F.col("value"))).cast("long") % 256).alias("y"),
    ).withColumn("zkey", zorder_key(["x", "y"], bits=8))


def q_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact integer Gram matrix of the e6-quantized embedding matrix:
    # Arrow-batched int64 GEMM partials per partition, one tiny
    # map-combined sum — the mapInPandas kernel is still bit-exact
    # against the SQL oracle because everything is integer
    from cassandra_data_migration_spark.operators.linalg import gram_matrix

    return gram_matrix(load_table(spark, sf_dir, "embeddings"), dim=64)


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cross-dataset contamination audit: distinct shared exact-dup
    # fingerprints per source pair
    from cassandra_data_migration_spark.operators.dedup import source_overlap

    return source_overlap(load_table(spark, sf_dir, "documents"))


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # declarative data-quality sign-off: row-local checks fold into
    # ONE scan aggregation, uniqueness adds one distinct, FK is a
    # broadcast anti-join — O(checks) report rows at any table size
    from cassandra_data_migration_spark.operators import quality as dq

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return dq.dq_report(
        orders,
        [
            dq.not_null("o_custkey"),
            dq.in_range("o_totalprice", 0.0, 1000000.0),
            dq.in_set("o_orderstatus", ["O", "F", "P"]),
            dq.matches("o_orderpriority", "^[0-9]-"),
            dq.expect(
                "finished_have_price",
                "o_orderstatus != 'F' OR o_totalprice > 0",
            ),
            dq.unique("o_orderkey"),
            dq.foreign_key("o_custkey", customer, "c_custkey"),
        ],
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3 shape: one fact-fact shuffle, broadcast customer dim,
    # TakeOrdered top-k — the join workout CQL cannot express
    from cassandra_data_migration_spark.operators.olap import shipping_priority

    return shipping_priority(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


def q_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 shape: whole dimension chain broadcasts; exchanges are
    # the fact-fact join and one tiny final aggregation
    from cassandra_data_migration_spark.operators.olap import (
        region_supplier_volume,
    )

    return region_supplier_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-type z-score outliers: DECIMAL-exact moment sums, broadcast
    # stats re-join, scan-side flagging
    from cassandra_data_migration_spark.operators.aggregates import (
        grouped_zscore_outliers,
    )

    return grouped_zscore_outliers(load_table(spark, sf_dir, "events"))


def q_trending_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-3 event types per hourly window (batch twin of the
    # streaming trending aggregation)
    from cassandra_data_migration_spark.operators.aggregates import (
        trending_per_window,
    )

    return trending_per_window(load_table(spark, sf_dir, "events"))


def q_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # capped inverted index: per-term doc freq + deterministic top-5
    # postings (array_sort'ed structs, never raw collect_list order)
    from cassandra_data_migration_spark.operators.text import inverted_postings

    return inverted_postings(load_table(spark, sf_dir, "documents"), k=5)


def q_retry_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # at-least-once cleanup: drop events within 60s of the previous
    # survivor per (user, type) — chained retries collapse to one
    from cassandra_data_migration_spark.operators.windows import retry_collapse

    return retry_collapse(
        load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "ts"
        ),
        tolerance_sec=60,
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact equi-width histogram in one map-combined aggregation
    from cassandra_data_migration_spark.operators.aggregates import (
        value_histogram,
    )

    return value_histogram(load_table(spark, sf_dir, "events"))


def q_replica_ownership(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RF=3 SimpleStrategy placement: replica fan-out happens AFTER
    # projection to the node id, so only 4-byte ids multiply
    from cassandra_data_migration_spark.operators.ring import replica_ownership

    return replica_ownership(
        load_table(spark, sf_dir, "orders"), key_col="o_orderkey", rf=3
    )


def q_ring_ownership(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cassandra vnode-ring placement as an analytics report: portable
    # md5 tokens, ring as aligned array literals, successor lookup
    # scan-side — per-node ownership balance before cutover
    from cassandra_data_migration_spark.operators.ring import ring_ownership

    return ring_ownership(
        load_table(spark, sf_dir, "orders"), key_col="o_orderkey"
    )


EVENTS_DIGEST_COLS = [
    "event_id", "ts", "user_id", "event_type", "value", "props",
]


def q_stream_merkle_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous validation, Merkle form: leaf digests incrementally
    # maintained by a stateful streaming aggregation (O(leaves) state),
    # final table identical to the batch range_digests / DuckDB oracle
    import uuid as _uuid

    from cassandra_data_migration_spark.streaming.merkle import (
        incremental_range_digests,
    )

    name = f"mdig_{_uuid.uuid4().hex[:8]}"
    dig = incremental_range_digests(
        _events_stream(spark, sf_dir), "event_id", EVENTS_DIGEST_COLS
    )
    q = (
        dig.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    return spark.sql(f"SELECT * FROM {name}")


def _synth_rgb(doc_id: int, w: int = 4, h: int = 4) -> bytes:
    """Deterministic pseudo-image pixels from md5 — both the query's
    payloads and the oracle's expected sums derive from this."""
    import hashlib as _hashlib

    raw = b""
    i = 0
    while len(raw) < w * h * 3:
        raw += _hashlib.md5(f"bmp:{doc_id}:{i}".encode()).digest()
        i += 1
    return raw[: w * h * 3]


def q_id_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gaps-and-islands completeness check over a sequenced feed; gaps
    # injected by dropping every 97th id
    from cassandra_data_migration_spark.operators.windows import (
        id_gap_islands,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.pmod("event_id", F.lit(97)) != 0
    )
    return id_gap_islands(ev)


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # outlier-robust per-group means: exact-percentile clamp then
    # DECIMAL mean
    from cassandra_data_migration_spark.operators.aggregates import (
        winsorized_stats,
    )

    return winsorized_stats(load_table(spark, sf_dir, "events"))


def q_code_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # code-vs-prose routing signals (regexp_count, scan-side)
    from cassandra_data_migration_spark.operators.text import (
        code_prose_signals,
    )

    return code_prose_signals(load_table(spark, sf_dir, "documents"))


def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford first-digit forensic audit over order totals
    from cassandra_data_migration_spark.operators.quality import (
        benford_profile,
    )

    return benford_profile(load_table(spark, sf_dir, "orders"), "o_totalprice")


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flesch-style readability from integer regex counts (scan-side)
    from cassandra_data_migration_spark.operators.text import (
        readability_scores,
    )

    return readability_scores(load_table(spark, sf_dir, "documents"))


def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interval coalescing: events become [ts, ts+30min] validity
    # spans; overlapping spans per user merge into one
    from cassandra_data_migration_spark.operators.windows import (
        merge_intervals,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    return merge_intervals(ev, "user_id", "start_ts", "end_ts")


def q_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # experiment readout: deterministic hash assignment, DECIMAL-exact
    # moments, Welch z on the 2-row result
    from cassandra_data_migration_spark.operators.sampling import (
        ab_test_readout,
    )

    return ab_test_readout(load_table(spark, sf_dir, "events"))


def q_multi_touch_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # linear multi-touch attribution in integer cents (floor split -
    # order-independent, engine-exact)
    from cassandra_data_migration_spark.streaming.attribution import (
        multi_touch_credit,
    )

    ev = load_table(spark, sf_dir, "events")
    return multi_touch_credit(ev)


def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # registered-users growth curve: first-seen period per user, then
    # an O(periods) running total
    from cassandra_data_migration_spark.operators.aggregates import (
        cumulative_users,
    )

    return cumulative_users(load_table(spark, sf_dir, "events"))


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weekly new/retained/resurrected/churned decomposition via one
    # distinct + per-user lag/lead flags
    from cassandra_data_migration_spark.operators.aggregates import (
        growth_accounting,
    )

    return growth_accounting(load_table(spark, sf_dir, "events"))


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-safe equality join: rows with a legitimately-absent key
    # match the dimension's NULL bucket instead of dropping
    from cassandra_data_migration_spark.operators.joins import (
        null_safe_enrich,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") < 5, None)
        .otherwise(F.col("event_type"))
        .alias("etype"),
    )
    dim = (
        ev.select(F.col("etype").alias("dim_key")).distinct()
        .withColumn(
            "label",
            F.coalesce(F.concat(F.lit("type:"), "dim_key"), F.lit("unattributed")),
        )
    )
    return null_safe_enrich(ev, dim, "etype", "dim_key").groupBy(
        "label"
    ).agg(F.count(F.lit(1)).alias("n_events"))


def q_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed parquet-footer inventory: one row per row group,
    # metadata only (the data-skipping layout review input)
    from cassandra_data_migration_spark.sources.files import (
        parquet_rowgroup_stats,
    )

    return parquet_rowgroup_stats(
        spark, f"{sf_dir}/lineitem.parquet"
    ).select("file", "row_group", "num_rows", "n_columns")


def q_stream_cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # custom stateful streaming operator (applyInPandasWithState):
    # continuously materialized CDC current-state with DELETE
    # tombstones; final reconstruction equals the batch cdc_apply fold
    import uuid as _uuid

    from pyspark.sql import Window

    from cassandra_data_migration_spark.streaming.cdc import (
        stateful_cdc_stream,
    )

    log = _events_stream(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
        "value",
    )
    name = f"cdcs_{_uuid.uuid4().hex[:8]}"
    q = (
        stateful_cdc_stream(log, ["user_id"], ts_col="ts_us", seq_col="seq")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    emitted = spark.sql(f"SELECT * FROM {name}")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("seq"))
    return (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_emit") != "D"))
        .select("user_id", "ts_us", "seq", "op", "value")
    )


def q_stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # custom stateful streaming operator: exact per-window quantiles
    # (unsupported by streaming aggs) via applyInPandasWithState;
    # update-mode emissions reduced to the final row per window
    import uuid as _uuid

    from pyspark.sql import Window

    from cassandra_data_migration_spark.streaming.quantiles import (
        windowed_quantiles_stream,
    )

    qdf = windowed_quantiles_stream(_events_stream(spark, sf_dir))
    name = f"strq_{_uuid.uuid4().hex[:8]}"
    q = (
        qdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    emitted = spark.sql(f"SELECT * FROM {name}")
    w = Window.partitionBy("window_h").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def q_column_encryption(spark: SparkSession, sf_dir: str) -> DataFrame:
    # column-level AES (PII-at-rest story beside redaction + DP):
    # encrypt -> decrypt roundtrip over the sensitive column; output
    # is deterministic (the ciphertext itself carries a random IV and
    # never leaves the plan)
    ev = load_table(spark, sf_dir, "events")
    key = F.lit("0123456789abcdef")
    enc = F.aes_encrypt(F.col("props").cast("binary"), key)
    return ev.select(
        "event_id",
        F.aes_decrypt(enc, key).cast("string").alias("props_roundtrip"),
    )


def q_dp_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Laplace-mechanism release of grouped counts, seeded-noise mode
    # (reproducible draw per group via md5 inverse-CDF)
    from cassandra_data_migration_spark.operators.privacy import (
        dp_group_counts,
    )

    return dp_group_counts(
        load_table(spark, sf_dir, "events"), ["event_type"], epsilon=0.5
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quasi-identifier audit: cells smaller than k are re-id risks
    from cassandra_data_migration_spark.operators.privacy import (
        k_anonymity_violations,
    )

    # the balance bucket keeps cells fine-grained enough that
    # violations exist (and the audit discriminates) at every sf
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_kb", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return k_anonymity_violations(
        cust,
        ["c_nationkey", "c_mktsegment", "bal_kb"],
        k=10,
    )


def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SQL interface end to end: fixture tables registered as temp
    # views, the report written as SQL text - same Catalyst plan as
    # the DataFrame form (spark.sql is a first-class entry point)
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql("""
        SELECT n.n_name AS nation,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS total_price
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """)


def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    # semi-structured JSON via Spark 4 VariantType: parse once,
    # typed extraction without a user-declared schema - the columnar
    # path for ragged props at scale (vs per-access string re-parse
    # with get_json_object)
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_id",
            F.try_variant_get(v, "$.k", "int").alias("k_value"),
        )
        .filter(F.col("k_value").isNotNull() & (F.col("k_value") % 7 == 0))
    )


def q_multiset_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bag-semantics diff: EXCEPT ALL / INTERSECT ALL with
    # multiplicity - catches duplicated-row drift that set diffs miss
    from cassandra_data_migration_spark.operators.setops import (
        multiset_compare,
    )

    # duplicate some target rows to make multiplicity matter
    t = _target(spark, sf_dir)
    dup = t.filter(F.pmod("o_orderkey", F.lit(13)) == 0)
    return multiset_compare(_origin(spark, sf_dir), t.unionByName(dup))


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL codec path end to end: deterministic images encoded driver-
    # side — half as 24-bit BMP, half as zlib-compressed baseline PNG —
    # decoded by the in-repo codecs inside an Arrow mapInPandas,
    # integer channel sums out (container-invariant, engine-comparable)
    from cassandra_data_migration_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        media_pixel_stats,
    )

    rows = [
        (
            i,
            bytearray(
                (encode_bmp if i % 2 == 0 else encode_png)(
                    4, 4, _synth_rgb(i)
                )
            ),
        )
        for i in range(32)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return media_pixel_stats(df)


def q_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL video container path: deterministic C444 .y4m videos built
    # driver-side, parsed by the in-repo YUV4MPEG2 codec inside Arrow
    # mapInPandas, every-2nd-frame luma sums out (integer-exact)
    from cassandra_data_migration_spark.operators.multimodal import (
        encode_y4m,
        video_frame_stats,
    )

    rows = []
    for i in range(32):
        frames = [
            bytes(
                [(i * 31 + f * 7 + p) % 256 for p in range(16)]
                + [(i * 13 + f * 5 + p) % 256 for p in range(16)]
                + [(i * 17 + f * 3 + p) % 256 for p in range(16)]
            )
            for f in range(3 + i % 3)
        ]
        rows.append((i, bytearray(encode_y4m(4, 4, frames))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return video_frame_stats(df, every_n=2)


def q_audio_tone_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL audio DSP path: stdlib-WAV-encoded pure tones at exact bin
    # centers, decoded + rFFT'd engine-side; the dominant bin must hit
    # the synthesized frequency (theorem for integer-cycle tones), so
    # the oracle pins match=TRUE — no float spectra cross engines
    import math

    from cassandra_data_migration_spark.operators.multimodal import (
        audio_tone_stats,
        encode_wav,
    )

    n = 64
    rows = []
    for i in range(32):
        cyc = 1 + i % 8
        pcm = b"".join(
            int(round(10000 * math.sin(2 * math.pi * cyc * t / n))).to_bytes(
                2, "little", signed=True
            )
            for t in range(n)
        )
        rows.append((i, bytearray(encode_wav(pcm))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = audio_tone_stats(df, n_fft=n)
    expected = (F.lit(1) + F.pmod(F.col("doc_id"), F.lit(8))).cast("int")
    return out.select(
        "doc_id",
        "n_samples",
        "dominant_bin",
        expected.alias("expected_bin"),
        (F.col("dominant_bin") == expected).alias("match"),
    )


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDC changelog fold: latest op per key wins, deletes vanish -
    # the full I/U/D semantics CDM's never-delete AutoCorrect omits;
    # ops derived deterministically from the events fixture
    from cassandra_data_migration_spark.operators.windows import cdc_apply

    log = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value",
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
    )
    return cdc_apply(
        log, ["user_id"], ts_col="ts", tiebreak_col="event_id"
    )


def q_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q12 shape: CASE-inside-SUM conditional aggregation
    from cassandra_data_migration_spark.operators.olap import (
        priority_line_counts,
    )

    return priority_line_counts(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14 shape: conditional numerator over common denominator
    from cassandra_data_migration_spark.operators.olap import (
        promo_revenue_share,
    )

    return promo_revenue_share(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19 shape: OR-of-ANDs cross-table predicate with
    # single-side parts pre-filtered into both scans
    from cassandra_data_migration_spark.operators.olap import (
        disjunctive_predicate_revenue,
    )

    return disjunctive_predicate_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PMI collocation mining over adjacent token pairs
    from cassandra_data_migration_spark.operators.text import pmi_collocations

    return pmi_collocations(load_table(spark, sf_dir, "documents"))


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tick->bar compaction: one map-combined agg, open/close via
    # min_by/max_by over a deterministic (ts, value) tiebreak
    from cassandra_data_migration_spark.operators.windows import ohlc_bars

    return ohlc_bars(load_table(spark, sf_dir, "events"))


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # product-analytics retention matrix: first-seen cohort x offset
    from cassandra_data_migration_spark.operators.windows import (
        retention_cohorts,
    )

    return retention_cohorts(load_table(spark, sf_dir, "events"))


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact kNN JOIN: every query vector gets its top-k corpus
    # neighbors; query side broadcast, corpus scanned once, one
    # (query_id) shuffle of score triples for the per-query rank
    from cassandra_data_migration_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join(emb, emb.filter(F.col("vec_id") < 20), k=5)


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    # contrastive hard-negative mining: per query vector the top-3
    # nearest OTHER-label vectors — knn_join's broadcast shape with
    # the label-mismatch predicate fused into the join
    from cassandra_data_migration_spark.operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(emb, emb.filter(F.col("vec_id") < 20), k=3)


def q_conform_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    # schema drift remediation: reorder + cast + NULL-fill a drifted
    # source back to the target schema (pure projection, zero shuffle)
    from cassandra_data_migration_spark.operators.setops import conform_schema

    orders = load_table(spark, sf_dir, "orders")
    drifted = orders.select(
        F.col("o_orderkey").cast("int"),          # narrowed type
        F.col("o_totalprice").cast("string"),     # stringly typed
        "o_custkey",
        F.lit("x").alias("o_extra"),              # extra column
        "o_orderstatus", "o_orderdate",           # o_orderpriority missing
    )
    return conform_schema(drifted, orders)


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BPE tokenizer training (8 merges) + vocabulary report: the
    # corpus collapses to (word, count) once, merge rounds iterate on
    # distinct words (Heaps-law working set), argmax pair per round is
    # TakeOrdered over map-combined pair counts
    from cassandra_data_migration_spark.operators.bpe import (
        bpe_segment_counts,
        bpe_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges, segmented = bpe_train(docs, num_merges=8)
    return bpe_segment_counts(docs, merges, segmented=segmented)


def q_cube_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CUBE lattice completion of the rollup profile: all dim subsets
    # in one Expand -> single map-combined aggregate pass
    from cassandra_data_migration_spark.operators.aggregates import cube_profile

    return cube_profile(
        load_table(spark, sf_dir, "documents"), ["lang", "source"]
    )


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # join-key pre-flight: per-key counts reduced to a fixed-size
    # skew report (the decide-between-plain/salted/AQE-join check)
    from cassandra_data_migration_spark.operators.aggregates import (
        key_skew_report,
    )

    return key_skew_report(
        load_table(spark, sf_dir, "events"), "user_id", top_n=5
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Efraimidis-Spirakis A-ES: exact weighted sampling without
    # replacement, k per group, md5-derived draws (engine-portable)
    from cassandra_data_migration_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    return weighted_sample_per_group(
        load_table(spark, sf_dir, "documents"),
        "lang", "doc_id", "n_chars", k=5,
    )


def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream-stream interval join: two watermarked unbounded sides,
    # two-sided time bound -> bounded state; availableNow drains the
    # file stream and the result equals the batch interval join
    import uuid as _uuid

    from cassandra_data_migration_spark.streaming.attribution import (
        attribution_join_stream,
    )

    name = f"attr_{_uuid.uuid4().hex[:8]}"
    joined = attribution_join_stream(_events_stream(spark, sf_dir))
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    return spark.sql(f"SELECT * FROM {name}")


def q_merkle_range_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Anti-entropy repair primitive: per-token-range md5 digests on
    # each side (map-combined, O(leaves) keys), full-outer join of the
    # two leaf tables — finds every divergent range without shipping a
    # single row (nodetool-repair semantics for J1/J2 drill-down)
    from cassandra_data_migration_spark.operators.merkle import merkle_diff

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    return merkle_diff(
        _origin(spark, sf_dir), _target(spark, sf_dir), "o_orderkey", cols
    )


register_queries(globals())
__all__ = export_all(globals())
