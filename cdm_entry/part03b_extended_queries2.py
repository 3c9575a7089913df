"""Extended contract queries, continued (split from part03 at the
lakehouse/COW registration boundary to keep entry modules under
~1,500 lines — the part04b/06b/07b pattern; the star-import chain
preserves the monolith's shared namespace and evaluation order
exactly).
"""

from __future__ import annotations

from cdm_entry.part03_extended_queries import *  # noqa: F401,F403



def q_cow_merge_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AutoCorrect onto the lake: LWW merge where the newer writetime
    # wins per key (ties favor the update).  Base writetime =
    # o_orderkey % 1000; updates carry writetime 500 over the
    # low-eighth keys, so roughly half win (+100 price, wt 500) and
    # half are STALE and must leave the base row untouched.
    import tempfile

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.pmod("o_orderkey", F.lit(1000)).alias("wt"),
    )
    d = tempfile.mkdtemp(prefix="cow_lww_") + "/orders"
    orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.parquet(d)
    b = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    threshold = int(b["lo"]) + (int(b["hi"]) - int(b["lo"])) // 8
    upd = orders.filter(F.col("o_orderkey") <= threshold).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        F.lit(500).cast("long").alias("wt"),
    )
    cow_merge(spark, d, upd, "o_orderkey", writetime_col="wt")
    return spark.read.parquet(d).select("o_orderkey", "o_totalprice", "wt")


def q_snapshot_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # change data feed between table versions: commit v0, merge the
    # usual low-eighth price bump + 20 inserts (v1), then diff v0→v1
    # — one full-outer join of the two snapshots, struct-packed rows
    import tempfile

    from pyspark.sql import Window

    from cassandra_data_migration_spark.sources.lakehouse import (
        cow_merge,
        snapshot_changes,
        snapshot_commit,
    )

    orders = load_table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="cow_cdf_") + "/orders"
    orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.parquet(d)
    snapshot_commit(d)
    b = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    lo, hi = int(b["lo"]), int(b["hi"])
    threshold = lo + (hi - lo) // 8
    upd = orders.filter(F.col("o_orderkey") <= threshold).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    rn = F.row_number().over(Window.orderBy("o_orderkey"))
    ins = (
        orders.withColumn("_rn", rn)
        .filter(F.col("_rn") <= 20)
        .drop("_rn")
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(hi + 1))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(5.0))
    )
    cow_merge(spark, d, upd.unionByName(ins), "o_orderkey")  # commits v1
    return snapshot_changes(spark, d, 0, 1, "o_orderkey").select(
        "o_orderkey",
        "change_type",
        F.col("_old.o_totalprice").alias("old_price"),
        F.col("_new.o_totalprice").alias("new_price"),
    )


def q_stream_cow_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Delta-style streaming MERGE: the events changelog, sliced in
    # (ts, event_id) order into micro-batches, is folded into the
    # versioned COW table by per-batch collapse + cow_merge.  MERGE
    # is idempotent per batch, so no replay gate is needed (contrast
    # the signed-delta MV).  Final table == one-shot cdc_apply.
    import tempfile

    from pyspark.sql import Window

    from cassandra_data_migration_spark.operators.windows import cdc_apply
    from cassandra_data_migration_spark.sources.lakehouse import (
        read_snapshot,
        snapshot_commit,
    )
    from cassandra_data_migration_spark.streaming.cow_stream import (
        cow_apply_changes_stream,
    )

    log = (
        load_table(spark, sf_dir, "events")
        .filter(F.pmod("user_id", F.lit(3)) == 0)  # 1/3 of the log:
        # the stream machinery, not data volume, is what this query
        # exercises; the oracle applies the identical filter
        .select(
            "user_id", "ts", "event_id", "value",
            F.when(F.col("event_type") == "error", "D")
            .when(F.col("event_type") == "signup", "I")
            .otherwise("U")
            .alias("op"),
        )
    )
    # persist: the count, the batch-0 seed fold, and both slice
    # writes re-ran the full ordering window otherwise — four
    # executions of the same sort (the stream_irate precedent,
    # guide §5); unpersisted after the last slice write below
    ranked = log.withColumn(
        "_rk", F.row_number().over(Window.orderBy("ts", "event_id"))
    ).persist()
    n = ranked.count()
    d = tempfile.mkdtemp(prefix="cow_stream_")
    target, src, ckpt = f"{d}/table", f"{d}/log", f"{d}/ckpt"
    # batch 0 seeds the table (the initial-snapshot fold)
    s0 = ranked.filter(F.col("_rk") <= n // 3).drop("_rk")
    cdc_apply(s0, ["user_id"], ts_col="ts", tiebreak_col="event_id").drop(
        "op"
    ).write.parquet(target)
    snapshot_commit(target)
    # the tail arrives as two ordered micro-batches
    for lo, hi in ((n // 3, 2 * n // 3), (2 * n // 3, n)):
        ranked.filter(
            (F.col("_rk") > lo) & (F.col("_rk") <= hi)
        ).drop("_rk").repartition(1).write.mode("append").parquet(src)
    ranked.unpersist()
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, value double, "
            "op string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = cow_apply_changes_stream(
        stream, target, "user_id", ckpt, ts_col="ts", seq_col="event_id"
    )
    await_or_raise(q, 300)
    return read_snapshot(spark, target).select(
        "user_id", "ts", "event_id", "value"
    )


def q_cow_delete_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MERGE WHEN MATCHED DELETE: purge the lowest-eighth key range
    # from the staged COW table; only the touched files are rewritten
    import tempfile

    from cassandra_data_migration_spark.sources.lakehouse import cow_delete

    orders = load_table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="cow_del_") + "/orders"
    orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.parquet(d)
    b = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    threshold = int(b["lo"]) + (int(b["hi"]) - int(b["lo"])) // 8
    keys = orders.filter(F.col("o_orderkey") <= threshold).select(
        "o_orderkey"
    )
    cow_delete(spark, d, keys, "o_orderkey")
    return spark.read.parquet(d).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


def q_cow_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # versioned COW table: commit v0, merge a price bump (v1 committed
    # by the merge, nothing deleted), then read AS OF v0 — time travel
    # must return the pre-merge table bit for bit
    import tempfile

    from cassandra_data_migration_spark.sources.lakehouse import (
        cow_merge,
        read_snapshot,
        snapshot_commit,
    )

    orders = load_table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="cow_tt_") + "/orders"
    orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.parquet(d)
    snapshot_commit(d)
    b = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    threshold = int(b["lo"]) + (int(b["hi"]) - int(b["lo"])) // 8
    upd = orders.filter(F.col("o_orderkey") <= threshold).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    cow_merge(spark, d, upd, "o_orderkey")
    return read_snapshot(spark, d, 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


def q_secondary_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cassandra 2i/SAI analogue: narrow (value, pk) index partitioned
    # by value-hash bucket; the probe prunes to ONE index directory,
    # then broadcast-semi-joins the matching PKs into the base scan —
    # no full scan of the wide table for a non-key predicate
    import tempfile

    from cassandra_data_migration_spark.sources.secondary_index import (
        build_secondary_index,
        index_lookup,
    )

    orders = load_table(spark, sf_dir, "orders")
    # probe: the customer of the lowest-keyed order (exists by
    # construction; lineitem's fixture keys are not unique, orders'
    # o_orderkey is — semi-join keys must identify rows)
    probe = int(
        orders.orderBy("o_orderkey")
        .select("o_custkey")
        .limit(1)
        .collect()[0]["o_custkey"]
    )
    idx = tempfile.mkdtemp(prefix="sidx_") + "/o_custkey_idx"
    build_secondary_index(orders, idx, "o_custkey", ["o_orderkey"])
    return index_lookup(
        spark, orders, idx, "o_custkey", ["o_orderkey"], probe
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


def q_cow_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lakehouse MERGE INTO on plain parquet: orders staged range-
    # partitioned on the key (8 files), updates confined to the lowest
    # eighth of the key range (+100 price) plus 20 inserted rows above
    # the max key; copy-on-write rewrites only the touched files,
    # stats-pruned via footers.  Returns the merged table projection.
    import tempfile

    from pyspark.sql import Window

    from cassandra_data_migration_spark.sources.lakehouse import cow_merge

    orders = load_table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="cow_") + "/orders"
    orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.parquet(d)
    b = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    lo, hi = int(b["lo"]), int(b["hi"])
    threshold = lo + (hi - lo) // 8
    upd = orders.filter(F.col("o_orderkey") <= threshold).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    rn = F.row_number().over(Window.orderBy("o_orderkey"))
    ins = (
        orders.withColumn("_rn", rn)
        .filter(F.col("_rn") <= 20)
        .drop("_rn")
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(hi + 1))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(5.0))
    )
    cow_merge(spark, d, upd.unionByName(ins), "o_orderkey")
    return spark.read.parquet(d).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


# materialized LSH band indexes, keyed (applicationId, sf_dir): the
# index is the artifact a continuous-crawl pipeline keeps BETWEEN
# ingests (lsh_index_build docstring) — each probe batch reads the
# persisted 16 B/row index instead of re-minhashing the seen corpus
_LSH_INDEXES: dict = {}


def _ensure_lsh_index(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    import tempfile

    from cassandra_data_migration_spark.operators.dedup import (
        lsh_index_build,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _LSH_INDEXES.get(key)
    if hit is None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        half = docs.count() // 2
        d = tempfile.mkdtemp(prefix="lsh_index_")
        lsh_index_build(
            docs.filter(F.col("doc_id") < half)
        ).write.mode("overwrite").parquet(d)
        hit = (d, half)
        _LSH_INDEXES[key] = hit
    return hit


def q_lsh_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous-crawl near-dup: first half of the corpus is the
    # ingested "seen" side, persisted as an LSH band index (built once
    # per process — the between-ingests artifact); the second half
    # probes it — band collisions nominate, exact Jaccard on the
    # TOUCHED seen docs only verifies, each new doc reports its best
    # match or is_novel
    from cassandra_data_migration_spark.operators.dedup import (
        lsh_index_probe,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d, half = _ensure_lsh_index(spark, sf_dir)
    seen = docs.filter(F.col("doc_id") < half)
    new = docs.filter(F.col("doc_id") >= half)
    return lsh_index_probe(new, spark.read.parquet(d), seen)


def q_line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet/RefinedWeb LINE-wise dedup (natural-line granularity; the
    # token-chunk twin is strip_boilerplate): synthesize multi-line
    # pages from the fixture — own text + a cyclically-donated line
    # for doc_id%5==0 + a shared boilerplate line for doc_id%3==0 —
    # then drop lines whose md5 recurs in >=2 distinct docs and
    # reassemble survivors in order
    from cassandra_data_migration_spark.operators.text import line_dedup_docs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    donor = docs.select(F.col("doc_id").alias("_j"), F.col("text").alias("_t2"))
    pages = (
        docs.withColumn("_j", F.pmod(F.col("doc_id") + 17, F.lit(n)))
        .join(donor, "_j")
        .select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.col("text"),
                F.when(F.col("doc_id") % 5 == 0, F.col("_t2")),
                F.when(F.col("doc_id") % 3 == 0, F.lit(_LINE_BOILER)),
            ).alias("text"),
        )
    )
    return line_dedup_docs(pages, min_docs=2, min_chars=10)


def q_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    # entity resolution over the distinct-name dictionary: part-name
    # variants within 2 edits, blocked on the noun token, length-bound
    # pre-pruned; the quadratic kernel never touches full rows
    from cassandra_data_migration_spark.operators.joins import fuzzy_name_match

    return fuzzy_name_match(
        load_table(spark, sf_dir, "part"), name_col="p_name", max_dist=2
    )


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hypertable rollup: per-user hourly purchase series over each
    # user's own span, gaps filled with 0-counts and forward-filled
    # last value — one key shuffle, narrow grid explode
    from cassandra_data_migration_spark.operators.windows import resample_ffill

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return resample_ffill(ev, key_col="user_id", ts_col="ts", value_col="value")


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequenced-mins funnel view→click→purchase: one map-combined
    # groupBy(user) computing all stage mins in a single pass
    from cassandra_data_migration_spark.operators.aggregates import event_funnel

    return event_funnel(load_table(spark, sf_dir, "events"))


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hybrid retrieval: BM25 lexical candidates + dense cosine
    # candidates fused with Reciprocal Rank Fusion (e9 integer
    # contributions).  Corpus-side work stays in the rankers
    # (scan-side scoring, TakeOrdered); fusion touches only the two
    # bounded top-50 lists.
    from cassandra_data_migration_spark.operators.retrieval import (
        ranked_list,
        rrf_fuse,
    )
    from cassandra_data_migration_spark.operators.similarity import cosine_topk
    from cassandra_data_migration_spark.operators.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    lex = bm25_topk(docs, ["spark", "join", "window", "vector"], k=50)
    dense = cosine_topk(emb, qv, k=50, exclude_ids=[0])
    return rrf_fuse(
        [
            ranked_list(
                lex, [F.desc("score_e6"), F.asc("doc_id")], "doc_id", "bm25"
            ),
            ranked_list(
                dense, [F.desc("cos_sim"), F.asc("vec_id")], "vec_id", "dense"
            ),
        ],
        k=15,
        c=60,
    )


def q_url_canonical_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # URL-level dedup: canonicalize (strip query/fragment/www/default
    # port, reduce to directory) then one grouped agg on the canonical
    # key — O(groups) shuffle, text never moves
    from cassandra_data_migration_spark.operators.web import (
        synthesize_url,
        url_canonical_groups,
    )

    docs = synthesize_url(load_table(spark, sf_dir, "documents"))
    return url_canonical_groups(docs)


def q_hashed_quality_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fastText-style hashed-token linear classifier: md5-derived
    # weights folded scan-side (aggregate over transform — zero
    # explode, zero shuffle); exact BIGINT weight sums
    from cassandra_data_migration_spark.operators.text import hashed_linear_score

    return hashed_linear_score(load_table(spark, sf_dir, "documents"))


def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fill-to-N-tokens selection without a global sort: driver-side
    # cumsum over per-priority totals picks the cutoff stratum; only
    # that stratum runs a windowed cumsum
    from cassandra_data_migration_spark.operators.sampling import (
        token_budget_select,
    )
    from cassandra_data_migration_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", token_count("text")
    )
    return token_budget_select(
        docs, budget=10_000, priority_col="n_chars", token_col="n_tok"
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-pass bucket-sketch heavy hitters: bucket counts bound token
    # counts from above (no false negatives), so the exact pass only
    # shuffles tokens sharing a bucket with a genuinely frequent one
    from cassandra_data_migration_spark.operators.text import heavy_hitters

    return heavy_hitters(
        load_table(spark, sf_dir, "documents"), min_count=300
    )


def q_stable_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dense ids in (n_chars DESC, doc_id) order WITHOUT the
    # single-partition row_number: quantile-bucketed numbering with
    # driver-cumsum'd offsets; equals the global window exactly
    from cassandra_data_migration_spark.operators.ids import stable_dense_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return stable_dense_ids(
        docs, ["n_chars", "doc_id"], descending=[True, False], buckets=16
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SCD type-2 history build from the event log: change-point filter
    # + validity intervals, all per-key partitioned windows
    from cassandra_data_migration_spark.operators.windows import scd2_history

    return scd2_history(
        load_table(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        attr_col="event_type",
    )


def q_percentile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-language percent-rank calibration of a quality proxy
    from cassandra_data_migration_spark.operators.windows import (
        percentile_normalize,
    )

    return percentile_normalize(
        load_table(spark, sf_dir, "documents"),
        group_col="lang",
        value_col="n_chars",
        id_col="doc_id",
    )


def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-language median/MAD robust z-score: exact grouped medians,
    # broadcast re-join, scan-side scaling
    from cassandra_data_migration_spark.operators.aggregates import robust_scale

    return robust_scale(
        load_table(spark, sf_dir, "documents"),
        group_col="lang",
        value_col="n_chars",
        id_col="doc_id",
    )


def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PageRank domain authority in e12 fixed-point integers: the
    # iterative message-passing rounds are driver-side control flow
    # over joins; all arithmetic is integer `div`, so the result is
    # bit-identical to the oracle's unrolled-CTE fixpoint
    from cassandra_data_migration_spark.operators.graph import domain_pagerank

    return domain_pagerank(load_table(spark, sf_dir, "documents"), iterations=5)


def q_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # incremental materialized-view maintenance: a Debezium-shaped
    # changelog (I/U/D with before-images) merged into the per-customer
    # aggregate view by signed deltas — O(|delta|) work, never a base
    # rescan; must equal the full recompute (the oracle)
    from cassandra_data_migration_spark.operators.mv import (
        mv_apply_delta,
        mv_build,
    )

    o = load_table(spark, sf_dir, "orders")
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
    changelog = inserts.unionByName(deletes).unionByName(updates)
    mv = mv_build(base, "o_custkey", "o_totalprice")
    out = mv_apply_delta(mv, changelog, "o_custkey")
    return out.select(
        "o_custkey",
        "n_rows",
        F.col("sum_val").cast("double").alias("sum_val"),
    )


def q_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CBO stats health check: textbook estimate |A||B|/max(ndv) vs the
    # actual orders x lineitem join cardinality, integer-exact NDVs
    from cassandra_data_migration_spark.operators.quality import (
        join_cardinality_audit,
    )

    return join_cardinality_audit(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        "o_orderkey",
        "l_orderkey",
    )


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming gap sessionization (F.session_window): finite replay in
    # complete mode must equal the batch lag->flag->sum sessionizer —
    # the oracle recomputes sessions with window SQL
    import uuid as _uuid

    from cassandra_data_migration_spark.streaming.sessions import (
        sessionize_stream,
    )

    name = f"sess_{_uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(
            _events_stream(spark, sf_dir), gap_seconds=28800, watermark=None
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    return spark.sql(f"SELECT * FROM {name}").select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        "session_start",
        "session_end",
        F.col("duration_s").cast("long").alias("duration_s"),
    )


def q_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming windowed top-k: live per-hour event-type counts with
    # the rank cut applied sink-side (rank-over-window is not a
    # streaming operator); finite replay equals the batch computation
    import uuid as _uuid

    from cassandra_data_migration_spark.streaming.trending import (
        rank_topk,
        trending_counts_stream,
    )

    name = f"trend_{_uuid.uuid4().hex[:8]}"
    q = (
        trending_counts_stream(
            _events_stream(spark, sf_dir), window="1 hour", watermark="2 hours"
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    counts = spark.sql(f"SELECT * FROM {name}")
    return rank_topk(counts, k=3).select(
        "win_start",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("rnk").cast("long").alias("rnk"),
    )

register_queries(globals())
__all__ = export_all(globals())
