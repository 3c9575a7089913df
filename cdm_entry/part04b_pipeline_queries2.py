"""Pipeline/composite contract queries, continued (split from
part04 at a registration boundary to keep entry modules under ~1,500
lines — the part06b/07b pattern; the star-import chain preserves the
monolith's shared namespace and evaluation order exactly).
"""

from __future__ import annotations

from cdm_entry.part04_pipeline_queries import *  # noqa: F401,F403

def q_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PPJoin-style prefix filtering: lossless sub-quadratic Jaccard
    # pairs — the oracle recomputes the full quadratic join, proving
    # the rare-token prefix pruning drops nothing
    from cassandra_data_migration_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    return prefix_filter_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q4 shape: EXISTS semi-join with equi + theta condition
    from cassandra_data_migration_spark.operators.olap import (
        order_priority_check,
    )

    return order_priority_check(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def q_top_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 shape: grouped agg filtered vs a global scalar, the
    # total re-aggregated from the per-part partials (one fact scan).
    # Average-relative threshold (1.5x mean part revenue) is non-empty
    # at every sf; integer-exact e4 revenue avoids decimal divergence.
    from cassandra_data_migration_spark.operators.olap import above_average_parts

    return above_average_parts(load_table(spark, sf_dir, "lineitem"), num=3, den=2)


def q_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lake maintenance (OPTIMIZE/rewrite): a 40-file small-file dir
    # compacts to ceil(bytes/target)=1 file with every row preserved —
    # the per-file open/footer tax is THE operational cost at 100 TB
    import tempfile

    from cassandra_data_migration_spark.sources.files import compact_parquet

    c = load_table(spark, sf_dir, "customer")
    d = tempfile.mkdtemp(prefix="compact_") + "/customer"
    c.repartition(40).write.mode("overwrite").parquet(d)
    import os

    before = sum(
        1 for f in os.listdir(d) if f.endswith(".parquet")
    )
    rows_before = spark.read.parquet(d).count()
    after = compact_parquet(spark, d, target_mb=128)
    compacted = spark.read.parquet(d)
    rows_after = compacted.count()
    key_sum = compacted.agg(F.sum("c_custkey")).collect()[0][0]
    return spark.createDataFrame(
        [(before, after, rows_after, rows_before == rows_after, int(key_sum))],
        "files_before long, files_after long, rows long, "
        "rows_match boolean, key_sum long",
    )


def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    # schema-on-read evolution: two snapshots written under drifted
    # schemas (o_orderstatus added later) read back as one union-schema
    # table; old files surface NULL for the late column
    import tempfile

    from cassandra_data_migration_spark.sources.files import parquet_evolved_read

    o = load_table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="evolve_") + "/orders"
    o.filter(F.pmod("o_orderkey", F.lit(2)) == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(d)
    o.filter(F.pmod("o_orderkey", F.lit(2)) == 1).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).write.mode("append").parquet(d)
    merged = parquet_evolved_read(spark, d)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mergeable Misra-Gries sketch audit: every true heavy hitter
    # (count > N div (m+1)) must be covered by the <= m-row-per-task
    # summary within the N/(m+1) bound — theorems, so the oracle
    # asserts all-TRUE; a sketch bug flips a boolean
    from cassandra_data_migration_spark.operators.aggregates import (
        mg_heavy_hitters_audit,
    )

    return mg_heavy_hitters_audit(
        load_table(spark, sf_dir, "documents"), m=256
    )


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13 shape: left outer join keeping zero-order customers,
    # orders pre-aggregated BEFORE the join, histogram of counts after
    from cassandra_data_migration_spark.operators.olap import (
        customer_order_distribution,
    )

    return customer_order_distribution(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )


def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18 shape: grouped HAVING first, then broadcast the tiny
    # qualifying-key set through the joins
    from cassandra_data_migration_spark.operators.olap import (
        large_volume_orders,
    )

    return large_volume_orders(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
        min_quantity=250.0,
    )


def q_in_transit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Overlapping-interval coverage count: for each March-1995 order
    # date, count the transit windows [l_shipdate, l_shipdate +
    # (qty % 14 + 2) days] covering it across ALL lineitem rows — a
    # pure range predicate with no equi key, which Catalyst alone can
    # only plan as a nested-loop join.  Because only the COUNT is
    # needed, the interval-stabbing sweep (difference array + two-
    # phase prefix sum) computes it in O(|I| + |P|) without ever
    # materializing the point×interval pairs — the r9 scale gate
    # measured wall exponent 1.31 for the pair-materializing
    # binned_range_join formulation (pairs grow ~quadratically when
    # both sides grow together); the sweep is linear by construction.
    # binned_range_join remains the operator for range joins whose
    # OUTPUT is the pairs.  The oracle is the plain quadratic BETWEEN
    # join + GROUP BY, proving the sweep is exact.
    from cassandra_data_migration_spark.operators.joins import (
        stabbing_count_join,
    )

    epoch = F.lit("1970-01-01")
    pts = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-03-01")
            & (F.col("o_orderdate") < "1995-04-01")
        )
        .select(
            "o_orderkey",
            F.datediff("o_orderdate", epoch).alias("p_day"),
        )
    )
    lo = F.datediff("l_shipdate", epoch)
    iv = load_table(spark, sf_dir, "lineitem").select(
        lo.alias("lo_day"),
        (lo + (F.col("l_quantity").cast("int") % 14 + 2)).alias("hi_day"),
    )
    return (
        stabbing_count_join(pts, iv, "p_day", "lo_day", "hi_day")
        .filter(F.col("n_covering") > 0)  # inner-join semantics
        .select(
            "o_orderkey",
            F.col("n_covering").cast("long").alias("n_in_transit"),
        )
    )


def q_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-min sketch with FULL oracle parity: md5-seeded buckets are
    # bit-reproducible in SQL, so the oracle rebuilds the identical
    # sketch and matches est_cnt exactly; over_ok (est >= true) is the
    # CMS never-undercount theorem and must be all-TRUE on top.
    from cassandra_data_migration_spark.operators.aggregates import (
        cms_token_estimates,
    )

    return cms_token_estimates(load_table(spark, sf_dir, "documents"))


def q_mmr_diverse_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Greedy MMR coreset selection in integer-exact arithmetic; the
    # oracle replays the greedy loop as unrolled CTE stages over the
    # full integer similarity matrix, so the SELECTION ORDER itself
    # is hash-checked, not just the member set.
    from cassandra_data_migration_spark.operators.similarity import (
        mmr_select,
    )

    return mmr_select(load_table(spark, sf_dir, "embeddings"), k=8)


def q_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous count-min maintenance: the documents token stream
    # replayed in micro-batch slices through foreachBatch cell-sum
    # merges — mergeable-summary algebra converges to the one-shot
    # batch sketch under any slicing, so the BATCH oracle checks the
    # STREAMED state exactly
    import tempfile

    from cassandra_data_migration_spark.streaming.cms import (
        cms_maintain_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    # persist: the slice loop writes the SAME exploded token stream
    # three times (full corpus tokenize per slice otherwise) — the
    # stream_irate precedent (r8), applied round 13 per VERDICT r12
    # ask #5 (guide §5 caching: reused AND expensive to recompute)
    terms = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("term"),
        F.pmod("doc_id", F.lit(3)).alias("_slice"),
    ).persist()
    d = tempfile.mkdtemp(prefix="cms_stream_")
    src, sk, ckpt = f"{d}/src", f"{d}/sketch", f"{d}/ckpt"
    for s in range(3):
        terms.filter(F.col("_slice") == s).select("term").repartition(
            1
        ).write.mode("append").parquet(src)
    terms.unpersist()
    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = cms_maintain_stream(stream, sk, checkpoint=ckpt)
    await_or_raise(q, 300)
    return spark.read.parquet(sk)


def q_throttled_stream_pacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T6 throttled streams, oracle-checked: maxFilesPerTrigger=1 over
    # a 6-file source MUST pace into exactly 6 micro-batches (the
    # deterministic pacing contract), every batch must respect the cap,
    # and no rows may be lost or duplicated by the slicing
    import tempfile

    events = load_table(spark, sf_dir, "events").select("event_id")
    d = tempfile.mkdtemp(prefix="throttle_stream_")
    src, ckpt = f"{d}/src", f"{d}/ckpt"
    events.repartition(6).write.parquet(src)
    seen: dict[str, int] = {"batches": 0, "rows": 0}
    n_files = len(
        [
            f
            for f in os.listdir(src)
            if f.endswith(".parquet") and not f.startswith("_")
        ]
    )

    def count_batch(batch_df: DataFrame, batch_id: int) -> None:
        seen["batches"] += 1
        seen["rows"] += batch_df.count()

    q = (
        spark.readStream.schema("event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 300)
    return spark.createDataFrame(
        [(n_files, seen["batches"], seen["rows"])],
        "n_files long, n_batches long, n_rows long",
    )


def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S4/S6-adjacent: XML staging (Spark 4's native xml source — the
    # legacy-enterprise interchange format next to CSV/JSON/ORC).
    # Export then re-import with the origin schema pinned must be
    # lossless, XML entity escaping and all.
    import tempfile

    from cassandra_data_migration_spark.sources.files import (
        xml_export,
        xml_import,
    )

    s = load_table(spark, sf_dir, "supplier")
    d = tempfile.mkdtemp(prefix="xml_rt_")
    xml_export(s, f"{d}/supplier_xml", row_tag="supplier")
    return xml_import(
        spark, f"{d}/supplier_xml", schema=s.schema, row_tag="supplier"
    )


def q_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous distinct-counting: the orders custkey stream replayed
    # in micro-batch slices through foreachBatch register max-merges.
    # Max is idempotent AND commutative, so the streamed registers
    # equal the one-shot batch registers under any slicing AND any
    # redelivery — the batch oracle checks the streamed state exactly,
    # with no batch-id dedup needed (contrast stream_cms).
    import tempfile

    from cassandra_data_migration_spark.streaming.hll import (
        hll_maintain_stream,
    )

    # persist: three slice writes re-scanned orders otherwise (the
    # stream_irate precedent, guide §5)
    vals = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").cast("string").alias("v"),
        F.pmod("o_orderkey", F.lit(3)).alias("_slice"),
    ).persist()
    d = tempfile.mkdtemp(prefix="hll_stream_")
    src, sk, ckpt = f"{d}/src", f"{d}/sketch", f"{d}/ckpt"
    for s in range(3):
        vals.filter(F.col("_slice") == s).select("grp", "v").repartition(
            1
        ).write.mode("append").parquet(src)
    vals.unpersist()
    stream = (
        spark.readStream.schema("grp string, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = hll_maintain_stream(stream, sk, "v", ["grp"], checkpoint=ckpt)
    await_or_raise(q, 300)
    return spark.read.parquet(sk).select("grp", "j", "m_rank")


def q_domain_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-source BFS over the synthesized domain graph: driver-
    # looped min-propagation to the fixed point (stamp-detected), the
    # oracle unrolls 8 MATERIALIZED relax rounds — past the measured
    # eccentricity, and converged rounds are no-ops.
    from cassandra_data_migration_spark.operators.graph import (
        domain_bfs_hops,
    )

    return domain_bfs_hops(load_table(spark, sf_dir, "documents"), seed=0)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first-order Markov matrix of user behavior: one lead window on
    # the (ts, event_id)-totally-ordered per-user stream, then
    # state-pair counts + row-normalized ppm probabilities
    from cassandra_data_migration_spark.operators.windows import (
        transition_matrix,
    )

    return transition_matrix(
        load_table(spark, sf_dir, "events"),
        "user_id",
        ["ts", "event_id"],
        "event_type",
    )


def q_domain_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k-core peeling over the synthesized domain graph: iterative
    # delete-below-degree-k until fixpoint (driver loop, data stays
    # on executors).  The oracle unrolls 6 MATERIALIZED peel rounds —
    # more than the measured depth, and converged rounds are no-ops,
    # so the unroll is exact, the same trick as the MMR oracle.
    from cassandra_data_migration_spark.operators.graph import domain_k_core

    return domain_k_core(load_table(spark, sf_dir, "documents"), k=5)


def q_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # point-in-time SCD2 enrichment: every order joins the customer
    # dimension VERSION valid at its order date (key equal + validity
    # range).  The 3-version dimension is synthesized with md5 draws,
    # so the oracle rebuilds it bit-identically; version boundaries
    # are strictly increasing by construction (v*800 + draw%400), so
    # intervals partition time with an exclusive upper bound.
    from cassandra_data_migration_spark.functions.hashing import md5_draw
    from cassandra_data_migration_spark.operators.joins import (
        pit_dimension_join,
    )

    versions = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("v"),
    )
    vf = F.col("v") * 800 + md5_draw("scdv", F.col("o_custkey"), F.col("v")) % 400
    vt = F.when(
        F.col("v") < 2,
        (F.col("v") + 1) * 800
        + md5_draw("scdv", F.col("o_custkey"), F.col("v") + 1) % 400,
    ).otherwise(F.lit(9_999_999))
    dim = versions.select(
        "o_custkey",
        F.col("v").alias("ver"),
        (md5_draw("seg", F.col("o_custkey"), F.col("v")) % 5).alias("segment"),
        vf.alias("vf_day"),
        vt.alias("vt_day"),
    )
    fact = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1992-01-01")).alias("day"),
        "o_totalprice",
    )
    return (
        pit_dimension_join(
            fact, dim, ["o_custkey"], "day", "vf_day", "vt_day"
        )
        .groupBy("segment", "ver")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("sum_price"),
        )
    )


def q_stream_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous weighted sampling: the documents stream replayed in
    # micro-batch slices through foreachBatch min-k merges of A-ES
    # keys.  Content-hash keys make the reservoir a mergeable summary:
    # the streamed state must equal the one-shot batch sample exactly,
    # so the BATCH A-ES oracle checks the STREAMED winners.
    import tempfile

    from cassandra_data_migration_spark.streaming.reservoir import (
        weighted_reservoir_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars", F.pmod("doc_id", F.lit(3)).alias("_s")
    )
    d = tempfile.mkdtemp(prefix="reservoir_stream_")
    src, st, ckpt = f"{d}/src", f"{d}/state", f"{d}/ckpt"
    for s in range(3):
        docs.filter(F.col("_s") == s).drop("_s").repartition(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("lang string, doc_id long, n_chars long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = weighted_reservoir_stream(
        stream, st, "lang", "doc_id", "n_chars", k=5, checkpoint=ckpt
    )
    await_or_raise(q, 300)
    return spark.read.parquet(st).select("lang", "doc_id", "n_chars")


def q_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous KMV maintenance: the orders custkey stream in
    # micro-batch slices through foreachBatch min-union merges — like
    # HLL's max-merge (and unlike CMS's sum), min-union is idempotent,
    # so the streamed ≤k-row state equals the one-shot batch sketch
    # under any slicing AND any redelivery; the batch oracle checks it
    # hash for hash.
    import tempfile

    from cassandra_data_migration_spark.streaming.kmv import (
        kmv_maintain_stream,
    )

    # persist: three slice writes re-scanned orders otherwise (the
    # stream_irate precedent, guide §5)
    vals = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("v"),
        F.pmod("o_orderkey", F.lit(3)).alias("_s"),
    ).persist()
    d = tempfile.mkdtemp(prefix="kmv_stream_")
    src, sk, ckpt = f"{d}/src", f"{d}/sketch", f"{d}/ckpt"
    for s in range(3):
        vals.filter(F.col("_s") == s).select("v").repartition(1).write.mode(
            "append"
        ).parquet(src)
    vals.unpersist()
    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = kmv_maintain_stream(stream, sk, "v", k=256, checkpoint=ckpt)
    await_or_raise(q, 300)
    return spark.read.parquet(sk).select("h")


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KMV sketch set algebra with FULL oracle parity: char-10-gram
    # shingle overlap between the two halves of the corpus (sources
    # src0-9 vs src10-19) — distinct, union AND intersection/Jaccard
    # estimates from O(k) state.  Char shingles (not words — the
    # synthetic vocabulary is ~31 words) push distinct counts far past
    # k, so the k-th-minimum path is genuinely exercised at every sf.
    # The estimator is a pure function of the value sets, so the
    # oracle matches every estimate exactly; within_3sigma audits the
    # ~1/sqrt(k-2) bound on top.
    from cassandra_data_migration_spark.operators.aggregates import (
        kmv_set_ops_audit,
    )
    from cassandra_data_migration_spark.parallel import (
        with_min_parallelism,
    )

    t = F.col("text")
    n = F.length(t) - 9
    # spread the scan BEFORE the ~500× char-gram explode (the
    # shingle_sets convention): the corpus parquet reads as 1-2
    # splits, and without the spread every downstream pass serializes
    # the explode onto one core — measured ×0.8 at sf0.1 and ×0.33 at
    # sf1 (the VERDICT r12 ask-#4 superlinear wall, root-caused to
    # input parallelism, guide §2.5)
    grams = with_min_parallelism(
        load_table(spark, sf_dir, "documents")
    ).select(
        F.substring("source", 4, 10).cast("int").alias("sid"),
        F.explode(
            F.when(
                n >= 1,
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.substring(t, i, 10),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("v"),
    )
    return kmv_set_ops_audit(
        grams.filter(F.col("sid") < 10).select("v"),
        grams.filter(F.col("sid") >= 10).select("v"),
        "v",
    )


def q_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mainframe/copybook staging: export supplier as fixed-width text
    # (printf layout, no delimiter) and parse it back by byte range —
    # substring+trim+cast, fully codegen'd.  Roundtrip must be
    # lossless including the %.2f money column.
    import tempfile

    from cassandra_data_migration_spark.sources.files import (
        fixed_width_export,
        fixed_width_import,
    )

    s = load_table(spark, sf_dir, "supplier")
    d = tempfile.mkdtemp(prefix="fw_rt_")
    fixed_width_export(
        s,
        f"{d}/supplier_fw",
        "%10d%-25s%5d%14.2f",
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        line_width=54,
    )
    return fixed_width_import(
        spark,
        f"{d}/supplier_fw",
        [
            ("s_suppkey", 1, 10, "bigint"),
            ("s_name", 11, 25, "string"),
            ("s_nationkey", 36, 5, "bigint"),
            ("s_acctbal", 41, 14, "double"),
        ],
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyperLogLog with FULL oracle parity: md5-derived registers are
    # bit-reproducible in SQL (leading-zero ranks via string ops, the
    # register sum kept integer-exact), so the oracle rebuilds the
    # identical sketch and matches est_distinct exactly; within_3sigma
    # audits the 1.04/sqrt(m) accuracy bound on top.  Completes the
    # mergeable-sketch family: CMS (sum-merge), Misra-Gries
    # (trim-merge), Bloom (or-merge), HLL (max-merge — idempotent, so
    # replay-safe without batch-id dedup).
    from cassandra_data_migration_spark.operators.aggregates import (
        hll_distinct_audit,
    )

    return hll_distinct_audit(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", "o_custkey"
    )


# Ordered so a budget-capped driver run still yields verdicts for the
# highest-value entries first: (A) the flagship + every SURVEY §2
# migrate/validate/streaming/throttle operator that round 1's driver
# window missed, plus the round-1 regressions; (B) the §2 scan/filter/
# agg block; (C) / (D) the training-data extension blocks.


register_queries(globals())
__all__ = export_all(globals())
