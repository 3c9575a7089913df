"""Physical-plan regression tests (SURVEY.md §4, SCALING.md).

Correctness tests prove the operators compute the right answer; these
prove they compute it with the right PLAN — pushdown, pruning,
broadcast, partial aggregation.  A regression here is invisible at
sf0.01 and catastrophic at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    # another module's cached table would swap the parquet scan for an
    # InMemoryRelation and hide ReadSchema/pushdown lines — plan
    # assertions must see the real scan regardless of test order
    df.sparkSession.catalog.clearCache()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(entry_mod.queries()["filter_eq"](spark, SF_CORRECT))
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]" in plan


def test_projection_prunes_columns(spark):
    plan = _plan(entry_mod.queries()["projection"](spark, SF_CORRECT))
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>" in plan
    assert "c_acctbal" not in plan  # untouched column never read


def test_fk_join_is_broadcast(spark):
    plan = _plan(entry_mod.queries()["fk_join_enrich"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_missing_rows_anti_join_prunes_probe_side(spark):
    plan = _plan(entry_mod.queries()["missing_rows"](spark, SF_CORRECT))
    assert "LeftAnti" in plan
    # probe (target) side only ever needs the pk column
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_pricing_summary_has_partial_aggregation(spark):
    plan = _plan(entry_mod.queries()["pricing_summary"](spark, SF_CORRECT))
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "LessThanOrEqual(l_shipdate" in plan  # date predicate pushed


def test_point_lookup_pushes_both_predicates(spark):
    plan = _plan(entry_mod.queries()["point_lookup"](spark, SF_CORRECT))
    # don't pin the probe key (the fixture picks one present at every
    # sf) — assert both PK predicates reach the parquet scan
    assert "EqualTo(l_orderkey," in plan
    assert "EqualTo(l_linenumber," in plan


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(entry_mod.queries()["limit_n"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan


def test_bucketed_tables_join_without_shuffle(spark):
    """The SCALING.md co-location claim: two tables bucketed on the join
    key join with NO Exchange — the 100 TB validation-join strategy.
    (Managed tables in the default warehouse; dropped afterwards.)"""
    src = spark.range(10_000).selectExpr("id AS k", "id * 2 AS v")
    for name in ("bkt_a", "bkt_b"):
        (
            src.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable(name)
        )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the big-table strategy (SMJ); at 100 TB neither side
        # broadcasts, so THIS is the plan whose shuffle matters
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_pure_sql_interface_over_registered_views(spark):
    """register_views exposes every table to spark.sql — the SQL face
    of the same declarative plans (pushdown still applies)."""
    from cassandra_data_migration_spark.sources.tables import register_views

    register_views(spark, SF_CORRECT)
    row = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS cnt
        FROM orders WHERE o_orderkey % 2 = 0
        GROUP BY o_orderstatus ORDER BY cnt DESC LIMIT 1
        """
    ).first()
    assert row.cnt > 0


def test_salted_join_spreads_hot_key_over_salt_partitions(spark):
    """The skew-salting claim: with broadcast disabled (the big-big
    case), the shuffle keys are (key, salt) — a hot key hashes to
    num_salts different partitions instead of one."""
    from cassandra_data_migration_spark.operators.joins import salted_equi_join

    facts = spark.range(1000).selectExpr("id % 3 AS k", "id AS v")
    dim = spark.range(3).selectExpr("id AS k", "id * 10 AS attr")
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(salted_equi_join(facts, dim, "k", num_salts=4))
        assert "SortMergeJoin" in plan
        assert "_salt" in plan  # salt is part of the join/exchange key
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_repetition_signals_is_shuffle_free(spark):
    # both Gopher signals are scan-stage array expressions: any
    # Exchange here would mean the n-gram stream is being shuffled
    plan = _plan(entry_mod.queries()["repetition_signals"](spark, SF_CORRECT))
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_decontaminate_broadcasts_benchmark_ngrams(spark):
    # the corpus side must stream through a broadcast join — a
    # SortMergeJoin would shuffle the full corpus n-gram volume
    plan = _plan(entry_mod.queries()["decontaminate"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sessionize_shuffles_once_on_user_key(spark):
    # lag window, running sum, and the session aggregate must all
    # reuse ONE hash partitioning on user_id
    plan = _plan(entry_mod.queries()["event_sessions"](spark, SF_CORRECT))
    assert plan.count("Exchange (") == 1  # exactly one shuffle node
    assert "hashpartitioning(user_id" in plan


def test_write_batches_shuffles_once_on_partition_key(spark):
    # batch assignment rides ONE exchange on the partition key — the
    # same co-location the batched sink needs, so the rank is free
    plan = _plan(entry_mod.queries()["write_batches"](spark, SF_CORRECT))
    assert plan.count("Exchange (") == 1
    assert "hashpartitioning(o_custkey" in plan
    # only the two needed columns ever leave the scan
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>" in plan


def test_table_stats_pushes_aggregates_to_footer(spark):
    # COUNT/MIN/MAX must be answered from parquet footer statistics —
    # the scan never reads row data
    plan = _plan(entry_mod.queries()["table_stats"](spark, SF_CORRECT))
    assert "PushedAggregation: [COUNT(*)" in plan
    assert "MIN(l_orderkey)" in plan and "MAX(l_extendedprice)" in plan


def test_rp_projection_is_shuffle_free(spark):
    # JL projection is pure scan-side codegen — the matrix enters as
    # literals, so no exchange and no Python boundary
    plan = _plan(entry_mod.queries()["rp_projection"](spark, SF_CORRECT))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_writetime_collapse_is_shuffle_free(spark):
    # row-level metadata collapse is a pure projection — no exchange
    plan = _plan(entry_mod.queries()["writetime_collapse"](spark, SF_CORRECT))
    assert "Exchange" not in plan


def test_pack_sequences_shuffles_once_on_group_key(spark):
    # the running sum and bin assignment must ride ONE source-keyed
    # exchange; a second shuffle would mean the window repartitioned
    plan = _plan(entry_mod.queries()["pack_sequences"](spark, SF_CORRECT))
    assert plan.count("Exchange (") == 1
    assert "hashpartitioning(source" in plan


def test_tfidf_never_shuffles_raw_tokens(spark):
    # term histograms fold scan-side; df and corpus size re-enter via
    # broadcast — the only corpus-shaped exchange is doc-keyed (top-k
    # window), never token-shaped
    plan = _plan(entry_mod.queries()["tfidf_keywords"](spark, SF_CORRECT))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_quantized_topk_is_takeordered_no_shuffle(spark):
    # SQ8 ANN must keep cosine_topk's shape: scan-stage quantization +
    # TakeOrdered — no exchange anywhere
    plan = _plan(entry_mod.queries()["quantized_topk"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_incremental_dedup_joins_fingerprints_not_documents(spark):
    # the anti-join must move 16-byte fingerprints: the text column
    # may not survive past the scan projection
    df = entry_mod.queries()["incremental_dedup"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "LeftAnti" in plan
    assert "text" not in df.columns


def test_pq_topk_is_takeordered_no_shuffle(spark):
    # PQ encode is scan-stage expression over codebook literals and
    # ADC scoring is table lookups: the whole search must stay
    # exchange-free with a TakeOrdered top-k
    plan = _plan(entry_mod.queries()["pq_adc_topk"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_sliding_rate_single_aggregate_no_second_scan(spark):
    # overlap comes from map-side window duplication (one Expand node
    # over a single scan), one partial-aggregated shuffle — never a
    # union of two scans
    plan = _plan(entry_mod.queries()["sliding_rate"](spark, SF_CORRECT))
    assert "Expand" in plan and "Union" not in plan
    assert "partial_count" in plan
    assert plan.count("Exchange (") == 1


def test_bigram_scoring_stays_jvm_side(spark):
    # LM fit + scoring is all built-in expressions — no Python boundary
    plan = _plan(entry_mod.queries()["bigram_logprob"](spark, SF_CORRECT))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_negative_pairs_only_shuffles_for_payload_join(spark):
    # draws are row-local arithmetic; no global rank or window
    plan = _plan(entry_mod.queries()["negative_pairs"](spark, SF_CORRECT))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_winnow_shuffles_hashes_never_text(spark):
    # the doc-keyed window exchange must carry (doc, pos, hash) rows
    # only — the text column dies at the scan projection
    plan = _plan(entry_mod.queries()["winnow_fingerprints"](spark, SF_CORRECT))
    exchange_after = plan.split("Exchange", 1)[1]
    assert "text" not in exchange_after.split("(1) Scan parquet", 1)[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sample_validate_broadcasts_sample_no_sortmerge(spark):
    # the n-row sample must broadcast into the target probe (one scan,
    # no repartition of the big side) and the sample itself must be a
    # TakeOrdered, not a global sort
    plan = _plan(entry_mod.queries()["sample_validate"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_giant_expression_queries_survive_strict_codegen(spark):
    # round-1 regression net: the PQ/k-means literal-heavy expressions
    # once blew past janino's method limits — Spark then silently falls
    # back to interpreted evaluation (or worse, hangs compiling).  With
    # fallback disabled, a codegen blowup fails THIS test instead of
    # shipping a 10-100x slower interpreted plan.
    prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        for name in ("pq_codes", "pq_adc_topk", "kmeans_clusters", "rp_projection"):
            assert entry_mod.queries()[name](spark, SF_CORRECT).count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)


def test_bloom_probe_broadcasts_bits_no_candidate_shuffle(spark):
    # the candidate scan must join the 1-row bit array by broadcast;
    # any Exchange on the probe side would defeat the pre-filter
    plan = _plan(entry_mod.queries()["bloom_membership"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stratified_sample_is_scan_side_filter(spark):
    # any number of strata, zero exchanges: membership is one predicate
    plan = _plan(entry_mod.queries()["stratified_sample"](spark, SF_CORRECT))
    assert "Exchange" not in plan


def test_asof_join_shuffles_once_on_key(spark):
    # union-window as-of: the union is narrow, so BOTH inputs flow
    # through exactly one exchange, on the join key — a range join
    # would show per-probe work or a nested loop
    plan = _plan(entry_mod.queries()["asof_last_click"](spark, SF_CORRECT))
    # formatted output lists each node twice (tree + "(n) Exchange"
    # detail header); count the detail headers = physical nodes
    assert plan.count(") Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_dedup_shuffles_hashes_not_text(spark):
    # every exchange must carry the 16-byte md5 key or doc aggregates;
    # raw chunk_text may never cross a shuffle boundary
    plan = _plan(entry_mod.queries()["chunk_dedup"](spark, SF_CORRECT))
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "chunk_text" not in line


def test_dsir_scoring_is_broadcast_fold_takeordered(spark):
    # the fitted 64-bucket log-ratio table must re-enter as a 1-row
    # broadcast (no sort-merge join against the corpus) and the top-k
    # must be a TakeOrdered, not a global sort
    plan = _plan(entry_mod.queries()["dsir_select"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_hashed_clf_is_shuffle_free_scan(spark):
    # classifier folds inside the scan: no exchange, no explode
    plan = _plan(entry_mod.queries()["hashed_quality_clf"](spark, SF_CORRECT))
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode — aggregate over transform
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_heavy_hitters_prefilters_with_broadcast_semi(spark):
    # exact pass only sees tokens surviving the bucket sketch
    plan = _plan(entry_mod.queries()["heavy_hitters"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_stable_dense_ids_never_single_partitions(spark):
    # the whole point: no Window over an un-partitioned global sort
    plan = _plan(entry_mod.queries()["stable_dense_ids"](spark, SF_CORRECT))
    assert "SinglePartition" not in plan
    assert "Window" in plan  # per-bucket windows remain
    # offsets ride a broadcast join, not a literal map whose plan size
    # would grow with the bucket count
    assert "map_from_arrays" not in plan
    assert "BroadcastHashJoin" in plan


def test_id_gap_islands_offsets_are_broadcast_not_literal(spark):
    plan = _plan(entry_mod.queries()["id_gap_islands"](spark, SF_CORRECT))
    assert "SinglePartition" not in plan
    assert "map_from_arrays" not in plan
    assert "BroadcastHashJoin" in plan


def test_scd2_windows_are_key_partitioned(spark):
    plan = _plan(entry_mod.queries()["scd2_history"](spark, SF_CORRECT))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan


def test_robust_scale_joins_are_broadcast(spark):
    plan = _plan(entry_mod.queries()["robust_scale"](spark, SF_CORRECT))
    assert "SortMergeJoin" not in plan


def test_rrf_corpus_work_stays_in_rankers(spark):
    # fused lists are TakeOrdered outputs; no corpus-wide global sort
    plan = _plan(entry_mod.queries()["hybrid_rrf"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan


def test_url_groups_aggregate_never_ships_text(spark):
    plan = _plan(entry_mod.queries()["url_canonical_groups"](spark, SF_CORRECT))
    assert "partial_count" in plan or "partial_min" in plan  # map-side combine
    assert "text" not in plan.split("ReadSchema")[1][:200]  # text column unread


def test_shipping_priority_broadcasts_dim_and_takeordered(spark):
    """Q3 shape: customer dim broadcasts, top-k is TakeOrdered (no
    global sort), and the date filters reach the parquet scans."""
    plan = _plan(entry_mod.queries()["shipping_priority"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan and "IsNotNull" in plan


def test_region_volume_only_fact_join_shuffles(spark):
    """Q5 shape: the entire region→nation→customer/supplier dimension
    chain broadcasts — the only hash-partition exchanges left are the
    fact-fact join sides and the final aggregation."""
    plan = _plan(entry_mod.queries()["region_volume"](spark, SF_CORRECT))
    assert plan.count("BroadcastHashJoin") >= 3
    # fact-fact join (2 sides) + final agg = at most 3 exchanges
    assert plan.count("Exchange hashpartitioning") <= 3


def test_ring_assignment_token_computed_once_then_broadcast_joined(spark):
    # the md5 token must be materialized in a projection BELOW the
    # join (computed once per row), with the tiny ring table broadcast
    # — never re-evaluated per ring slot inside a HOF lambda
    plan = _plan(entry_mod.queries()["ring_ownership"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the join condition compares the MATERIALIZED token attribute,
    # not an inline md5 expression
    cond = [l for l in plan.splitlines() if "Join condition:" in l]
    assert cond and "_tok#" in cond[0] and "md5" not in cond[0]
    assert "partial_count" in plan  # ownership report map-combines


def test_merkle_digests_partially_aggregate_and_read_only_needed_cols(spark):
    plan = _plan(entry_mod.queries()["merkle_range_diff"](spark, SF_CORRECT))
    # leaf digests are map-combined before the shuffle: the exchange
    # carries O(leaves) partial rows, never row data
    assert "partial_count" in plan and "partial_sum" in plan
    assert "FullOuter" in plan


def test_prefix_filter_never_builds_a_cartesian(spark):
    plan = _plan(
        entry_mod.queries()["prefix_filter_pairs"](spark, SF_CORRECT)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_order_priority_check_bounded_exists_with_pushed_dates(spark):
    # round 12: EXISTS(shipdate > T) is rewritten to a per-order-key
    # max() aggregate joined back — the broadcast build side is now
    # O(orders), never the full lineitem projection (the sf1 403 MB
    # task-peak shape SCALE_PROBE_r11 flagged)
    plan = _plan(
        entry_mod.queries()["order_priority_check"](spark, SF_CORRECT)
    )
    assert "max(l_shipdate" in plan  # pre-aggregated EXISTS
    assert "partial_max(l_shipdate" in plan  # map-side combined
    assert "LeftSemi" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # window pushed to scan
    # lineitem side reads only the two needed columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_shipdate:timestamp" in plan


def test_large_volume_orders_broadcasts_qualifying_keys(spark):
    plan = _plan(
        entry_mod.queries()["large_volume_orders"](spark, SF_CORRECT)
    )
    # HAVING-filtered key set broadcasts; the fact table is scanned once
    assert "BroadcastHashJoin" in plan
    assert plan.count("+- Scan parquet") == 3  # lineitem, orders, customer


def test_disjunctive_predicate_pushes_single_side_conjuncts(spark):
    plan = _plan(
        entry_mod.queries()["disjunctive_revenue"](spark, SF_CORRECT)
    )
    # the quantity envelope reaches the lineitem scan; the brand/size
    # disjunction reaches the part scan — neither waits for the join
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan
    assert "In(p_brand" in plan
    assert "BroadcastHashJoin" in plan


def test_promo_revenue_single_aggregation_no_second_scan(spark):
    plan = _plan(entry_mod.queries()["promo_revenue"](spark, SF_CORRECT))
    # numerator + denominator in ONE aggregate over one joined scan
    assert plan.count("+- Scan parquet") == 2  # lineitem + part only
    assert "partial_sum" in plan


def test_cdc_apply_single_key_shuffle(spark):
    plan = _plan(entry_mod.queries()["cdc_apply"](spark, SF_CORRECT))
    # one hash exchange on the key, then window + scan-side filter;
    # WindowGroupLimit pushes the rank<=1 cutoff below the final sort
    # so each partition keeps one candidate row per key pre-shuffle
    assert plan.count("+- Exchange ") == 1
    assert "WindowGroupLimit" in plan


def test_substring_dup_spans_shuffles_hashes_never_text(spark):
    # posting/count/island exchanges carry (doc, pos, 8-byte hash)
    # rows only — the text column must die at the scan projection
    plan = _plan(entry_mod.queries()["substring_dup_spans"](spark, SF_CORRECT))
    exchange_after = plan.split("Exchange", 1)[1]
    assert "text" not in exchange_after.split("(1) Scan parquet", 1)[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_binned_range_join_avoids_nested_loop(spark):
    # the whole point of the bin trick: a pure-range predicate must
    # plan as an equi-join on the bin key, never a nested-loop join
    plan = _plan(entry_mod.queries()["range_join_pairs"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_stabbing_sweep_plan_is_linear_shaped(spark):
    # the COUNT form of the range join: no nested loop, no pair join —
    # exactly the two prefix-sum windows (per-block running sum + the
    # one-row-per-block offset cumsum) and an equi-join on the
    # coordinate
    import re

    plan = _plan(entry_mod.queries()["in_transit_orders"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 2


def test_fused_pair_generation_has_no_window_pass(spark):
    # round 10 fused bounded_bucket_pairs into ONE groupBy aggregation:
    # the count window + lead/min windows (two full sorts + two
    # WindowExecs in round 9's plan) must never come back
    import re

    for q in ("dedup_ngram_jaccard", "prefix_filter_pairs"):
        plan = _plan(entry_mod.queries()[q](spark, SF_CORRECT))
        assert len(re.findall(r"\(\d+\) Window", plan)) == 0, q
        assert "CartesianProduct" not in plan, q


def test_cms_sketch_has_partial_aggregation(spark):
    # cell counts must map-side combine: the shuffle carries at most
    # depth*width partial cells per task, not one row per token
    plan = _plan(entry_mod.queries()["cms_token_counts"](spark, SF_CORRECT))
    assert "partial_count" in plan


def test_pit_dimension_join_uses_equi_join_not_nested_loop(spark):
    # SCD2 enrichment has an equi key: the validity range must ride as
    # a post-join condition on a hash/sort-merge join, never force a
    # nested loop over the dimension
    plan = _plan(entry_mod.queries()["pit_enrich"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
