"""Round-5 operators: exact substring-duplication spans (suffix-array
dedup re-expressed), span corruption, preference pairs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_dup_spans_cross_doc_run(spark):
    """An 8-token run shared by two docs is one merged span of 8
    duplicated tokens in each; an all-unique doc reports zero."""
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    rows = [
        (1, f"a1 a2 a3 {shared} a4 a5"),
        (2, f"b1 b2 {shared} b3 b4 b5"),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
    ]
    out = {
        r["doc_id"]: r
        for r in substring_dup_spans(_docs(spark, rows), k=5).collect()
    }
    assert out[1]["n_dup_spans"] == 1 and out[1]["dup_tokens"] == 8
    assert out[2]["n_dup_spans"] == 1 and out[2]["dup_tokens"] == 8
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert out[3]["dup_frac"] == 0.0
    assert out[1]["n_tokens"] == 13
    assert abs(out[1]["dup_frac"] - round(8 / 13, 4)) < 1e-9


def test_substring_dup_spans_self_repetition_two_islands(spark):
    """The same 5-gram twice WITHIN one doc counts (Lee et al. count
    self-repeats); non-adjacent hits stay separate islands."""
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    rows = [(7, "x1 x2 x3 x4 x5 gap1 x1 x2 x3 x4 x5")]
    (r,) = substring_dup_spans(_docs(spark, rows), k=5).collect()
    assert r["n_tokens"] == 11
    assert r["n_dup_spans"] == 2
    assert r["dup_tokens"] == 10  # [1,5] plus [7,11]


def test_substring_dup_spans_short_doc_zero_row(spark):
    """Docs shorter than k still emit a row (left join), all-zero."""
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    rows = [(9, "t1 t2 t3")]
    (r,) = substring_dup_spans(_docs(spark, rows), k=5).collect()
    assert (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"]) == (3, 0, 0)


def test_substring_dup_spans_overlapping_grams_merge(spark):
    """Overlapping duplicated k-grams union into ONE maximal span —
    the property that makes interval union equal SA substring dedup."""
    from cassandra_data_migration_spark.operators.dedup import substring_dup_spans

    run = "r1 r2 r3 r4 r5 r6"  # 6 tokens -> two overlapping 5-grams
    rows = [(1, f"p1 {run} p2"), (2, f"q1 q2 {run} q3")]
    out = {
        r["doc_id"]: r
        for r in substring_dup_spans(_docs(spark, rows), k=5).collect()
    }
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["dup_tokens"] == 6


def test_span_corrupt_density_extremes(spark):
    from cassandra_data_migration_spark.operators.text import span_corrupt

    rows = [(1, "w1 w2 w3 w4 w5")]
    (none,) = span_corrupt(_docs(spark, rows), density=0.0).collect()
    assert none["corrupted_text"] == "w1 w2 w3 w4 w5"
    assert none["target_text"] == "" and none["n_masked"] == 0
    (full,) = span_corrupt(_docs(spark, rows), density=1.0).collect()
    assert full["corrupted_text"] == "<extra_id_0>"
    assert full["target_text"] == "<extra_id_0> w1 w2 w3 w4 w5"
    assert full["n_masked"] == 5 and full["n_spans"] == 1


def test_span_corrupt_reconstructs_original(spark):
    """Splicing each target span back over its sentinel must restore
    the original document exactly — the denoising-pair invariant."""
    import re

    from cassandra_data_migration_spark.operators.text import span_corrupt
    from cassandra_data_migration_spark.sources.tables import load_table
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents").limit(50)
    out = span_corrupt(docs, density=0.3).collect()
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert out and any(r["n_masked"] > 0 for r in out)
    for r in out:
        spans = {}
        for part in re.split(r"(<extra_id_\d+>)", r["target_text"]):
            part = part.strip()
            if not part:
                continue
            if re.fullmatch(r"<extra_id_\d+>", part):
                cur = part
                spans[cur] = ""
            else:
                spans[cur] = part
        rebuilt = " ".join(
            spans[t] if t in spans else t
            for t in r["corrupted_text"].split(" ")
        )
        rebuilt = re.sub(r"\s+", " ", rebuilt).strip()
        assert rebuilt == originals[r["doc_id"]], r["doc_id"]


def test_span_corrupt_deterministic_across_runs(spark):
    from cassandra_data_migration_spark.operators.text import span_corrupt
    from cassandra_data_migration_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    a = {r["doc_id"]: r for r in span_corrupt(docs).collect()}
    b = {r["doc_id"]: r for r in span_corrupt(docs).collect()}
    assert all(
        a[k]["corrupted_text"] == b[k]["corrupted_text"]
        and a[k]["target_text"] == b[k]["target_text"]
        for k in a
    )


def test_preference_pairs_best_vs_worst(spark):
    from cassandra_data_migration_spark.operators.sampling import preference_pairs

    rows = [(i, "g", float(i * 10)) for i in range(1, 7)]  # scores 10..60
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    out = sorted(
        preference_pairs(df, "score", group_col="grp", k=5).collect(),
        key=lambda r: r["pair_ix"],
    )
    # n=6, k=5: ranks 4,5 from the top pair with ranks 3,2 from the
    # bottom -> negative margin -> dropped; only 3 real pairs remain
    assert [(r["chosen_id"], r["rejected_id"]) for r in out] == [
        (6, 1),
        (5, 2),
        (4, 3),
    ]
    assert all(r["margin"] > 0 for r in out)


def test_preference_pairs_ties_and_self_pairs_dropped(spark):
    from cassandra_data_migration_spark.operators.sampling import preference_pairs

    rows = [(1, "g", 5.0), (2, "g", 5.0), (3, "g", 5.0)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    assert preference_pairs(df, "score", group_col="grp", k=5).count() == 0


def test_preference_pairs_single_window_exchange(spark):
    import contextlib
    import io

    import __spark_entry__ as entry_mod
    from tests.conftest import SF_CORRECT

    df = entry_mod.queries()["preference_pairs"](spark, SF_CORRECT)
    df.sparkSession.catalog.clearCache()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # both row_number ranks must come from ONE Window node after one
    # group-keyed exchange; the self-join joins two 2k-row cuts
    assert plan.count("Window") >= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_label_mismatch_and_hardness(spark):
    """Every mined negative has a different label than its query, and
    is at least as similar as any other other-label vector below it."""
    from cassandra_data_migration_spark.operators.similarity import hard_negatives
    from cassandra_data_migration_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, emb.filter(F.col("vec_id") < 5), k=3).collect()
    assert out
    for r in out:
        assert labels[r["negative_id"]] == r["negative_label"]
        assert r["negative_label"] != labels[r["query_id"]]
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_hard_negatives_broadcasts_queries_no_shuffle_of_vectors(spark):
    import contextlib
    import io

    import __spark_entry__ as entry_mod
    from tests.conftest import SF_CORRECT

    df = entry_mod.queries()["hard_negatives"](spark, SF_CORRECT)
    df.sparkSession.catalog.clearCache()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the rank exchange carries score triples, not embedding arrays
    exchange_after = plan.split("Exchange", 1)[1]
    assert "embedding" not in exchange_after.split("Scan parquet", 1)[0]


def test_stream_quantiles_multibatch_equals_single_pass(spark, tmp_path):
    """Replaying the events in 4 micro-batches must converge to the
    same final per-window exact quantiles as computing them in one
    pass (the update-mode 'max n_events per window' reduction)."""
    import uuid as _uuid

    from pyspark.sql import Window

    from cassandra_data_migration_spark.sources.tables import load_table
    from cassandra_data_migration_spark.streaming.quantiles import (
        quantile_ucents,
        windowed_quantiles_stream,
    )
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events").select("ts", "value")
    src = str(tmp_path / "qsrc")
    events.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"q_{_uuid.uuid4().hex[:8]}"
    q = (
        windowed_quantiles_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql(f"SELECT * FROM {name}")
    assert emitted.count() > emitted.select("window_h").distinct().count(), \
        "expected multiple update emissions across micro-batches"
    w = Window.partitionBy("window_h").orderBy(F.desc("n_events"))
    final = {
        r["window_h"]: (r["n_events"], r["p50_uc"], r["p95_uc"], r["p99_uc"])
        for r in emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    # batch expectation: exact quantiles over all values per window
    rows = events.collect()
    by_w = {}
    for r in rows:
        h = int(r["ts"].timestamp() * 1_000_000) // 3_600_000_000
        c = int((r["value"] * 100) + 0.5)
        by_w.setdefault(h, []).append(c)
    for h, cs in by_w.items():
        s = sorted(cs)
        expect = (
            len(s),
            quantile_ucents(s, 0.5),
            quantile_ucents(s, 0.95),
            quantile_ucents(s, 0.99),
        )
        assert final[h] == expect, h


def test_customer_order_distribution_zero_bucket(spark):
    """Customers with no orders land in the c_count=0 bucket (left
    join semantics), and the histogram masses sum to |customers|."""
    from cassandra_data_migration_spark.operators.olap import (
        customer_order_distribution,
    )
    from cassandra_data_migration_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    cust = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")
    out = {r["c_count"]: r["custdist"] for r in
           customer_order_distribution(cust, orders).collect()}
    n_cust = cust.count()
    with_orders = orders.select("o_custkey").distinct().count()
    assert sum(out.values()) == n_cust
    assert out.get(0, 0) == n_cust - with_orders


def test_customer_order_distribution_preaggregates_before_join(spark):
    import contextlib
    import io

    import __spark_entry__ as entry_mod
    from tests.conftest import SF_CORRECT

    df = entry_mod.queries()["customer_order_distribution"](spark, SF_CORRECT)
    df.sparkSession.catalog.clearCache()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the orders aggregate must sit BELOW the join: the join reads the
    # (custkey, n) table, never the raw orders rows
    join_pos = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"),
                   plan.find("ShuffledHashJoin"))
    assert join_pos >= 0
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 levels
    assert "CartesianProduct" not in plan


def test_mg_sketch_covers_planted_hitter_within_bound(spark):
    """A token holding >25% of the stream must survive a capacity-16
    sketch with estimate within N/(m+1), whatever the partitioning."""
    from cassandra_data_migration_spark.operators.aggregates import (
        mg_heavy_hitters_audit,
        mg_token_sketch,
    )

    rows = []
    for i in range(400):
        # hot token every row, plus per-row noise tokens
        rows.append((i, f"hot n{i}a n{i}b n{i}c"))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    sketch = {r["term"]: r["est"] for r in mg_token_sketch(df, m=16).collect()}
    n_total = 1600
    assert "hot" in sketch
    assert 400 - sketch["hot"] <= n_total // 17
    audit = mg_heavy_hitters_audit(df, m=16).collect()
    assert audit  # 'hot' is a true heavy hitter at this threshold
    assert all(r["covered"] and r["bound_ok"] for r in audit)


def test_mg_sketch_partial_size_capped(spark):
    """Each partition's partial summary holds at most m rows even on
    an all-distinct stream (the <= m-rows-per-task shuffle claim)."""
    from cassandra_data_migration_spark.operators.aggregates import (
        mg_token_sketch,
    )

    rows = [(i, " ".join(f"u{i}_{j}" for j in range(50))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    total = mg_token_sketch(df, m=32).count()
    assert total <= 32 * 4


def test_parquet_evolved_read_null_fills_old_files(spark, tmp_path):
    from cassandra_data_migration_spark.sources.files import parquet_evolved_read

    d = str(tmp_path / "evolve")
    spark.createDataFrame([(1, 10.0)], "k long, v double").write.parquet(d)
    spark.createDataFrame(
        [(2, 20.0, "new")], "k long, v double, tag string"
    ).write.mode("append").parquet(d)
    rows = {r["k"]: r for r in parquet_evolved_read(spark, d).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["tag"] is None and rows[2]["tag"] == "new"


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant vertex: each K4 vertex sits in 3 triangles
    (4 total), the pendant in none; clustering of a K4 vertex is 1."""
    from cassandra_data_migration_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 9)]
    und = spark.createDataFrame(edges, "a long, b long")
    out = {r["v"]: r for r in triangle_counts(und).collect()}
    for v in range(3):
        assert out[v]["n_triangles"] == 3 and out[v]["degree"] == 3
    assert out[3]["n_triangles"] == 3 and out[3]["degree"] == 4
    assert out[9]["n_triangles"] == 0 and out[9]["degree"] == 1


def test_triangle_counts_triangle_free_graph(spark):
    from cassandra_data_migration_spark.operators.graph import triangle_counts

    # a 6-cycle has no triangles
    und = spark.createDataFrame(
        [(i, i + 1) for i in range(5)] + [(0, 5)], "a long, b long"
    )
    rows = triangle_counts(und).collect()
    assert all(r["n_triangles"] == 0 for r in rows)
    assert all(r["degree"] == 2 for r in rows)


def test_snapshot_diff_classifies_all_four_states(spark):
    from cassandra_data_migration_spark.operators.setops import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    out = {r["status"]: r["n_docs"] for r in snapshot_diff(old, new).collect()}
    assert out == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_mv_apply_delta_equals_recompute(spark):
    """Signed-delta maintenance must equal rebuilding the view from
    the post-changelog base, including key disappearance at count 0
    and new-key appearance."""
    from cassandra_data_migration_spark.operators.mv import (
        mv_apply_delta,
        mv_build,
    )

    base = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double"
    )
    log = spark.createDataFrame(
        [
            (1, "D", 10.0, None),   # k=1 loses a row
            (2, "D", 5.0, None),    # k=2 empties out -> drops
            (3, "I", None, 7.0),    # new key appears
            (1, "U", 20.0, 25.0),   # k=1 value bump
        ],
        "k long, op string, before_v double, after_v double",
    )
    mv = mv_build(base, "k", "v")
    out = {
        r["k"]: (r["n_rows"], float(r["sum_val"]))
        for r in mv_apply_delta(mv, log, "k").collect()
    }
    assert out == {1: (1, 25.0), 3: (1, 7.0)}
    assert 2 not in out


def test_stream_mv_converges_regardless_of_slicing(spark, tmp_path):
    """Signed deltas commute: replaying the changelog in per-file
    micro-batches (in whatever order the source lists them) must
    produce the same view as one batch apply."""
    from cassandra_data_migration_spark.operators.mv import (
        mv_apply_delta,
        mv_build,
    )
    from cassandra_data_migration_spark.streaming.mv import mv_maintain_stream

    base = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (2, 6.0)], "k long, v double"
    )
    log_rows = [
        (1, "U", 10.0, 12.0),
        (2, "D", 5.0, None),
        (3, "I", None, 9.0),
        (1, "I", None, 4.0),
    ]
    schema = "k long, op string, before_v double, after_v double"
    d = str(tmp_path)
    view, src, ckpt = f"{d}/view", f"{d}/log", f"{d}/ckpt"
    mv_build(base, "k", "v").write.parquet(view)
    for i, row in enumerate(log_rows):
        spark.createDataFrame([row], schema).repartition(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = mv_maintain_stream(stream, view, "k", ckpt)
    q.awaitTermination(120)
    streamed = {
        r["k"]: (r["n_rows"], float(r["sum_val"]))
        for r in spark.read.parquet(view).collect()
    }
    batch = {
        r["k"]: (r["n_rows"], float(r["sum_val"]))
        for r in mv_apply_delta(
            mv_build(base, "k", "v"),
            spark.createDataFrame(log_rows, schema),
            "k",
        ).collect()
    }
    assert streamed == batch
    assert streamed[1] == (2, 16.0) and streamed[3] == (1, 9.0)
    assert 2 in streamed and streamed[2] == (1, 6.0)


def test_join_cardinality_audit_exact_on_fk_join(spark):
    """On a clean FK join (every lineitem has an order), the estimate
    equals the actual cardinality exactly — ratio_e4 == 10000."""
    import __spark_entry__ as entry_mod
    from tests.conftest import SF_SMOKE

    (r,) = entry_mod.queries()["join_cardinality_audit"](
        spark, SF_SMOKE
    ).collect()
    assert r["ndv_a"] == r["n_a"]  # orderkey is the orders PK
    assert r["est_rows"] == r["actual_rows"] == r["n_b"]
    assert r["ratio_e4"] == 10000


def test_join_cardinality_audit_flags_skew(spark):
    """A correlated/skewed key must push ratio_e4 far from 10000 —
    the signal the audit exists to surface."""
    from cassandra_data_migration_spark.operators.quality import (
        join_cardinality_audit,
    )

    a = spark.createDataFrame(
        [(1,)] * 90 + [(k,) for k in range(2, 12)], "k long"
    )
    b = spark.createDataFrame([(1,)] * 90 + [(99,)] * 10, "k long")
    (r,) = join_cardinality_audit(a, b, "k", "k").collect()
    assert r["actual_rows"] == 8100
    assert r["ratio_e4"] > 80000  # estimate off by >8x under skew


def test_y4m_roundtrip_and_sampling(spark):
    from cassandra_data_migration_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        video_frame_stats,
    )

    frames = [bytes((f * 10 + j) % 256 for j in range(48)) for f in range(5)]
    payload = encode_y4m(4, 4, frames, fps=(30, 1))
    w, h, out = decode_y4m(payload)
    assert (w, h) == (4, 4) and out == frames
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {r["frame_index"]: r for r in video_frame_stats(df, every_n=2).collect()}
    assert set(rows) == {0, 2, 4}  # every 2nd of 5 frames
    for fi, r in rows.items():
        assert r["y_sum"] == sum(frames[fi][:16])


def test_y4m_unsupported_colorspace_raises(spark):
    import pytest as _pytest

    from cassandra_data_migration_spark.operators.multimodal import decode_y4m

    bad = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\nFRAME\n" + bytes(24)
    with _pytest.raises(NotImplementedError):
        decode_y4m(bad)


def test_audio_tone_stats_finds_mixed_tone_bins(spark):
    """Two tones of different amplitude: the louder one wins the
    dominant bin; WAV roundtrip through the stdlib codec."""
    import math

    from cassandra_data_migration_spark.operators.multimodal import (
        audio_tone_stats,
        encode_wav,
    )

    n = 64

    def tone(cyc, amp):
        return [amp * math.sin(2 * math.pi * cyc * t / n) for t in range(n)]

    mix = [
        int(round(a + b))
        for a, b in zip(tone(3, 12000), tone(11, 4000))
    ]
    pcm = b"".join(v.to_bytes(2, "little", signed=True) for v in mix)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(pcm)))], "doc_id long, payload binary"
    )
    (r,) = audio_tone_stats(df, n_fft=n).collect()
    assert r["dominant_bin"] == 3 and r["n_samples"] == n
