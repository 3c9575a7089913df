"""Round-9 feature tests: bounded-bucket candidate generation.

VERDICT r8 ask #1: peak task memory of the dedup pair generators grew
super-linearly (exponents up to 1.74) on the 10× replicated-density
fixture because a hot bucket (shingle posting list / prefix token /
LSH band) materialized O(family²) candidate pairs.  The fix —
``bounded_bucket_pairs`` — enumerates all pairs only in buckets at or
under the cap and falls back to deterministic bounded-degree survivor
edges (chain + star-to-min) in hotter buckets.  These tests pin:

- the small path equals naive all-pairs (losslessness below the cap);
- the survivor path's exact edge set, count (2n−3 after distinct) and
  connectivity;
- determinism under repartitioning / row order;
- that the exact-Jaccard operators are unchanged below the cap and
  stay verified-exact (every emitted pair's Jaccard is true) above it.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.dedup import (
    DEFAULT_BUCKET_CAP,
    bounded_bucket_pairs,
    ngram_jaccard_pairs,
    prefix_filter_pairs,
)


def _entries(spark, buckets: dict[int, list[int]]):
    rows = [(k, m) for k, ms in buckets.items() for m in ms]
    return spark.createDataFrame(rows, "k long, m long")


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_small_buckets_are_all_pairs(spark):
    buckets = {1: [3, 1, 2], 2: [10, 11], 3: [7]}
    got = _pairs(bounded_bucket_pairs(_entries(spark, buckets), "k", "m", cap=8))
    want = set()
    for ms in buckets.values():
        want |= {tuple(sorted(p)) for p in itertools.combinations(ms, 2)}
    assert got == want


def test_big_bucket_survivor_edges_shape(spark):
    # one bucket of 10 members with cap 4 -> chain (9 edges) + star
    # (9 edges), minus the shared (min, second) edge = 17 = 2n-3
    members = [20, 5, 9, 13, 2, 30, 8, 40, 11, 3]
    got = _pairs(bounded_bucket_pairs(_entries(spark, {1: members}), "k", "m", cap=4))
    s = sorted(members)
    chain = {(s[i], s[i + 1]) for i in range(len(s) - 1)}
    star = {(s[0], m) for m in s[1:]}
    assert got == chain | star
    assert len(got) == 2 * len(members) - 3
    # connectivity: union-find over the survivor edges joins everything
    parent = {m: m for m in members}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        parent[find(a)] = find(b)
    assert len({find(m) for m in members}) == 1


def test_mixed_buckets_and_determinism(spark):
    buckets = {1: list(range(100, 80, -1)), 2: [1, 2, 3], 3: [50, 60]}
    e = _entries(spark, buckets)
    base = _pairs(bounded_bucket_pairs(e, "k", "m", cap=5))
    # survivor selection must not depend on partitioning or row order
    shuffled = e.orderBy(F.rand(seed=7)).repartition(13)
    again = _pairs(bounded_bucket_pairs(shuffled, "k", "m", cap=5))
    assert base == again
    # small buckets exact, big bucket bounded
    assert (1, 2) in base and (1, 3) in base and (2, 3) in base
    assert (50, 60) in base
    big = [p for p in base if p[0] >= 81 and p[1] <= 100]
    assert len(big) == 2 * 20 - 3


def test_pair_output_linear_in_hot_bucket(spark):
    # the structural bound itself: a bucket of n >> cap members emits
    # O(n) pairs, not O(n²)
    n = 500
    got = bounded_bucket_pairs(
        _entries(spark, {1: list(range(n))}), "k", "m", cap=16
    ).count()
    assert got == 2 * n - 3


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_ngram_jaccard_unchanged_below_cap(spark):
    texts = [
        "a b c d e f g h",
        "a b c d e f g x",
        "p q r s t u v w",
        "p q r s t u v w",
        "z z z y y y x x",
    ]
    docs = _docs(spark, texts)
    capped = _pairs(ngram_jaccard_pairs(docs, threshold=0.3))
    giant_cap = _pairs(ngram_jaccard_pairs(docs, threshold=0.3, bucket_cap=10**6))
    assert capped == giant_cap
    assert (2, 3) in capped  # identical docs via multiplicity collapse
    assert (0, 1) in capped
    # prefix-filter path agrees (both lossless below the cap)
    pf = _pairs(prefix_filter_pairs(docs, threshold=0.3))
    assert pf == capped


def test_capped_pairs_stay_exact_and_connected(spark):
    # a "boilerplate family": 12 docs sharing a long common body, each
    # with a tiny unique suffix -> with a tiny cap the posting lists go
    # through the survivor path; every emitted pair must still carry
    # its TRUE Jaccard and the family must stay connected
    body = " ".join(f"w{i}" for i in range(30))
    texts = [f"{body} u{j}" for j in range(12)]
    docs = _docs(spark, texts)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, bucket_cap=10**6
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5, bucket_cap=4).collect()
    }
    # subset with identical values: verification is exact either way
    assert set(capped) <= set(exact)
    for p, j in capped.items():
        assert j == exact[p]
    # connectivity of the family is preserved by the chain+star edges
    parent = {i: i for i in range(12)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in capped:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(12)}) == 1


def _plan_text(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pq_index_persisted_lifecycle(spark, tmp_path):
    # VERDICT r8 ask #3: PQ codebooks get the same train-once/
    # probe-many lifecycle as the IVF index — probe plans carry zero
    # encode/training stages and reproduce the in-query ADC path
    from cassandra_data_migration_spark.operators.ann_index import (
        persist_pq_index,
        pq_probe_persisted,
    )
    from cassandra_data_migration_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook,
    )
    from cassandra_data_migration_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    p = str(tmp_path / "pq")
    v0 = persist_pq_index(spark, emb, p, n_centroids=8, num_subspaces=8)
    assert v0 == 0
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    probe = pq_probe_persisted(spark, p, qv, k=5, exclude_ids=[0])
    plan = _plan_text(probe)
    # scan of the persisted codes only: no encode (the argmin
    # projection over the float vectors), no Arrow stage, no training
    assert "MapInPandas" not in plan and "ArrowEval" not in plan
    assert "array_min" not in plan  # pq_encode's argmin marker
    assert "embedding" not in plan  # never touches the float tier
    # parity: the probe equals the in-query encode+score path
    cb = pq_codebook(emb, n_centroids=8)
    inline = pq_adc_topk(emb, qv, cb, k=5, exclude_ids=[0])
    assert [tuple(r) for r in probe.collect()] == [
        tuple(r) for r in inline.collect()
    ]
    # version evolution: retraining publishes v1, v0 stays probe-able
    baseline = [tuple(r) for r in probe.collect()]
    v1 = persist_pq_index(spark, emb, p, n_centroids=4, num_subspaces=8)
    assert v1 == 1
    again_v0 = pq_probe_persisted(spark, p, qv, k=5, exclude_ids=[0], version=0)
    assert [tuple(r) for r in again_v0.collect()] == baseline


def test_sq8_persisted_lifecycle(spark, tmp_path):
    from cassandra_data_migration_spark.operators.ann_index import (
        persist_sq8_table,
        sq8_topk_persisted,
    )
    from cassandra_data_migration_spark.operators.similarity import (
        quantized_topk,
    )
    from cassandra_data_migration_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    p = str(tmp_path / "sq8")
    assert persist_sq8_table(spark, emb, p) == 0
    probe = sq8_topk_persisted(spark, p, query_id=0, k=5)
    plan = _plan_text(probe)
    # no per-query re-quantization: the scale derivation
    # (array_max over |x|) and the float tier are absent
    assert "array_max" not in plan and "embedding" not in plan
    assert "MapInPandas" not in plan
    inline = quantized_topk(emb, query_id=0, k=5)
    assert [tuple(r) for r in probe.collect()] == [
        tuple(r) for r in inline.collect()
    ]


def test_pq_sq8_vacuum_retention(spark, tmp_path):
    # the PQ/SQ8 artifacts get the same retention close-out the IVF
    # index has: versions past the horizon are reclaimed, the latest
    # stays probe-able
    import os

    from cassandra_data_migration_spark.operators.ann_index import (
        persist_pq_index,
        persist_sq8_table,
        pq_probe_persisted,
        sq8_topk_persisted,
        vacuum_pq_index,
        vacuum_sq8_table,
    )
    from cassandra_data_migration_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    p = str(tmp_path / "pq")
    for k in (8, 4, 2):
        persist_pq_index(spark, emb, p, n_centroids=k, num_subspaces=8)
    removed = vacuum_pq_index(p, keep_versions=2)
    assert any("codes_v0" in r for r in removed)
    assert not os.path.exists(f"{p}/codes_v0")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    assert pq_probe_persisted(spark, p, qv, k=3).count() == 3  # latest ok
    assert pq_probe_persisted(spark, p, qv, k=3, version=1).count() == 3

    s = str(tmp_path / "sq8")
    for _ in range(3):
        persist_sq8_table(spark, emb, s)
    removed = vacuum_sq8_table(s, keep_versions=1)
    assert any("q8_v0" in r for r in removed) and any(
        "q8_v1" in r for r in removed
    )
    assert sq8_topk_persisted(spark, s, query_id=0, k=3).count() == 3


def test_liveness_state_bounded_at_1e5_nodes(spark, tmp_path):
    """VERDICT r8 ask #7: the liveness twin's state bound (one
    last-seen row per node) held only at fixture node counts.  Pin it
    at 10^5 synthetic nodes: state rows == node count exactly, and
    re-streaming MORE heartbeats for the same nodes leaves the state
    row count unchanged (per-node MAX fold — growth is in nodes, never
    in events)."""
    from cassandra_data_migration_spark.streaming.liveness import (
        heartbeat_state_stream,
        node_down_from_state,
    )

    n_nodes = 100_000
    scrape_ms = 60_000
    src = str(tmp_path / "hb_src")
    st = str(tmp_path / "hb_state")
    # 3 micro-batch slices x n_nodes heartbeats each (every node beats
    # once per slice) -> 3x more events than nodes from the start
    for s in range(3):
        (
            spark.range(n_nodes)
            .select(
                F.col("id").alias("node"),
                (F.lit((s + 1) * scrape_ms) + F.col("id") % 3).alias(
                    "ts_ms"
                ),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema("node long, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = heartbeat_state_stream(
        stream, st, checkpoint=str(tmp_path / "ckpt1")
    )
    q.awaitTermination(300)
    state = spark.read.parquet(st)
    assert state.count() == n_nodes
    assert state.select("node").distinct().count() == n_nodes
    # fold 2 MORE slices of later heartbeats for the SAME nodes: state
    # row count must not move (no per-event growth), timestamps must
    for s in range(3, 5):
        (
            spark.range(n_nodes)
            .select(
                F.col("id").alias("node"),
                F.lit((s + 1) * scrape_ms).alias("ts_ms"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    q2 = heartbeat_state_stream(
        spark.readStream.schema("node long, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        st,
        checkpoint=str(tmp_path / "ckpt1"),
    )
    q2.awaitTermination(300)
    state2 = spark.read.parquet(st)
    assert state2.count() == n_nodes
    assert state2.agg(F.max("last_ts_ms")).first()[0] == 5 * scrape_ms
    # the alert evaluation over the state is O(nodes): silence two
    # specific nodes by rewinding nothing — evaluate far enough out
    # that every node alerts, then spot-check the arithmetic shape
    alerts = node_down_from_state(
        spark,
        st,
        scrape_ms=scrape_ms,
        down_ms=3 * scrape_ms,
        range_end_ms=10 * scrape_ms,
    )
    assert alerts.count() == n_nodes


def test_bounded_bucket_pairs_properties(spark):
    """Property sweep (seeded, not hypothesis — one SparkSession per
    module): for random bucket configurations, the helper must (1)
    equal naive all-pairs on buckets <= cap, (2) emit exactly 2n-3
    connected edges on buckets > cap, (3) never emit a pair that
    shares no bucket, (4) never exceed cap*(cap-1)/2 + 2n pairs per
    bucket — the by-design bound."""
    import random

    rng = random.Random(909)
    for trial in range(6):
        cap = rng.choice([2, 3, 5, 8])
        buckets = {}
        for k in range(rng.randint(1, 6)):
            n = rng.randint(1, 3 * cap)
            buckets[k] = rng.sample(range(1000), n)
        got = _pairs(
            bounded_bucket_pairs(_entries(spark, buckets), "k", "m", cap=cap)
        )
        allowed = set()
        expected_small = set()
        for ms in buckets.values():
            s = sorted(ms)
            allowed |= {tuple(sorted(p)) for p in itertools.combinations(s, 2)}
            if len(s) <= cap:
                expected_small |= {
                    tuple(sorted(p)) for p in itertools.combinations(s, 2)
                }
            else:
                expected_small |= {(s[i], s[i + 1]) for i in range(len(s) - 1)}
                expected_small |= {(s[0], m) for m in s[1:]}
        assert got == expected_small, (trial, cap, buckets)
        assert got <= allowed
        bound = sum(
            len(ms) * (len(ms) - 1) // 2 if len(ms) <= cap else 2 * len(ms)
            for ms in buckets.values()
        )
        assert len(got) <= bound


def test_default_cap_above_fixture_max_df(spark):
    # the shipped oracle fixtures must take the lossless path: the
    # hottest distinct-set posting list at sf0.01 has df 7 and at
    # sf0.1 df 25 (measured via DuckDB) — both far below the cap
    assert DEFAULT_BUCKET_CAP >= 64
