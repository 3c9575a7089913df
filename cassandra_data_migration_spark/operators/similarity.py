"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the large-corpus playbook:

- **brute force** — exact cosine via JVM higher-order functions
  (``zip_with`` + ``aggregate``): the correctness baseline.  Query
  vectors are broadcast as literals; the scan side never shuffles.
- **LSH-bucketed** — random-hyperplane signatures bucket the corpus;
  only same-bucket pairs are scored.  Hyperplanes are seeded
  (hash-derived), so buckets are reproducible.  This is the scale
  path: at 100 TB the bucket groupBy is the only shuffle and each
  bucket's pair generation is local.

A numpy/Arrow variant (``mapInPandas``) is provided for wide
embeddings where per-element JVM expression overhead dominates —
vectorized BLAS beats codegen'd loops at dim ≳ 256.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.parallel import with_min_parallelism


from cassandra_data_migration_spark.operators.similarity_quant import (  # noqa: F401
    _argmin_e4_keys,
    _assign_arrow,
    _assign_arrow_with_vec,
    _e4,
    _lit_double_array,
    _nearest_centroid,
    _seq_cc,
    adc_topk_over_codes,
    cosine,
    dot,
    ivf_pq_topk,
    kmeans_fit,
    norm,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
    pq_encode_arrow,
    quantize_int8,
    quantized_topk,
    sq8_topk_over_quantized,
    with_unit_norm,
)

def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list | None = None,
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.  One scan, no
    shuffle until the final top-k (orderBy+limit = TakeOrdered, which
    keeps only k rows per partition)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 4).alias("cos_sim"),
    )
    if exclude_ids:
        scored = scored.filter(~F.col(id_col).isin(exclude_ids))
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def all_pairs_cosine(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 2_000_000,
    route_above_rows: int | None = 8_192,
    route_planes: int = 6,
    route_probes: int = 2,
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs above threshold — exact
    brute force up to ``route_above_rows``, auto-routed to the
    sub-quadratic LSH tier beyond it.

    Exact-tier physical plan: broadcast the corpus as ONE dense
    float64 matrix, then ``mapInPandas`` over the distributed side —
    each Arrow batch does a single BLAS ``A @ B.T`` block-matmul and
    emits only the surviving (id_a < id_b) pairs.  No shuffle, no
    per-pair interpreted loop; this is the classic block-broadcast
    brute-force tier — correct and fastest while the corpus is small,
    but Θ(n²·dim) compute no matter how it is expressed (the r9 scale
    gate measured wall exponent 1.27: quadratic by definition).

    Tier routing (VERDICT r9 #5): above ``route_above_rows`` the call
    returns :func:`lsh_bucketed_pairs` with the SAME output contract
    ``(id_a, id_b, cos_sim ≥ threshold)``, ``route_planes``
    hyperplanes — sub-quadratic candidate generation + exact cosine
    verification, so every emitted pair is still exact; candidate
    RECALL < 1 is the documented trade (tune ``route_planes`` down /
    multi-probe for higher recall).  The default boundary (8,192 ×
    dim 64 ≈ 34M-pair blocks, well inside one executor's BLAS
    comfort) keeps every shipped oracle and bench fixture on the
    exact tier; the 10× scale fixture (20k vectors) routes.  Pass
    ``route_above_rows=None`` to force the exact tier, which then
    raises past ``max_broadcast_rows`` instead of silently OOMing
    the driver mid-collect.
    """
    src = with_min_parallelism(
        df.select(F.col(id_col).cast("long").alias(id_col), vec_col)
    )
    import numpy as np
    import pandas as pd

    # take(limit+1): transfers at most limit+1 rows even on an
    # unbounded input, unlike count()+toPandas() which would scan
    # twice and still ship everything before we could check
    fetch = (
        max_broadcast_rows
        if route_above_rows is None
        else min(route_above_rows, max_broadcast_rows)
    )
    rows = src.take(fetch + 1)
    if len(rows) > fetch:
        if route_above_rows is not None:
            # loud runtime signal (ADVICE r10): a previously-exact call
            # is now returning the approximate tier — callers who need
            # recall = 1 must see this, since the switch is data-size-
            # dependent and invisible at the call site otherwise
            import warnings

            warnings.warn(
                f"all_pairs_cosine: corpus exceeds route_above_rows="
                f"{route_above_rows}; routing to the approximate LSH "
                f"tier (recall < 1). Pass route_above_rows=None to "
                f"force the exact tier.",
                RuntimeWarning,
                stacklevel=2,
            )
            dim = len(rows[0][vec_col])
            return lsh_bucketed_pairs(
                df.select(
                    F.col(id_col).cast("long").alias(id_col), vec_col
                ),
                dim=dim,
                threshold=threshold,
                num_planes=route_planes,
                id_col=id_col,
                vec_col=vec_col,
                n_probe=route_probes,  # multi-probe: measured recall
                # 0.81 → see RECALL artifact for the probed figure
            )
        raise ValueError(
            f"all_pairs_cosine: corpus exceeds max_broadcast_rows="
            f"{max_broadcast_rows}; the brute-force tier broadcasts the "
            "whole corpus to every executor. Use lsh_bucketed_pairs "
            "(sub-quadratic) for corpora beyond the broadcast bound."
        )
    b_ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    b_mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    b_norm = np.linalg.norm(b_mat, axis=1)
    bc = df.sparkSession.sparkContext.broadcast((b_ids, b_mat, b_norm))

    def score(batches):
        ids_b, mat_b, norm_b = bc.value
        for p in batches:
            if len(p) == 0:
                continue
            ids_a = p[id_col].to_numpy()
            mat_a = np.stack(
                [np.asarray(v, dtype=np.float64) for v in p[vec_col]]
            )
            sims = np.round(
                (mat_a @ mat_b.T)
                / np.outer(np.linalg.norm(mat_a, axis=1), norm_b),
                4,
            )
            keep = (sims >= threshold) & (ids_a[:, None] < ids_b[None, :])
            ii, jj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": ids_a[ii],
                    "id_b": ids_b[jj],
                    "cos_sim": sims[ii, jj],
                }
            )

    return src.mapInPandas(score, "id_a long, id_b long, cos_sim double")


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (hash-derived, no
    RNG state) — reproducible across runs and engines."""
    planes = []
    for p in range(num_planes):
        comps = []
        for d in range(dim):
            # md5-free cheap LCG-ish draw in [-1, 1]
            x = math.sin(seed * 1_000_003 + p * 10_007 + d * 101) * 43758.5453
            comps.append((x - math.floor(x)) * 2.0 - 1.0)
        planes.append(comps)
    return planes


def rp_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_prefix: str = "rp",
) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson-
    Lindenstrauss): project each embedding onto ``out_dim``
    hash-derived pseudo-random hyperplanes — the cheap front of an ANN
    pipeline (8 doubles per vector instead of 64; distances preserved
    within JL distortion).

    Pure scan-side expression: ``out_dim`` codegen'd dot folds per
    row, zero shuffles, and the projection matrix enters as literals
    (same seeded derivation as ``lsh_bucket``'s hyperplanes, so any
    engine — including the DuckDB oracle — regenerates it exactly).
    Components are e4-rounded for cross-engine reproducibility."""
    v = F.col(vec_col).cast("array<double>")
    cols: list[Column] = [F.col(id_col)]
    for p, plane in enumerate(_hyperplanes(in_dim, out_dim, seed)):
        cols.append(
            F.round(dot(v, _lit_double_array(list(plane))), 4).alias(
                f"{out_prefix}{p}"
            )
        )
    return df.select(*cols)


def lsh_bucket(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH: bucket id = sign-bit string of the
    vector's dot products with ``num_planes`` fixed hyperplanes.
    Cosine-similar vectors collide with high probability."""
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for i, plane in enumerate(_hyperplanes(dim, num_planes, seed)):
        p = _lit_double_array(list(plane))
        bits.append(F.when(dot(v, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    code = bits[0]
    for b in bits[1:]:
        code = code + b
    return df.withColumn(out, code.cast("int"))


def lsh_bucketed_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = None,
    n_probe: int = 0,
) -> DataFrame:
    """Near-dup pairs, sub-quadratic: bucket → same-bucket pairs →
    exact cosine verify.  Recall < 1 by design (tune num_planes /
    ``n_probe`` for the target recall).

    Candidate generation goes through ``dedup.bounded_bucket_pairs``
    (all pairs in buckets ≤ ``bucket_cap``, deterministic chain +
    star-to-min survivor edges above it) so a hot sign-pattern bucket
    — embeddings cluster, so bucket sizes are Zipf-ish — can never
    materialize O(bucket²) candidates: the r9 full-suite scale gate
    measured wall exponent 1.71 at 10× data for the uncapped
    self-join.  Verification computes the EXACT cosine per surviving
    candidate either way.

    ``n_probe`` > 0 enables multi-probe (Lv et al., VLDB'07 — public
    algorithm): each vector ADDITIONALLY probes the ``n_probe``
    buckets reached by flipping its smallest-|margin| sign bits — the
    planes it nearly straddles, exactly where a true neighbor most
    likely landed on the other side.  A candidate pair needs at least
    one member AT HOME in the shared bucket on the ≤-cap all-pairs
    path (the pair predicate applies only there; hot buckets take the
    survivor path, which skips it, so survivor-path candidates may be
    probe∧probe — harmless to output correctness because every
    candidate is exact-verified, but the candidate bound is the
    all-pairs path's, not a global invariant — ADVICE r11), output
    gains a distinct (each
    vector now appears in 1+n_probe buckets), and the per-row cost is
    n_probe extra bucket entries — the standard recall/cost dial that
    avoids doubling num_planes' bucket count.  n_probe=0 is the exact
    prior single-bucket plan (no distinct added)."""
    from cassandra_data_migration_spark.operators.dedup import (
        DEFAULT_BUCKET_CAP,
        bounded_bucket_pairs,
    )

    # reband key for hot buckets: a FINER sign pattern (4 extra
    # hyperplanes under an independent seed) — a dense embedding
    # cluster that floods one coarse bucket re-separates into
    # sub-buckets whose all-pairs survive the cap (dedup.py's
    # second-level-LSH recovery); 4 extra dot products per row is the
    # whole cost
    bucketed = lsh_bucket(
        lsh_bucket(df, dim, 4, seed + 101, vec_col, out="_rb"),
        dim,
        num_planes,
        seed,
        vec_col,
    ).select(F.col(id_col), "bucket", "_rb", F.col(vec_col).alias("_mpv"))
    if n_probe > 0:
        # margins: (|dot(v, plane_i)|, i) sorted ascending — flip the
        # n_probe nearest planes' bits.  Scan-side arithmetic only.
        v = F.col("_mpv").cast("array<double>")
        margins = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(
                            dot(v, _lit_double_array(list(plane)))
                        ).alias("_m"),
                        F.lit(1 << i).alias("_mask"),
                    )
                    for i, plane in enumerate(
                        _hyperplanes(dim, num_planes, seed)
                    )
                ]
            )
        )
        probes = F.transform(
            F.slice(margins, 1, n_probe),
            lambda s: F.struct(
                F.col("bucket")
                .bitwiseXOR(s["_mask"])
                .cast("int")
                .alias("bucket"),
                F.lit(False).alias("_home"),
            ),
        )
        entries = F.concat(
            F.array(
                F.struct(
                    F.col("bucket").alias("bucket"),
                    F.lit(True).alias("_home"),
                )
            ),
            probes,
        )
        bucketed = bucketed.select(
            F.col(id_col),
            "_rb",
            F.explode(entries).alias("_e"),
        ).select(
            F.col(id_col),
            F.col("_e.bucket").alias("bucket"),
            "_rb",
            F.col("_e._home").alias("_home"),
        )
        # cap scales with probe multiplicity: probing multiplies each
        # bucket's population ~(1+n_probe)x, and an UNscaled cap would
        # push previously-lossless (sub-)buckets into degree-capped
        # survivor mode — measured recall DROPPED 0.81 → 0.71 at the
        # 40k-vector fixture before this scaling; pair-output degree
        # per home member stays the same bound as the unprobed tier
        cands = bounded_bucket_pairs(
            bucketed,
            "bucket",
            id_col,
            cap=(DEFAULT_BUCKET_CAP if bucket_cap is None else bucket_cap)
            * (1 + n_probe),
            dedup=True,  # a vector sits in 1+n_probe buckets now
            reband_col="_rb",
            extra_cols=("_home",),
            small_cond=lambda sa, sb: sa["_home"] | sb["_home"],
        )
    else:
        # dedup=False: each vector hashes to exactly ONE sign-pattern
        # bucket, so pairs are unique by construction and the output
        # distinct would be a wasted shuffle of the whole candidate set
        cands = bounded_bucket_pairs(
            bucketed.drop("_mpv"),
            "bucket",
            id_col,
            cap=DEFAULT_BUCKET_CAP if bucket_cap is None else bucket_cap,
            dedup=False,
            reband_col="_rb",
        )
    # norm once per row before the verify joins — the per-pair
    # expression is then a single dot-product fold instead of three
    # (bit-identical doubles: sqrt(dot(v,v)) on the same input in
    # either place)
    sides = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    va = sides.select(
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    vb = sides.select(
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic IVF coarse quantizer: the ``n_centroids`` corpus
    vectors with the smallest md5(id) — a seeded sample, reproducible
    across runs and partitionings (one TakeOrdered scan).  A k-means
    refinement can replace this without changing the search path."""
    import numpy as np

    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .collect()
    )
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


def ivf_assign(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "list_id",
) -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid — one
    broadcast + one Arrow-batched BLAS pass, no shuffle.  At corpus
    scale, write the result partitioned by ``list_id`` so probes prune
    whole files."""
    import numpy as np
    import pandas as pd

    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast(c)

    def assign(batches):
        cn = bc.value
        for p in batches:
            if len(p) == 0:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in p[vec_col]])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            p = p.copy()
            p[out] = np.argmax(m @ cn.T, axis=1).astype("int32")
            yield p

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return with_min_parallelism(df).mapInPandas(assign, f"{fields}, {out} int")


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k: score the query against the centroids
    driver-side, probe only the ``n_probe`` nearest inverted lists,
    brute-force within them.  Scanned fraction ≈ n_probe/n_centroids;
    with ``n_probe == n_centroids`` this is exactly brute force.
    Recall tunes with n_probe — the standard IVF trade."""
    import numpy as np

    c = centroids if centroids is not None else ivf_centroids(df, n_centroids, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    scores = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q))
    probe = np.argsort(-scores)[:n_probe].tolist()
    assigned = ivf_assign(df, c, id_col, vec_col)
    shortlist = assigned.filter(F.col("list_id").isin([int(p) for p in probe]))
    return cosine_topk(shortlist, query_vec, k, id_col, vec_col)


def cosine_topk_arrow(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy variant of cosine_topk for wide embeddings: batch
    matrix-vector products via mapInPandas, then global top-k.  Each
    Arrow batch computes a local top-k so only k rows per batch reach
    the final sort."""
    import numpy as np
    import pandas as pd

    q = None  # built lazily inside workers

    def score(batches):
        nonlocal q
        qv = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(qv)
        for pdf in batches:
            m = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            sims = (m @ qv) / (np.linalg.norm(m, axis=1) * qn)
            out = pd.DataFrame({id_col: pdf[id_col], "cos_sim": np.round(sims, 4)})
            yield out.nlargest(min(k, len(out)), "cos_sim")

    schema = f"{id_col} long, cos_sim double"
    return (
        df.select(id_col, vec_col)
        .mapInPandas(score, schema)
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023):
    cluster embeddings around coarse centroids, then inside each
    cluster drop every vector that has a ≥``threshold``-cosine
    neighbor with a smaller id — one representative per semantic
    near-dup group survives.  Returns (id, cluster, kept 1/0).

    Centroids are the ``n_clusters`` corpus vectors with the smallest
    md5(id) (same deterministic seed-sample as ``ivf_centroids``; a
    k-means refinement drops in without changing the dataflow).
    Physical plan: assignment is a broadcast of k centroid literals
    evaluated in the scan stage (no shuffle); the within-cluster pair
    scoring shuffles once on the cluster id.  The quadratic pair step
    is the point of the clustering — with k ∝ √N clusters, expected
    cluster size is √N and total pair work ≈ N^1.5, vs N² for the
    global all-pairs; skewed clusters fall back to the salted-join
    pattern.  Ties in nearest-centroid assignment break to the
    smallest centroid id on the ROUNDED (4-dp) cosine, which keeps
    assignment reproducible across engines and partitionings.
    """
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_clusters)
        .collect()
    )
    cents = sorted(
        (r[id_col], [float(x) for x in r[vec_col]]) for r in rows
    )
    v = F.col(vec_col).cast("array<double>")
    # row norm once (not once per centroid / per pair); same doubles
    # as computing it inline, so oracle parity is unaffected
    scored = df.select(F.col(id_col), v.alias("_v")).withColumn(
        "_n", norm(F.col("_v"))
    )
    cos_names = []
    for c_id, c_vec in cents:
        name = f"_cos_{c_id}"
        lit_c = _lit_double_array(c_vec)
        scored = scored.withColumn(
            name,
            F.round(
                dot(F.col("_v"), lit_c) / (F.col("_n") * norm(lit_c)), 4
            ),
        )
        cos_names.append((c_id, name))
    best = F.greatest(*[F.col(n) for _, n in cos_names])
    cluster = F.lit(None).cast("long")
    # reversed: the smallest centroid id wins rounded-cosine ties
    for c_id, name in reversed(cos_names):
        cluster = F.when(F.col(name) == best, F.lit(c_id)).otherwise(cluster)
    assigned = scored.select(
        F.col(id_col), F.col("_v"), F.col("_n"), cluster.alias("cluster")
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    dropped = (
        a.join(b, "cluster")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(
            F.round(
                dot(F.col("a._v"), F.col("b._v"))
                / (F.col("a._n") * F.col("b._n")),
                4,
            )
            >= threshold
        )
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            "cluster",
            F.when(F.col("_dropped").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("kept"),
        )
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Per-label centroid in long form: (label, pos, centroid) with
    1-based positions — the class-prototype computation behind
    centroid classifiers and IVF coarse quantizers.

    Elementwise means are accumulated as DECIMAL sums: decimal
    addition is exact and therefore order-independent, so the result
    is bit-identical regardless of partitioning or aggregation order
    (float sums are not — each plan reorders them).  One explode + one
    grouped aggregation; the shuffle carries (label, pos, partial sum)
    = num_labels × dim rows after map-side combine, independent of
    corpus size."""
    flat = df.select(
        F.col(label_col).alias("label"),
        F.col(vec_col).alias("_v"),
        F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("pos"),
    ).select(
        "label",
        F.col("pos").cast("long").alias("pos"),
        F.element_at(F.col("_v"), F.col("pos")).cast("decimal(20,10)").alias("_val"),
    )
    return flat.groupBy("label", "pos").agg(
        F.round(
            F.sum("_val").cast("double") / F.count(F.lit(1)), 4
        ).alias("centroid")
    )



def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact k-nearest-neighbor JOIN: for EVERY query vector, the top-k
    corpus vectors by cosine — the batch retrieval shape (RAG corpus
    lookup, hard-negative mining) that ``cosine_topk`` (one literal
    query) doesn't cover.

    Plan: the query side broadcasts (it is the small side by
    definition — batch lookups are ≤10⁵ rows against a corpus of
    10⁹); one corpus scan scores all pairs via the broadcast hash-less
    nested loop, then a per-query window keeps k — the only shuffle
    is on query_id for the rank, carrying (query, id, score) triples,
    never vectors.  At 100 TB the corpus never exchanges; for
    corpus-scale query sets, pre-bucket both sides with
    ``lsh_bucket`` and run this per bucket.

    Scores are e4-rounded with (score DESC, corpus id ASC) rank order
    — deterministic and oracle-reproducible."""
    from pyspark.sql import Window

    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_cv"), F.col("_qv")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("_rk").alias("rank"))
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_benchmark_rows: int = 2_000_000,
) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic twin
    of ``text.decontaminate``: n-gram collision misses paraphrased
    eval leakage, so modern curation (FineWeb / phi-style decontam)
    ALSO flags corpus items whose embedding is too close to any
    held-out benchmark embedding.

    Output per corpus row: (id, nearest_benchmark_id,
    max_benchmark_sim, contaminated).  Ties on the (e4-rounded) max
    similarity resolve to the smallest benchmark id — deterministic
    and oracle-checkable.

    Physical plan: eval suites are tiny relative to the corpus, so the
    BENCHMARK side broadcasts as one dense matrix and the corpus
    streams through an Arrow ``mapInPandas`` — one BLAS block-matmul
    per batch, no shuffle, corpus scanned once.  The broadcast is a
    bounded ``take`` that fails fast past ``max_benchmark_rows``."""
    import numpy as np
    import pandas as pd

    rows = benchmark.select(id_col, vec_col).take(max_benchmark_rows + 1)
    if not rows:
        raise ValueError("semantic_decontaminate: empty benchmark set")
    if len(rows) > max_benchmark_rows:
        raise ValueError(
            "semantic_decontaminate: benchmark exceeds "
            f"max_benchmark_rows={max_benchmark_rows}; the benchmark side "
            "broadcasts whole — shard the benchmark or raise the bound."
        )
    b_ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    b_mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    b_norm = np.linalg.norm(b_mat, axis=1)
    src = with_min_parallelism(
        corpus.select(F.col(id_col).cast("long").alias(id_col), vec_col)
    )
    bc = corpus.sparkSession.sparkContext.broadcast((b_ids, b_mat, b_norm))

    def score(batches):
        ids_b, mat_b, norm_b = bc.value
        for p in batches:
            if len(p) == 0:
                continue
            ids_a = p[id_col].to_numpy()
            mat_a = np.stack(
                [np.asarray(v, dtype=np.float64) for v in p[vec_col]]
            )
            sims = np.round(
                (mat_a @ mat_b.T)
                / np.outer(np.linalg.norm(mat_a, axis=1), norm_b),
                4,
            )
            best = sims.max(axis=1)
            masked = np.where(
                sims == best[:, None], ids_b[None, :], np.iinfo(np.int64).max
            )
            yield pd.DataFrame(
                {
                    id_col: ids_a,
                    "nearest_benchmark_id": masked.min(axis=1),
                    "max_benchmark_sim": best,
                    "contaminated": best >= threshold,
                }
            )

    return src.mapInPandas(
        score,
        f"{id_col} long, nearest_benchmark_id long, "
        "max_benchmark_sim double, contaminated boolean",
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every query
    vector, the top-k most-similar corpus vectors with a DIFFERENT
    label — the near-misses that make the best negatives (in-batch
    random negatives are too easy; the gradient signal lives near the
    decision boundary).

    Same plan shape as :func:`knn_join` — query side broadcast, one
    corpus scan, per-query rank shuffling (query, id, score) triples
    only — with the label-mismatch predicate fused into the join so
    same-label pairs never materialize.  Corpus-scale query sets
    should LSH-bucket both sides first (``lsh_bucketed_pairs``).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("_ql"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("_cl"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("negative_id") != F.col("query_id"))
        & (F.col("_cl") != F.col("_ql")),
    ).select(
        "query_id",
        "negative_id",
        F.col("_cl").alias("negative_label"),
        F.round(cosine(F.col("_cv"), F.col("_qv")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("negative_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            "query_id",
            "negative_id",
            "negative_label",
            "cos_sim",
            F.col("_rk").cast("int").alias("rank"),
        )
    )


def mmr_select(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    lambda_ppm: int = 700_000,
    scale: int = 1000,
    query_id: int | None = None,
) -> DataFrame:
    """Greedy maximal-marginal-relevance selection (Carbonell &
    Goldstein, SIGIR'98 — public algorithm): pick ``k`` vectors that
    balance relevance to a query against redundancy with what is
    already picked — the diverse-coreset selector a training-data
    pipeline uses to subsample near-duplicate-rich embedding
    neighborhoods.

    Step 1 picks the max-relevance vector; each later step picks
    ``argmax λ·rel(i) − (1−λ)·max_{j∈S} sim(i, j)``.  All scoring is
    INTEGER: vectors quantize to ``floor(x·scale + 0.5)`` longs,
    similarities are exact integer inner products, λ is parts-per-
    million — the argmax ordering (and so the selection itself) is
    deterministic and bit-identical in any engine, which is what lets
    a SQL oracle replay the greedy loop as unrolled CTE stages.
    (``scale`` defaults to e3, not e6, so λ·rel stays far inside
    int64: 64 dims × (10³)² × 10⁶ ≈ 6·10¹³.)

    Scale shape: k driver rounds, each ONE distributed pass — the
    candidate scan joins a ≤k-row broadcast of the picked vectors
    (never candidate×candidate), takes ``max`` per candidate, and a
    TakeOrdered(1) returns a single row to the driver.  O(k·dim)
    driver state, same budget class as the k-means centroid loop.
    The query defaults to the min-id vector; pass ``query_id`` to
    anchor relevance elsewhere.
    """
    base = df.select(
        F.col(id_col).alias("rid"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"),
        ).alias("_qv"),
    )
    if query_id is None:
        # one job, not two: min id and its vector together (min_by is
        # deterministic here — rid is unique)
        row = base.agg(
            F.min("rid").alias("_r"), F.min_by("_qv", "rid").alias("_v")
        ).first()
        query_id, qvec = row["_r"], row["_v"]
    else:
        qvec = base.filter(F.col("rid") == query_id).select("_qv").first()[0]
    qlit = F.array(*[F.lit(int(v)) for v in qvec])
    scored = base.select(
        "rid",
        "_qv",
        F.aggregate(
            F.zip_with(F.col("_qv"), qlit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("rel"),
    ).persist()

    first = scored.orderBy(F.desc("rel"), "rid").limit(1).first()
    picked = [(1, first["rid"], first["rel"], list(first["_qv"]))]
    inv = 1_000_000 - lambda_ppm
    for step in range(2, k + 1):
        sel = df.sparkSession.createDataFrame(
            [(p[1], p[3]) for p in picked], "sid long, _sv array<long>"
        )
        # exclusion stays a literal isin list: a broadcast anti-join
        # variant (plan-shape-stable across rounds, so rounds 3..k hit
        # the codegen cache) was built and interleaved-A/B'd in round
        # 12 — it measured ×1.43 SLOWER (med 11.3 s vs 7.9 s, 4 reps)
        # because each greedy round then pays a broadcast build + an
        # extra join stage, which at k≈8 dwarfs the whole-stage
        # recompiles the isin costs.  Measured rejection, guide §1.
        nxt = (
            scored.filter(
                ~F.col("rid").isin([p[1] for p in picked])
            )
            .crossJoin(F.broadcast(sel))
            .withColumn(
                "_dot",
                F.aggregate(
                    F.zip_with("_qv", "_sv", lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
            .groupBy("rid", "rel")
            # _qv is functionally determined by rid; carrying it via
            # any_value saves the re-join (one job per greedy round)
            .agg(
                F.max("_dot").alias("_maxsim"),
                F.any_value("_qv").alias("_qv"),
            )
            .withColumn(
                "_score",
                F.lit(lambda_ppm) * F.col("rel")
                - F.lit(inv) * F.col("_maxsim"),
            )
            .orderBy(F.desc("_score"), "rid")
            .limit(1)
            .first()
        )
        if nxt is None:
            break
        picked.append((step, nxt["rid"], nxt["rel"], list(nxt["_qv"])))
    scored.unpersist()
    return df.sparkSession.createDataFrame(
        [(s, r, rel) for s, r, rel, _ in picked],
        "step int, vec_id long, rel long",
    )


def mmr_select_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    lambda_ppm: int = 700_000,
    scale: int = 1000,
) -> str:
    """DuckDB twin of :func:`mmr_select`, kept beside it so the two
    greedy definitions cannot drift: the selection loop unrolls to
    ``k`` CTE stages (the BPE-oracle technique), each re-deriving the
    argmax from the full integer pair-similarity matrix."""
    inv = 1_000_000 - lambda_ppm
    stages = [
        """
    sel1 AS MATERIALIZED (SELECT 1 AS step, rid FROM rel ORDER BY rel DESC, rid LIMIT 1),
    selall1 AS MATERIALIZED (SELECT * FROM sel1)"""
    ]
    for s in range(2, k + 1):
        stages.append(f"""
    sel{s} AS MATERIALIZED (
        SELECT {s} AS step, r.rid
        FROM rel r
        JOIN dots d ON d.ra = r.rid
                   AND d.rb IN (SELECT rid FROM selall{s - 1})
        WHERE r.rid NOT IN (SELECT rid FROM selall{s - 1})
        GROUP BY r.rid, r.rel
        ORDER BY {lambda_ppm} * r.rel - {inv} * MAX(d.dot) DESC, r.rid
        LIMIT 1
    ),
    selall{s} AS MATERIALIZED (SELECT * FROM selall{s - 1} UNION ALL SELECT * FROM sel{s})""")
    return f"""
    WITH q AS (
        SELECT {id_col} AS rid,
               list_transform({vec_col}::DOUBLE[],
                   x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT)) AS qv
        FROM {table}
    ),
    ux AS MATERIALIZED (
        SELECT rid, unnest(qv) AS x, generate_subscripts(qv, 1) AS i
        FROM q
    ),
    uq AS (
        SELECT unnest(qv) AS x, generate_subscripts(qv, 1) AS i
        FROM q WHERE rid = (SELECT MIN(rid) FROM q)
    ),
    rel AS MATERIALIZED (
        SELECT ux.rid, CAST(SUM(ux.x * uq.x) AS BIGINT) AS rel
        FROM ux JOIN uq USING (i) GROUP BY 1
    ),
    dots AS MATERIALIZED (
        SELECT a.rid AS ra, b.rid AS rb, CAST(SUM(a.x * b.x) AS BIGINT) AS dot
        FROM ux a JOIN ux b USING (i) GROUP BY 1, 2
    ),{','.join(stages)}
    SELECT CAST(s.step AS INT) AS step, CAST(s.rid AS BIGINT) AS vec_id,
           CAST(r.rel AS BIGINT) AS rel
    FROM selall{k} s JOIN rel r ON r.rid = s.rid
    """


