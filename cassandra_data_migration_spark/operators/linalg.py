"""Distributed exact linear algebra over embedding columns.

The Gram matrix Gᵀ·G (and from it covariance / PCA / whitening) is
the one embedding computation that genuinely wants BLAS-shaped work
rather than per-element SQL expressions: dim² accumulators per row.
Doing it with explode+groupBy multiplies the row count by dim² —
correct, but a dim²× shuffle.  The scale path here is the canonical
Arrow/Pandas-UDF pattern:

- quantize each vector to e6 fixed-point int64 SCAN-SIDE (exact,
  engine-reproducible: ``floor(x·10⁶ + 0.5)``),
- ``mapInPandas`` computes one int64 ``QᵀQ`` partial PER ARROW BATCH
  (a numpy integer matmul — vectorized, no per-row Python),
- one map-side-combined groupBy sums the partials.

The shuffle carries O(dim²·batches) longs — never a vector — and
integer arithmetic makes the result bit-exact under any partitioning,
so even this mapInPandas kernel is DuckDB-oracle-checkable (the
oracle unrolls the same quantized products in SQL).  At 100 TB the
same shape computes any Σ f(row) matrix accumulation (covariance,
co-occurrence, confusion matrices) in one pass.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6 = 10**6


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = E6,
) -> DataFrame:
    """(i, j, sxy) for j ≥ i: ``sxy = Σ_rows q(v[i])·q(v[j])`` with
    ``q(x) = floor(x·scale + 0.5)`` int64 — the exact upper-triangle
    Gram matrix of the quantized embedding matrix.

    Overflow bound: |q| ≤ scale·max|x|, so sxy ≤ rows·(scale·max|x|)²
    — unit-norm embeddings at e6 keep ~9×10⁶ rows per partial inside
    int64; beyond that, lower ``scale`` or pre-aggregate per salt.
    """
    import numpy as np
    import pandas as pd

    if dim is None:
        dim = len(df.select(vec_col).first()[0])

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        total = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["_v"].to_numpy())
            q = np.floor(m * float(scale) + 0.5).astype(np.int64)
            g = q.T @ q
            total = g if total is None else total + g
        if total is not None:
            iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "sxy": total[iu],
                }
            )

    src = df.select(F.col(vec_col).cast("array<double>").alias("_v"))
    partials = src.mapInPandas(emit, "i int, j int, sxy long")
    return partials.groupBy("i", "j").agg(F.sum("sxy").alias("sxy"))


def gram_matrix_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = E6,
) -> str:
    """DuckDB twin of :func:`gram_matrix`: same quantization, exact
    integer products, upper triangle."""
    return f"""
        WITH q AS (
            SELECT {id_col} AS rid,
                   list_transform({vec_col}::DOUBLE[],
                       x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT)) AS qv
            FROM {table}
        ),
        ix AS (SELECT CAST(unnest(range({dim})) AS INT) AS i),
        ux AS (SELECT q.rid, ix.i, qv[ix.i + 1] AS x FROM q, ix)
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(a.x * b.x) AS BIGINT) AS sxy
        FROM ux a JOIN ux b ON a.rid = b.rid AND b.i >= a.i
        GROUP BY a.i, b.i
    """


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Project embeddings onto their top-``k`` principal components.

    Distribution of work mirrors every scalable PCA: the dim×dim
    covariance is assembled from ONE distributed pass (the
    :func:`gram_matrix` partials plus a mean vector), the
    eigendecomposition is a driver-side numpy call on a dim×dim
    matrix (dim ≤ a few thousand — never data-sized), and the
    projection is a broadcast matrix applied scan-side per Arrow
    batch.  Only the k-dim outputs are shuffled onward.

    Eigenvector sign/order is a numpy implementation detail, so this
    operator is validated by PROPERTY tests (orthonormality, variance
    ordering, reconstruction-error monotonicity) rather than a SQL
    oracle — the one linalg op where cross-engine bit-equality is the
    wrong contract.
    """
    import numpy as np
    import pandas as pd

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    n = df.count()
    g_rows = gram_matrix(df, vec_col, dim=dim).collect()
    g = np.zeros((dim, dim))
    for r in g_rows:
        g[r["i"], r["j"]] = g[r["j"], r["i"]] = r["sxy"] / float(E6) ** 2
    mean_row = (
        df.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .select(*[F.avg(F.col("_v")[i]).alias(f"m{i}") for i in range(dim)])
        .first()
    )
    mu = np.array([mean_row[f"m{i}"] for i in range(dim)])
    cov = g / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    proj = vecs[:, order]  # dim×k

    def apply(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["_v"].to_numpy())
            out = (m - mu) @ proj
            yield pd.DataFrame(
                {"_id": pdf["_id"], "proj": list(map(list, out))}
            )

    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    res = src.mapInPandas(apply, f"_id long, proj array<double>")
    return res.select(F.col("_id").alias(id_col), "proj")
