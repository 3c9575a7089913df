"""SQL-fold tier vs Arrow/numpy tier: BIT-IDENTICAL results.

The PQ/k-means kernels keep two implementations (SCALING.md 'Known
trade-offs'): the interpreted-HOF SQL form the DuckDB oracle mirrors
term by term, and the vectorized Arrow tier for throughput.  Parity is
by construction — ``_argmin_e4_keys`` accumulates the dot products
sequentially over the width axis, reproducing the SQL ``aggregate``
fold's float-op sequence exactly before the e4 floor — and these tests
pin it on real fixture embeddings plus an adversarial near-tie case.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cassandra_data_migration_spark.operators.similarity import (
    kmeans_fit,
    pq_encode,
)
from cassandra_data_migration_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def _codebook(emb_df, n_centroids=32):
    from cassandra_data_migration_spark.operators.similarity import (
        pq_codebook,
    )

    return pq_codebook(emb_df, n_centroids=n_centroids)


def test_pq_encode_tiers_identical(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    cb = _codebook(emb)
    sql_codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, cb, tier="sql").collect()
    }
    arrow_codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, cb, tier="arrow").collect()
    }
    assert sql_codes == arrow_codes
    assert len(sql_codes) == emb.count()


def test_kmeans_tiers_identical(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a_sql, c_sql = kmeans_fit(emb, k=8, iters=2, tier="sql")
    a_arw, c_arw = kmeans_fit(emb, k=8, iters=2, tier="arrow")
    # identical refined centroids -> the decimal update consumed
    # identical assignments every round
    assert c_sql == c_arw
    assert {
        (r["vec_id"], r["cluster"]) for r in a_sql.collect()
    } == {(r["vec_id"], r["cluster"]) for r in a_arw.collect()}


def test_tiers_identical_on_near_ties(spark):
    """Adversarial: centroids equidistant from the probe vector up to
    the last float64 bit — both tiers must pick the same (first) one."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.5, 0.5, 0.5, 0.5]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.7071067811865476, 0.7071067811865475, 0.0, 0.0]),
        (4, [1e-9, -1e-9, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # codebook with exact mirrors so several distances tie exactly
    cb = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 1.0],
        [0.5, 0.5, 0.5, 0.5],
    ]
    s = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, cb, num_subspaces=2, tier="sql").collect()}
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, cb, num_subspaces=2, tier="arrow").collect()}
    assert s == a
