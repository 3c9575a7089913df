"""Rank fusion for hybrid retrieval.

The reference's retrieval surface is single-signal (point reads /
``ALLOW FILTERING`` scans, lab/scripts/simulate_app_traffic.py:83-90);
a training-data pipeline couples a lexical ranker (BM25,
``text.bm25_topk``) with a dense ranker (``similarity.cosine_topk``)
and fuses the candidate lists.  Reciprocal Rank Fusion
(Cormack/Clarke/Buettcher, SIGIR'09) is the standard scoreless fusion:

    rrf(d) = sum over lists L of 1 / (c + rank_L(d))

Scale notes (100 TB): fusion operates on *candidate lists* — already
top-k outputs, thousands of rows at most — never on the corpus.  The
rank assignment is a global window, which is exactly right here: the
inputs are bounded by construction, so a single-partition sort of k
rows is free, while the heavy corpus-side work stays inside the
upstream rankers (scan-side scoring + TakeOrdered, see their own
docstrings).  Contributions are e9 fixed-point integers so the fused
score is an order-independent exact BIGINT sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_list(
    df: DataFrame, order_by: list[Column], id_col: str, list_name: str
) -> DataFrame:
    """Assign 1-based ranks to a (small) candidate list by a total
    deterministic order.  Callers must include a unique tiebreaker in
    ``order_by``."""
    w = Window.orderBy(*order_by)
    return df.select(
        F.col(id_col).alias("_fuse_id"),
        F.row_number().over(w).alias("_rank"),
        F.lit(list_name).alias("_list"),
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    c: int = 60,
    out_id: str = "doc_id",
) -> DataFrame:
    """Fuse ranked candidate lists (outputs of :func:`ranked_list`)
    with Reciprocal Rank Fusion at constant ``c``.

    Returns the top-``k`` by fused score with columns
    ``(out_id, n_lists, rrf_e9, rrf_score)`` where
    ``rrf_e9 = sum(round(1e9 / (c + rank)))`` — an exact integer sum,
    so ordering and hashing are engine-reproducible.
    """
    unioned = ranked[0]
    for r in ranked[1:]:
        unioned = unioned.unionByName(r)
    contrib = F.round(F.lit(1_000_000_000.0) / (F.lit(c) + F.col("_rank"))).cast(
        "long"
    )
    return (
        unioned.select(F.col("_fuse_id").alias(out_id), contrib.alias("_c"))
        .groupBy(out_id)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
            F.sum("_c").alias("rrf_e9"),
        )
        .withColumn(
            "rrf_score", F.round(F.col("rrf_e9") / F.lit(1_000_000_000.0), 6)
        )
        .orderBy(F.desc("rrf_e9"), F.asc(out_id))
        .limit(k)
    )
