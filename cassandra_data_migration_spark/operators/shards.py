"""Training-shard export: deterministic global shuffle → round-robin
shard assignment → one-file-per-shard layout + a verifiable manifest.

The end-cap of the training-data pipeline: after curation, dedup and
mixture sampling, the corpus must leave the engine as N equal shards
a data loader can stream — globally shuffled (so each shard is an
unbiased sample and sources interleave), reproducibly (same seed ⇒
byte-identical shard membership), with a manifest the consumer can
verify against (rows, token counts, an order-independent content
digest per shard).

Design for 100 TB:

- The shuffle order is a seeded md5 draw per row
  (functions/hashing.md5_draw) — a pure scan-side expression, no RNG
  state, identical in the DuckDB oracle.
- The global rank over that order uses the two-phase bucketed rank
  (operators/ids.stable_dense_ids): percentile bounds → per-bucket
  window + broadcast offsets.  No single-task global sort anywhere.
- Shard id is round-robin over the rank (``(rank-1) % n_shards``), so
  shard sizes differ by at most one row at ANY corpus size — range
  slicing (``rank DIV shard_size``) would need the exact total first
  and skews the last shard.
- The manifest digest is the SUM of per-row 60-bit md5 draws mod
  2**60 (the merkle leaf-digest construction) — order-independent, so
  it verifies shard CONTENT without caring how the writer ordered
  rows within the file.
- ``write_training_shards`` clusters by shard before ``partitionBy``
  (one file per shard, not tasks×shards small files — the same fix as
  plans/repair.bucket_partitioned_write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.functions.hashing import (
    md5_draw,
    md5_draw_sql,
)
from cassandra_data_migration_spark.operators.ids import stable_dense_ids

TOKEN_SPACE = 1 << 60


def assign_training_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "shards",
    balance: str = "docs",
    token_count_col: str | None = None,
) -> DataFrame:
    """``df`` plus ``shard`` (0-based) and ``shuffle_rank`` (1-based
    global position in the assignment order).  ``id_col`` must be
    unique — it tiebreaks the order and keys the content digest.

    ``balance="docs"`` (default): seeded md5 shuffle order,
    round-robin shard — doc counts differ by ≤ 1 at any corpus size.
    ``balance="tokens"``: rank by ``token_count_col`` DESCENDING and
    deal shards boustrophedon (snake: 0..n-1 then n-1..0 per block of
    n) — the classic LPT-flavored layout that bounds per-shard TOKEN
    sums within one block's spread, for corpora where document length
    is heavy-tailed and equal doc counts would skew loader work.  Doc
    counts still differ by ≤ 1, and every shard samples every length
    stratum (one doc per block)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if balance == "docs":
        ordered = df.withColumn("_ord", md5_draw(seed, id_col))
        ranked = stable_dense_ids(
            ordered, ["_ord", id_col], out="shuffle_rank"
        ).drop("_ord")
        return ranked.withColumn(
            "shard",
            F.pmod(F.col("shuffle_rank") - 1, F.lit(n_shards)).cast("int"),
        )
    if balance != "tokens":
        raise ValueError("balance must be 'docs' or 'tokens'")
    if not token_count_col:
        raise ValueError("balance='tokens' requires token_count_col")
    ranked = stable_dense_ids(
        df,
        [token_count_col, id_col],
        descending=[True, False],
        out="shuffle_rank",
    )
    r0 = F.col("shuffle_rank") - 1
    idx = F.pmod(r0, F.lit(n_shards))
    block = F.expr(f"(shuffle_rank - 1) DIV {int(n_shards)}")
    return ranked.withColumn(
        "shard",
        F.when(F.pmod(block, F.lit(2)) == 0, idx)
        .otherwise(F.lit(n_shards - 1) - idx)
        .cast("int"),
    )


def _content_digest(digest_cols: list[str], seed: str) -> Column:
    # order-independent: Σ per-row draws mod 2^60, folded in DECIMAL
    # so partial aggregation never overflows (merkle.py construction).
    # The draw hashes EVERY digest column, so the digest detects any
    # change to those columns — not just membership churn.
    return F.pmod(
        F.sum(
            md5_draw(f"{seed}:content", *digest_cols).cast("decimal(38,0)")
        ),
        F.lit(TOKEN_SPACE).cast("decimal(38,0)"),
    ).cast("long")


def training_shard_manifest(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    n_shards: int,
    seed: str = "shards",
    digest_cols: list[str] | None = None,
    balance: str = "docs",
) -> DataFrame:
    """(shard, n_docs, n_tokens, content_digest) — what a consumer
    checks a delivered shard against.  One map-combined groupBy over
    the shard assignment (``balance`` as in
    :func:`assign_training_shards`); O(n_shards) output rows.

    ``digest_cols`` (default ``[id_col, token_count_col]``) are the
    columns the content digest covers — tampering with any of them in
    a delivered shard changes that shard's digest.  Include the
    payload column (e.g. the text) to certify payload bytes too; the
    digest hashes every listed column per row."""
    cols = digest_cols or [id_col, token_count_col]
    assigned = assign_training_shards(
        df, id_col, n_shards, seed, balance,
        token_count_col if balance == "tokens" else None,
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_col).cast("long").alias("n_tokens"),
            _content_digest(cols, seed).alias("content_digest"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    token_count_col: str,
    n_shards: int,
    seed: str = "shards",
    digest_cols: list[str] | None = None,
    balance: str = "docs",
) -> DataFrame:
    """Materialize the shards under ``path`` (``shard=K`` directories,
    one file each, rows ordered by shuffle_rank within the shard) and
    return the manifest of what was written.  Readers stream shard
    directories independently; the manifest digest verifies each.
    ``balance`` as in :func:`assign_training_shards`, so a manifest
    generated with ``balance='tokens'`` matches shards written with
    the same setting."""
    assigned = assign_training_shards(
        df, id_col, n_shards, seed, balance,
        token_count_col if balance == "tokens" else None,
    )
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shuffle_rank")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    # manifest digested FROM THE WRITTEN FILES, grouped by the on-disk
    # shard directory (no reassignment): a row materialized under the
    # wrong shard=K directory — writer bug, leftover part from a
    # partial overwrite — shows up here, and the read-back skips a
    # second global re-rank
    return shard_content_report(
        spark.read.parquet(path),
        id_col,
        token_count_col,
        seed,
        digest_cols=digest_cols,
    )


def shard_content_report(
    delivered: DataFrame,
    id_col: str,
    token_count_col: str,
    seed: str = "shards",
    digest_cols: list[str] | None = None,
) -> DataFrame:
    """The consumer-side half of the manifest contract: digest the
    data AS DELIVERED, grouped by its ``shard`` column — no
    reassignment, so a tampered/truncated shard file changes exactly
    that shard's row.  Compare against :func:`training_shard_manifest`
    (same seed and digest_cols) to accept or reject a delivery."""
    cols = digest_cols or [id_col, token_count_col]
    return (
        delivered.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_col).cast("long").alias("n_tokens"),
            _content_digest(cols, seed).alias("content_digest"),
        )
        .orderBy("shard")
    )


def training_shard_manifest_sql(
    table_sql: str,
    id_col: str,
    token_count_expr: str,
    n_shards: int,
    seed: str = "shards",
    balance: str = "docs",
) -> str:
    """DuckDB twin of :func:`training_shard_manifest` with the default
    ``digest_cols = [id_col, token_count_col]``.  The oracle may use a
    plain global ROW_NUMBER — it runs at fixture scale; the engine
    side is the one that must avoid the global sort."""
    ord_expr = md5_draw_sql(seed, id_col)
    digest_expr = md5_draw_sql(f"{seed}:content", id_col, "n_tok")
    if balance == "docs":
        order_by = f"{ord_expr}, {id_col}"
        shard_expr = f"(rnk - 1) % {n_shards}"
    else:
        order_by = f"n_tok DESC, {id_col}"
        shard_expr = (
            f"CASE WHEN ((rnk - 1) // {n_shards}) % 2 = 0"
            f" THEN (rnk - 1) % {n_shards}"
            f" ELSE {n_shards - 1} - (rnk - 1) % {n_shards} END"
        )
    return f"""
        WITH ranked AS (
            SELECT {id_col},
                   {token_count_expr} AS n_tok,
                   ROW_NUMBER() OVER (ORDER BY {order_by}) AS rnk
            FROM ({table_sql})
        )
        SELECT CAST({shard_expr} AS INT) AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM({digest_expr}::HUGEINT)
                    % {TOKEN_SPACE} AS BIGINT) AS content_digest
        FROM ranked GROUP BY 1 ORDER BY 1
    """
