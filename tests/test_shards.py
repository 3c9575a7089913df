"""Training-shard export (operators/shards.py): deterministic
membership, round-robin size balance, manifest digest verification,
one-file-per-shard layout."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.shards import (
    assign_training_shards,
    shard_content_report,
    training_shard_manifest,
    write_training_shards,
)


def _docs(spark, n=200):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).cast("long").alias("n_tok"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias(
            "source"
        ),
    )


def test_round_robin_sizes_differ_by_at_most_one(spark):
    out = assign_training_shards(_docs(spark, 203), "doc_id", 8, seed="t")
    sizes = [
        r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]
    assert len(sizes) == 8 and max(sizes) - min(sizes) <= 1
    assert sum(sizes) == 203


def test_shuffle_is_seeded_and_deterministic(spark):
    a = {
        r["doc_id"]: (r["shard"], r["shuffle_rank"])
        for r in assign_training_shards(
            _docs(spark), "doc_id", 4, seed="s1"
        ).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["shuffle_rank"])
        for r in assign_training_shards(
            _docs(spark), "doc_id", 4, seed="s1"
        ).collect()
    }
    c = {
        r["doc_id"]: (r["shard"], r["shuffle_rank"])
        for r in assign_training_shards(
            _docs(spark), "doc_id", 4, seed="s2"
        ).collect()
    }
    assert a == b
    assert a != c  # a different seed reshuffles
    # ranks are a permutation of 1..n
    assert sorted(r for _, r in a.values()) == list(range(1, 201))


def test_shuffle_interleaves_sources(spark):
    # md5 order mixes the 3 sources: no shard may be single-source
    out = assign_training_shards(_docs(spark, 300), "doc_id", 4, seed="t")
    per = out.groupBy("shard").agg(
        F.countDistinct("source").alias("k")
    ).collect()
    assert all(r["k"] == 3 for r in per)


def test_manifest_counts_and_digest_match_recompute(spark):
    docs = _docs(spark)
    man = {
        r["shard"]: r
        for r in training_shard_manifest(
            docs, "doc_id", "n_tok", 4, seed="t"
        ).collect()
    }
    assigned = assign_training_shards(docs, "doc_id", 4, seed="t")
    for shard in range(4):
        ids = [
            r["doc_id"]
            for r in assigned.filter(F.col("shard") == shard).collect()
        ]
        assert man[shard]["n_docs"] == len(ids)
    # total tokens conserved
    assert sum(r["n_tokens"] for r in man.values()) == (
        docs.agg(F.sum("n_tok")).collect()[0][0]
    )


def test_write_one_file_per_shard_and_verifiable(spark, tmp_path):
    docs = _docs(spark, 120)
    path = str(tmp_path / "shards")
    man_written = {
        r["shard"]: r
        for r in write_training_shards(
            docs, path, "doc_id", "n_tok", 4, seed="t"
        ).collect()
    }
    # one parquet file per shard directory
    for shard in range(4):
        d = os.path.join(path, f"shard={shard}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1
    # the written manifest equals the pre-write manifest (content
    # survives the roundtrip; digest is order-independent)
    man_direct = {
        r["shard"]: r
        for r in training_shard_manifest(
            docs, "doc_id", "n_tok", 4, seed="t"
        ).collect()
    }
    for shard in range(4):
        assert (
            man_written[shard]["content_digest"]
            == man_direct[shard]["content_digest"]
        )
        assert man_written[shard]["n_docs"] == man_direct[shard]["n_docs"]
        assert man_written[shard]["n_tokens"] == man_direct[shard]["n_tokens"]
    # rows within a shard file are in shuffle order (streamable as-is)
    one = spark.read.parquet(os.path.join(path, "shard=0"))
    ranks = [r["shuffle_rank"] for r in one.collect()]
    assert ranks == sorted(ranks)


def test_corrupted_shard_fails_digest(spark, tmp_path):
    docs = _docs(spark, 60)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", "n_tok", 3, seed="t")
    # tamper: drop one row from shard 0's file
    d = os.path.join(path, "shard=0")
    f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
    kept = spark.read.parquet(os.path.join(d, f))
    kept.filter(F.col("doc_id") != kept.first()["doc_id"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "tampered"))
    os.remove(os.path.join(d, f))
    for x in os.listdir(d):
        # drop Hadoop's local-FS .crc sidecars: they'd catch the swap
        # before the manifest gets a chance (object-store deliveries
        # have no sidecars — the manifest is the integrity check there)
        if x.endswith(".crc"):
            os.remove(os.path.join(d, x))
    for x in os.listdir(str(tmp_path / "tampered")):
        if x.endswith(".parquet"):
            os.rename(
                os.path.join(str(tmp_path / "tampered"), x),
                os.path.join(d, f),
            )
    man_expected = {
        r["shard"]: r["content_digest"]
        for r in training_shard_manifest(
            docs, "doc_id", "n_tok", 3, seed="t"
        ).collect()
    }
    # the consumer check digests shards AS DELIVERED (no reassignment):
    # only the tampered shard fails, the intact ones still verify
    spark.catalog.refreshByPath(path)  # drop the pre-tamper file index
    delivered = spark.read.parquet(path)
    man_actual = {
        r["shard"]: r["content_digest"]
        for r in shard_content_report(
            delivered, "doc_id", "n_tok", seed="t"
        ).collect()
    }
    assert man_actual[0] != man_expected[0]
    assert man_actual[1] == man_expected[1]
    assert man_actual[2] == man_expected[2]


def test_payload_tamper_changes_digest(spark):
    # the digest covers digest_cols (default id + token count), not
    # just membership: swapping two rows' token counts inside one
    # shard keeps n_docs/n_tokens identical but MUST flip the digest
    docs = _docs(spark, 40)
    base = {
        r["shard"]: r
        for r in training_shard_manifest(
            docs, "doc_id", "n_tok", 2, seed="t"
        ).collect()
    }
    assigned = assign_training_shards(docs, "doc_id", 2, seed="t")
    rows0 = assigned.filter(F.col("shard") == 0).orderBy("doc_id").collect()
    # pick any two same-shard rows with DIFFERENT token counts
    two = next(
        (r0, r1)
        for i, r0 in enumerate(rows0)
        for r1 in rows0[i + 1:]
        if r0["n_tok"] != r1["n_tok"]
    )
    a, b = two[0]["doc_id"], two[1]["doc_id"]
    swapped = docs.withColumn(
        "n_tok",
        F.when(F.col("doc_id") == a, F.lit(two[1]["n_tok"]))
        .when(F.col("doc_id") == b, F.lit(two[0]["n_tok"]))
        .otherwise(F.col("n_tok")),
    )
    after = {
        r["shard"]: r
        for r in training_shard_manifest(
            swapped, "doc_id", "n_tok", 2, seed="t"
        ).collect()
    }
    assert after[0]["n_docs"] == base[0]["n_docs"]
    assert after[0]["n_tokens"] == base[0]["n_tokens"]
    assert after[0]["content_digest"] != base[0]["content_digest"]
    assert after[1]["content_digest"] == base[1]["content_digest"]


def test_digest_cols_can_cover_payload_text(spark):
    docs = _docs(spark, 30).withColumn(
        "text", F.concat(F.lit("body-"), F.col("doc_id").cast("string"))
    )
    man = training_shard_manifest(
        docs, "doc_id", "n_tok", 2, seed="t",
        digest_cols=["doc_id", "n_tok", "text"],
    ).collect()
    flipped = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.lit("EVIL")).otherwise(F.col("text")),
    )
    man2 = training_shard_manifest(
        flipped, "doc_id", "n_tok", 2, seed="t",
        digest_cols=["doc_id", "n_tok", "text"],
    ).collect()
    assert {r["content_digest"] for r in man} != {
        r["content_digest"] for r in man2
    }


def test_token_balance_beats_round_robin_on_skew(spark):
    # heavy-tailed lengths: doc i has ~i^2 tokens, so random round-
    # robin leaves shards whose token sums differ wildly; the snake
    # deal bounds the spread by one block's worth
    docs = spark.range(0, 160).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * F.col("id") + 1).cast("long").alias("n_tok"),
    )

    def spread(balance):
        kw = {"token_count_col": "n_tok"} if balance == "tokens" else {}
        out = (
            assign_training_shards(docs, "doc_id", 8, "t", balance, **kw)
            .groupBy("shard")
            .agg(F.sum("n_tok").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        sums = [r["s"] for r in out]
        counts = [r["n"] for r in out]
        assert max(counts) - min(counts) <= 1  # both keep doc balance
        return max(sums) - min(sums), sum(sums)

    sp_tok, total = spread("tokens")
    sp_rr, total2 = spread("docs")
    assert total == total2
    # snake spread is a small fraction of the round-robin one here
    assert sp_tok * 4 < sp_rr
    # and bounded by one block's spread: the largest 8 docs' range
    assert sp_tok <= (159 * 159 + 1) - (152 * 152 + 1)


def test_balance_tokens_requires_token_col(spark):
    with pytest.raises(ValueError):
        assign_training_shards(_docs(spark), "doc_id", 4, balance="tokens")
    with pytest.raises(ValueError):
        assign_training_shards(_docs(spark), "doc_id", 4, balance="bogus")


def test_invalid_n_shards_raises(spark):
    with pytest.raises(ValueError):
        assign_training_shards(_docs(spark), "doc_id", 0)
