"""Round-8 advice regressions: histogram_quantile rounding must be
the exact integral DIV (not DECIMAL-divide-then-floor), bucket totals
come from the +Inf bucket after an ensureMonotonic repair, the rate
extrapolation clamps in the promql/functions.go >= 2.50 order, and
write_training_shards honours balance='tokens'."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F  # noqa: F401

from cassandra_data_migration_spark.streaming.histograms import (
    _quantiles_sql_over_hist,
    quantiles_from_bucket_counts,
)


def _hist_df(spark, rows):
    return spark.createDataFrame(rows, "le string, cumulative_count long")


def _twin(rows, les, q_ppm, out_scale):
    vals = ", ".join(f"('{le}', CAST({c} AS BIGINT))" for le, c in rows)
    hist = f"SELECT * FROM (VALUES {vals}) AS h(le, cumulative_count)"
    sql = _quantiles_sql_over_hist(hist, les, q_ppm, out_scale)
    return sorted(duckdb.sql(sql).fetchall())


def test_halfup_div_not_decimal_floor(spark):
    # num/den = 34999996/10^7 = 3.4999996: DECIMAL(38,6) division
    # rounds HALF_UP to 3.500000 BEFORE a floor (-> 4); the exact
    # integral DIV gives 3 — the documented off-by-one (ADVICE r7)
    rows = [("4", 10), ("+Inf", 8_749_999)]
    got = quantiles_from_bucket_counts(
        spark, _hist_df(spark, rows), les=[4], q_ppm=[1], out_scale=1
    ).collect()
    assert [(r["q_ppm"], r["value_fp"]) for r in got] == [(1, 3)]
    assert _twin(rows, [4], [1], 1) == [(1, 3)]


def test_total_is_inf_bucket_after_monotonic_repair(spark):
    # windowed per-le increases can be non-monotone (per-le resets at
    # different scrape boundaries): cum counts 5,3,9 repair to 5,5,9
    # and the total is the +Inf count (9), Prometheus ensureMonotonic
    les = [100, 200, 300]
    rows = [("100", 5), ("200", 3), ("300", 9), ("+Inf", 9)]
    got = sorted(
        (r["q_ppm"], r["value_fp"])
        for r in quantiles_from_bucket_counts(
            spark,
            _hist_df(spark, rows),
            les=les,
            q_ppm=[500_000, 777_778],
            out_scale=10_000,
        ).collect()
    )
    # q=0.5: r = 4.5 counts -> first bucket (cum 5), interp
    # 100·(4.5/5) = 90 -> 900000; with the UNREPAIRED le=200 row the
    # 0.777778 quantile would interpolate with in_b = 9-3 = 6 and
    # cum_lo = 3 instead of the repaired 4 and 5
    # q=0.777778: r = 7.000002 -> bucket 300, repaired in_b = 9-5 = 4,
    # interp = 200 + 100·(7.000002-5)/4 = 250.00005 -> 2500001 (hu)
    assert got == [(500_000, 900_000), (777_778, 2_500_001)]
    assert _twin(rows, les, [500_000, 777_778], 10_000) == got


def test_write_training_shards_token_balance(spark, tmp_path):
    from cassandra_data_migration_spark.operators.shards import (
        training_shard_manifest,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, 2 ** (i % 11)) for i in range(60)], "doc_id long, n_tok long"
    )
    path = str(tmp_path / "shards_tok")
    written = write_training_shards(
        df, path, "doc_id", "n_tok", n_shards=4, balance="tokens"
    )
    manifest = training_shard_manifest(
        df, "doc_id", "n_tok", n_shards=4, balance="tokens"
    )
    assert sorted(map(tuple, written.collect())) == sorted(
        map(tuple, manifest.collect())
    )
    # and it genuinely used the boustrophedon assignment: token sums
    # are near-equal, which round-robin over a 2**k skew is not
    toks = [r["n_tokens"] for r in written.collect()]
    assert max(toks) - min(toks) <= max(toks) * 0.2
