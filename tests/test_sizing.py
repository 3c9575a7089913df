"""CDM perfops sizing plan (plans/sizing.py): rule branches on
crafted tables — large rows trip batchSize 1 and the reduced fetch
size, PK=partition-key trips batchSize 1 regardless of size, numParts
follows ceil(bytes/10MB) with a floor of 1."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_data_migration_spark.plans.sizing import (
    DEFAULT_BATCH,
    DEFAULT_FETCH,
    REDUCED_FETCH,
    migration_sizing_plan,
)


def _plan(spark, tables, flags=None, **kw):
    return {
        r["table_name"]: r.asDict()
        for r in migration_sizing_plan(spark, tables, flags, **kw).collect()
    }


def test_rule_branches(spark, tmp_path):
    small = str(tmp_path / "small")
    spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("v")
    ).write.parquet(small)

    # ~120 KB rows: uncompressible random-ish hex blobs
    big = str(tmp_path / "big")
    spark.range(0, 24).select(
        F.col("id").alias("k"),
        F.concat_ws(
            "",
            F.array(*[
                F.sha2(F.concat(F.col("id").cast("string"), F.lit(i)), 512)
                for i in range(960)
            ]),
        ).alias("blob"),
    ).coalesce(1).write.parquet(big)

    plan = _plan(
        spark,
        {"small": small, "big": big, "flagged": small},
        {"flagged": True},
    )

    s = plan["small"]
    assert s["n_rows"] == 2000
    assert s["batch_size"] == DEFAULT_BATCH
    assert s["fetch_size_rows"] == DEFAULT_FETCH
    assert s["num_parts"] == 1  # tiny table floors at one part
    assert s["eta_seconds"] == 1

    b = plan["big"]
    assert b["avg_row_bytes"] > 100 * 1024
    assert b["batch_size"] == 1  # large-row rule
    assert b["fetch_size_rows"] == REDUCED_FETCH

    f = plan["flagged"]
    assert f["avg_row_bytes"] == s["avg_row_bytes"]
    assert f["batch_size"] == 1  # PK=partition-key rule


def test_num_parts_ceiling(spark, tmp_path):
    # ~30 MB of data -> ceil(bytes/10MB) parts (3 or 4 depending on
    # compression framing; never the 1-part floor)
    path = str(tmp_path / "mid")
    spark.range(0, 60_000).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 512).alias("a"),
        F.sha2((F.col("id") + 1).cast("string"), 512).alias("b"),
        F.sha2((F.col("id") + 2).cast("string"), 512).alias("c"),
    ).write.parquet(path)
    plan = _plan(spark, {"mid": path})
    m = plan["mid"]
    expected = -(-m["data_bytes"] // (10 * 1024 * 1024))
    assert m["num_parts"] == max(expected, 1) > 1


def test_empty_table_reported_not_fatal(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    empty = str(tmp_path / "empty")
    spark.createDataFrame(
        [], T.StructType([T.StructField("k", T.LongType())])
    ).write.parquet(empty)
    small = str(tmp_path / "small")
    spark.range(0, 10).select(F.col("id").alias("k")).write.parquet(small)
    plan = _plan(spark, {"empty": empty, "small": small})
    e = plan["empty"]
    assert e["n_rows"] == 0 and e["avg_row_bytes"] == 0
    assert e["num_parts"] == 1 and e["eta_seconds"] == 1
    assert plan["small"]["n_rows"] == 10  # the empty table hurt nobody
    with pytest.raises(ValueError):
        migration_sizing_plan(spark, {})


def test_eta_uses_ratelimit(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 12_345).select(F.col("id").alias("k")).write.parquet(path)
    plan = _plan(spark, {"t": path}, ratelimit_rows_per_sec=1000)
    assert plan["t"]["eta_seconds"] == 13  # ceil(12345/1000)
