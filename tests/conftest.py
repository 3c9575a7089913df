from __future__ import annotations

import duckdb
import pytest

from cassandra_data_migration_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cdm-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same views the driver registers."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    yield con
    con.close()


def assert_scalar_only_schema(spark_df, name: str = "<query>"):
    """Every contract query must emit SCALAR columns only: the driver's
    canonicalizer pandas-sorts rows by value, and array/map/struct cells
    are unhashable there (the r4 `inverted_postings` driver ERR).  This
    gate makes that failure class impossible to reintroduce."""
    complex_types = {"array", "map", "struct"}
    bad = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.typeName() in complex_types
    ]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} — flatten with "
        "array_join/to_json so the harness canonicalizer can sort them"
    )


def assert_df_matches_oracle(spark_df, duck_con, sql: str, sort_cols=None):
    """Order-insensitive value compare between a Spark DataFrame and a
    DuckDB result — a local twin of the driver's correctness gate."""
    import math

    assert_scalar_only_schema(spark_df)
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"schema mismatch: {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    )
    cols = sorted(sdf.columns)
    sdf = sdf[cols]
    ddf = ddf[cols]
    assert len(sdf) == len(ddf), f"row count {len(sdf)} vs {len(ddf)}"

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        return str(v)

    s_rows = sorted(tuple(norm(v) for v in row) for row in sdf.itertuples(index=False))
    d_rows = sorted(tuple(norm(v) for v in row) for row in ddf.itertuples(index=False))
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  duck ={b}"
