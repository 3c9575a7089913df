"""Round-11 hardening: regression tests for the round-6 advice
findings — NULL-safe row canon/digest in repair, fake-connector
writer abort semantics, heartbeat daemon keying, and the
tombstone-GC superseded accounting (covered in test_cells once the
cell-TTL work lands)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F


def test_merkle_digest_distinguishes_null_shift(spark):
    """Two rows differing only in WHICH nullable column is NULL must
    digest differently — raw concat_ws skips NULLs, so ('x', NULL)
    and (NULL, 'x') used to collide and dodge both the leaf diff and
    the row repair."""
    from cassandra_data_migration_spark.operators.merkle import merkle_diff

    origin = spark.createDataFrame(
        [(1, "x", None), (2, "a", "b")], "k long, c1 string, c2 string"
    )
    target = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "b")], "k long, c1 string, c2 string"
    )
    flagged = merkle_diff(origin, target, "k", ["c1", "c2"], depth=1, fanout=4)
    assert flagged.count() >= 1, "null-shifted row did not flag any leaf"


def test_merkle_digest_distinguishes_separator_shift(spark):
    """Values containing the old '|' separator must not alias across
    column boundaries: ('a|b', 'c') vs ('a', 'b|c')."""
    from cassandra_data_migration_spark.operators.merkle import merkle_diff

    origin = spark.createDataFrame([(1, "a|b", "c")], "k long, c1 string, c2 string")
    target = spark.createDataFrame([(1, "a", "b|c")], "k long, c1 string, c2 string")
    assert (
        merkle_diff(origin, target, "k", ["c1", "c2"], depth=1, fanout=4).count()
        == 1
    )


def test_repair_null_shift_classified_and_repaired(spark):
    """merkle_scoped_repair must classify a null-shifted row as a
    MISMATCH (repair it) and converge — previously the canon collided
    and the row was silently left divergent."""
    from cassandra_data_migration_spark.plans.repair import (
        merkle_scoped_repair,
    )

    rows_o = [(i, f"v{i}", None if i % 2 else f"w{i}") for i in range(40)]
    rows_t = [
        (i, f"v{i}", None if i % 2 else f"w{i}") for i in range(40) if i != 7
    ]
    # key 7: origin has (c1='v7', c2=NULL); target has (c1=NULL, c2='v7')
    rows_t.append((7, None, "v7"))
    origin = spark.createDataFrame(rows_o, "k long, c1 string, c2 string")
    target = spark.createDataFrame(rows_t, "k long, c1 string, c2 string")
    rep = {
        r["metric"]: r["value"]
        for r in merkle_scoped_repair(
            origin, target, "k", ["c1", "c2"], depth=2, fanout=4
        ).collect()
    }
    assert rep["mismatched_repaired"] == 1
    assert rep["missing_repaired"] == 0 and rep["extra_removed"] == 0
    assert (
        rep["post_missing"] == 0
        and rep["post_mismatched"] == 0
        and rep["post_extra"] == 0
    )


def test_null_safe_canon_sql_matches_spark(spark, duck):
    """The Spark canon and its DuckDB twin agree byte-for-byte over
    NULLs, separators, and sentinel-looking values."""
    from cassandra_data_migration_spark.operators.merkle import (
        null_safe_canon,
        null_safe_canon_sql,
    )

    rows = [
        (1, "a", "b"),
        (2, None, "b"),
        (3, "a", None),
        (4, "a|b", "c"),
        (5, "␀", None),
    ]
    df = spark.createDataFrame(rows, "k long, c1 string, c2 string")
    got_spark = {
        r["k"]: r["canon"]
        for r in df.select(
            "k",
            null_safe_canon([F.col("c1"), F.col("c2")]).alias("canon"),
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES " +
                 ", ".join(
                     f"({k}, {repr(c1) if c1 is not None else 'NULL'}, "
                     f"{repr(c2) if c2 is not None else 'NULL'})"
                     for k, c1, c2 in rows
                 ) + ") AS v(k, c1, c2)")
    canon_sql = null_safe_canon_sql(["c1", "c2"])
    got_duck = dict(
        duck.execute(f"SELECT k, {canon_sql} FROM t").fetchall()
    )
    assert got_spark == got_duck


def test_fake_writer_abort_removes_partial_parts(spark, tmp_path):
    """A failed append through the fake connector must leave the old
    table byte-identical: abort() deletes every part the failed job
    wrote, so no duplicated/mixed rows survive."""
    from cassandra_data_migration_spark.sources.connector import (
        CassandraTableSource,
    )
    from cassandra_data_migration_spark.sources.fake_cassandra import (
        register_fake_cassandra,
    )

    register_fake_cassandra(spark)
    ks = str(tmp_path / "ks")
    src = CassandraTableSource(keyspace=ks)
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    src.write(base, "t", mode="append")
    table_dir = os.path.join(ks, "t.parquet")
    before = sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
    assert len(before) >= 1

    @F.udf("string")
    def boom(v):
        if v == "bad":
            raise ValueError("task failure injected by test")
        return v

    bad = (
        spark.createDataFrame(
            [(10, "ok"), (11, "bad")], "k long, v string"
        )
        .repartition(2, "k")
        .select("k", boom("v").alias("v"))
    )
    with pytest.raises(Exception, match="task failure injected"):
        src.write(bad, "t", mode="append")

    after = sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
    assert after == before, "failed job left partial parts behind"
    got = {(r["k"], r["v"]) for r in src.read(spark, "t").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_fake_writer_overwrite_abort_preserves_old_table(spark, tmp_path):
    """A failed OVERWRITE must keep the old parts (they are only
    removed in commit) and remove the new job's parts."""
    from cassandra_data_migration_spark.sources.connector import (
        CassandraTableSource,
    )
    from cassandra_data_migration_spark.sources.fake_cassandra import (
        register_fake_cassandra,
    )

    register_fake_cassandra(spark)
    ks = str(tmp_path / "ks")
    src = CassandraTableSource(keyspace=ks)
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    src.write(base, "t", mode="append")

    @F.udf("string")
    def boom(v):
        if v == "bad":
            raise ValueError("task failure injected by test")
        return v

    bad = (
        spark.createDataFrame([(10, "ok"), (11, "bad")], "k long, v string")
        .repartition(2, "k")
        .select("k", boom("v").alias("v"))
    )
    with pytest.raises(Exception, match="task failure injected"):
        src.write(bad, "t", mode="overwrite")
    got = {(r["k"], r["v"]) for r in src.read(spark, "t").collect()}
    assert got == {(1, "a"), (2, "b")}
