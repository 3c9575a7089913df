"""Exercise-4 spine: generate → migrate → validate → autocorrect
(SURVEY.md §7.2 step 1), plus the feature stages."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cassandra_data_migration_spark.functions import metadata as md
from cassandra_data_migration_spark.generate import generate_training_keyspace
from cassandra_data_migration_spark.plans.migrate import MigrationConfig, migrate
from cassandra_data_migration_spark.plans.validate import (
    autocorrect,
    schema_diff,
    validate_table,
    validation_report,
)
from cassandra_data_migration_spark.schema import PRIMARY_KEYS, WRITETIME_COL


@pytest.fixture(scope="module")
def keyspace(spark):
    return generate_training_keyspace(spark, scale=1, seed=42)


def test_generation_golden_counts(keyspace):
    # lab/scripts/generate_data.py:187-190 volumes
    assert keyspace["users"].count() == 1000
    assert keyspace["products"].count() == 500
    assert keyspace["orders"].count() == 2000
    assert keyspace["user_activity"].count() == 5000


def test_generation_is_deterministic(spark):
    from cassandra_data_migration_spark.generate import generate_users

    a = generate_users(spark, 50, seed=7).collect()
    b = generate_users(spark, 50, seed=7).repartition(13).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_generation_fk_integrity(keyspace):
    # J4: every order references an existing user
    orphans = keyspace["orders"].join(
        keyspace["users"], on="user_id", how="left_anti"
    )
    assert orphans.count() == 0


def test_migrate_end_to_end(spark, keyspace, tmp_path):
    origin = str(tmp_path / "origin")
    target = str(tmp_path / "target")
    keyspace["users"].write.parquet(origin)

    res = migrate(spark, MigrationConfig(origin_path=origin, target_path=target))
    assert res.rows_written == 1000
    v = validate_table(
        spark.read.parquet(origin), spark.read.parquet(target), ["user_id"], "users"
    )
    assert v.passed
    assert "PASS" in validation_report([v])


def test_migrate_features_compose(spark, keyspace, tmp_path):
    origin = str(tmp_path / "o2")
    target = str(tmp_path / "t2")
    keyspace["users"].write.parquet(origin)
    cfg = MigrationConfig(
        origin_path=origin,
        target_path=target,
        exclude_columns=["preferences"],
        where_condition="status = 'active'",
        constant_columns={"migrated_by": "cdm-spark"},
        custom_transforms=[lambda df: df.withColumn("email", F.lower("email"))],
    )
    res = migrate(spark, cfg)
    out = spark.read.parquet(target)
    assert "preferences" not in out.columns
    assert "migrated_by" in out.columns
    assert out.filter(F.col("status") != "active").count() == 0
    assert res.rows_written == out.count()


def test_migrate_dry_run_writes_nothing(spark, keyspace, tmp_path):
    origin = str(tmp_path / "o3")
    target = str(tmp_path / "t3")
    keyspace["products"].write.parquet(origin)
    res = migrate(
        spark, MigrationConfig(origin_path=origin, target_path=target, dry_run=True)
    )
    assert res.dry_run and res.rows_read == 500 and res.rows_written == 0
    import os

    assert not os.path.exists(target)


def test_autocorrect_repairs_and_never_deletes(spark, keyspace):
    users = keyspace["users"].cache()
    # break the target: drop some rows, corrupt some, add an extra row
    target = users.filter(F.pmod(F.xxhash64("user_id"), F.lit(10)) != 0).withColumn(
        "status",
        F.when(F.pmod(F.xxhash64("user_id"), F.lit(7)) == 0, F.lit("CORRUPT")).otherwise(
            F.col("status")
        ),
    )
    extra = users.limit(1).withColumn("user_id", F.lit("target-only-row"))
    target = target.unionByName(extra)

    repaired = autocorrect(users, target, ["user_id"])
    v = validate_table(users, repaired, ["user_id"], "users")
    assert v.missing == 0 and v.mismatched == 0
    # never deletes: the target-only row survives repair
    assert repaired.filter(F.col("user_id") == "target-only-row").count() == 1


def test_schema_diff_detects_column_changes(spark, keyspace):
    users = keyspace["users"]
    altered = users.drop("phone").withColumn("loyalty", F.lit(1))
    d = schema_diff(users, altered)
    sides = {(r.col_name, r.side) for r in d.collect()}
    assert ("phone", "origin_only") in sides
    assert ("loyalty", "target_only") in sides


def test_writetime_metadata_collapse(spark):
    df = spark.createDataFrame(
        [(1, "a", 100, 200, None), (2, "b", 300, 50, 60)],
        "id int, v string, id_writetime long, v_writetime long, v_ttl int",
    )
    out = md.collapse_writetime(df)
    rows = {r.id: r[WRITETIME_COL] for r in out.collect()}
    assert rows == {1: 200, 2: 300}
    out2 = md.collapse_ttl(df)
    assert {r.id: r["_ttl"] for r in out2.collect()} == {1: None, 2: 60}


def test_writetime_collapse_use_collections_flag(spark):
    # ttlwritetime.calc.useCollections (docs/04-cdm-approach.md:830):
    # collection cells excluded from the row max by default, included
    # when the flag is set — for both writetime and TTL
    df = spark.createDataFrame(
        [(1, ["x"], 100, 900, 5, 99)],
        "id int, tags array<string>, id_writetime long, "
        "tags_writetime long, id_ttl int, tags_ttl int",
    )
    default = md.collapse_writetime(df).first()[WRITETIME_COL]
    with_coll = md.collapse_writetime(df, use_collections=True).first()[
        WRITETIME_COL
    ]
    assert (default, with_coll) == (100, 900)
    assert md.collapse_ttl(df).first()["_ttl"] == 5
    assert md.collapse_ttl(df, use_collections=True).first()["_ttl"] == 99


def test_batch_size_heuristic_and_assignment(spark):
    from cassandra_data_migration_spark.plans.throttle import (
        assign_write_batches,
        effective_batch_size,
        estimate_avg_row_kb,
    )

    # CDM rule: default 5; 1 for >20KB rows; 1 when PK==partition key
    assert effective_batch_size(0.5) == 5
    assert effective_batch_size(25.0) == 1
    assert effective_batch_size(0.5, pk_is_partition_key=True) == 1

    small = spark.createDataFrame([(1, "x" * 10)], "id int, v string")
    big = spark.createDataFrame([(1, "x" * 40_000)], "id int, v string")
    assert estimate_avg_row_kb(small) < 20.0 < estimate_avg_row_kb(big)

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "rid int, grp int"
    )
    out = assign_write_batches(df, ["grp"], ["rid"], batch_size=4).collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault((r.grp, r.batch_seq), []).append(r.rid)
    # every batch within a group holds at most batch_size rows
    assert all(len(v) <= 4 for v in by_group.values())
    # deterministic: re-running yields the identical assignment
    again = assign_write_batches(df, ["grp"], ["rid"], batch_size=4).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_migrate_auto_batch_size(spark, keyspace, tmp_path):
    # auto rule resolves from a bounded row-size sample
    src = str(tmp_path / "src")
    keyspace["orders"].write.mode("overwrite").parquet(src)
    res = migrate(
        spark,
        MigrationConfig(origin_path=src, target_path="", dry_run=True),
    )
    assert res.batch_size == 5
    res1 = migrate(
        spark,
        MigrationConfig(
            origin_path=src, target_path="", dry_run=True,
            pk_is_partition_key=True,
        ),
    )
    assert res1.batch_size == 1
    res2 = migrate(
        spark,
        MigrationConfig(
            origin_path=src, target_path="", dry_run=True, batch_size=7
        ),
    )
    assert res2.batch_size == 7


def test_writetime_filter_and_shift(spark):
    df = spark.createDataFrame([(1, 100), (2, 300)], "id int, _writetime long")
    from cassandra_data_migration_spark.operators.filters import writetime_filter

    assert writetime_filter(df, 200).count() == 1
    shifted = md.shift_writetime(df, 1000)
    assert {r._writetime for r in shifted.collect()} == {1100, 1300}


def test_ttl_expiry(spark):
    df = spark.createDataFrame(
        [(1, 0, 10), (2, 0, None), (3, 50_000_000, 10)],
        "id int, _writetime long, _ttl int",
    )
    # now = 20s: row1 expired (0+10s < 20s), row2 no TTL, row3 written at 50s
    alive = md.expire_ttl(df, now_us=20_000_000)
    assert {r.id for r in alive.collect()} == {2, 3}


def test_run_tracker_resume(spark, tmp_path, keyspace):
    from cassandra_data_migration_spark.plans.tracker import RunTracker

    tr = RunTracker(spark, str(tmp_path / "track"), num_buckets=8)
    run = tr.new_run()
    tr.record_bucket(run, 0, "PASSED", 10)
    tr.record_bucket(run, 3, "FAILED", 0)
    tr.record_bucket(run, 3, "PASSED", 12)  # rerun fixed it
    tr.record_bucket(run, 5, "FAILED", 0)
    assert sorted(tr.completed_buckets(run)) == [0, 3]
    assert tr.pending_buckets(run) == [1, 2, 4, 5, 6, 7]

    df = spark.range(100)
    remaining = tr.filter_pending(df, "id", run)
    # buckets 0 and 3 are filtered out
    got = {r.id % 8 for r in remaining.collect()}
    assert 0 not in got and 3 not in got and got == {1, 2, 4, 5, 6, 7}


def test_throttle_schedule_honors_budgets_and_is_stable(spark):
    """T1 declarative schedule: no worker exceeds its per-second
    budget, every row is scheduled exactly once, and the schedule is a
    pure row function (repartition-invariant)."""
    from cassandra_data_migration_spark.plans.throttle import throttle_schedule
    from cassandra_data_migration_spark.sources.tables import load_table
    from tests.conftest import SF_CORRECT

    orders = load_table(spark, SF_CORRECT, "orders")
    sched = throttle_schedule(
        orders, ["o_orderkey"], rows_per_sec_global=2000, num_workers=4
    ).cache()
    assert sched.count() == orders.count()
    per = sched.groupBy("worker", "send_second").count().collect()
    assert all(r["count"] <= 500 for r in per)  # 2000/4 per worker-second
    glob = sched.groupBy("send_second").count().collect()
    assert all(r["count"] <= 2000 for r in glob)
    again = throttle_schedule(
        orders.repartition(7), ["o_orderkey"], rows_per_sec_global=2000, num_workers=4
    )
    assert sched.exceptAll(again).count() == 0
    sched.unpersist()
