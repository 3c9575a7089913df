"""End-to-end replay of the reference lab's exercise sequence
(lab/exercises/01→06) on this engine:

1. create the training keyspace (seeded synthetic users) on ORIGIN
2. dsbulk-style unload/load staging roundtrip
3. ZDM phase 1: dual writes begin (mutations hit BOTH stores)
4. CDM backfill: properties-driven Migrate of the origin snapshot
5. ZDM phases: shadow reads compare clusters, then cutover to TARGET
6. validation + AutoCorrect repair, final sign-off PASS

One scenario test, because this IS the product: a reference user
walks these exact steps, so the engine must compose them end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.generate import generate_users
from cassandra_data_migration_spark.plans.migrate import migrate
from cassandra_data_migration_spark.plans.properties import (
    config_from_properties,
)
from cassandra_data_migration_spark.plans.validate import (
    autocorrect,
    validate_table,
)
from cassandra_data_migration_spark.sources.files import (
    json_export,
    json_import,
)
from cassandra_data_migration_spark.streaming.routing import (
    Phase,
    PhaseMachine,
    ReadRouter,
    RouterMetrics,
    PHASE_ROUTING,
)

PK = ["user_id"]


def _upsert(store: DataFrame, muts: DataFrame) -> DataFrame:
    """Latest-wins upsert: the per-store effect of one dual write."""
    return store.join(muts.select(*PK), on=PK, how="left_anti").unionByName(
        muts
    )


def test_full_lab_migration_scenario(spark, tmp_path):
    # --- Ex 01/02: seed the training keyspace on ORIGIN ---
    users = generate_users(spark, 600).drop("preferences")  # flat for staging
    origin_path = str(tmp_path / "origin")
    users.write.parquet(origin_path)
    origin = spark.read.parquet(origin_path)

    # --- Ex 03: unload/load staging roundtrip is lossless ---
    stage = str(tmp_path / "stage")
    json_export(origin, stage)
    staged = json_import(spark, stage, schema=origin.schema)
    assert staged.count() == 600
    assert validate_table(origin, staged, PK, "users").passed

    # --- Ex 05 phase 1: dual writes ON before backfill ---
    machine = PhaseMachine()
    assert machine.phase == Phase.DUAL_WRITE
    muts = (
        origin.limit(50)
        .withColumn("status", F.lit("migrated-mutation"))
        .withColumn("email", F.concat(F.col("username"), F.lit("@new.example")))
    )

    # --- Ex 04: CDM backfill with a properties-file config ---
    target_path = str(tmp_path / "target")
    cfg = config_from_properties(
        {"spark.cdm.perfops.numParts": "2"}, origin_path, target_path
    )
    res = migrate(spark, cfg)
    assert res.rows_written == 600

    # dual write applies the in-flight mutations to BOTH stores
    origin_live = _upsert(origin, muts)
    target_live = _upsert(spark.read.parquet(target_path), muts)

    # --- Ex 05: shadow reads find zero drift, then cutover ---
    machine.advance()  # backfill done
    machine.advance()  # shadow reads
    mode, primary = PHASE_ROUTING[machine.phase]
    router = ReadRouter(mode, primary, RouterMetrics())
    count_q = lambda df: df.groupBy("status").count()  # noqa: E731
    router.route(origin_live, target_live, count_q).collect()
    assert router.metrics.shadow_reads == 1
    assert router.metrics.shadow_mismatches == 0

    machine.advance()  # reads to target
    machine.advance()  # direct
    assert machine.phase == Phase.DIRECT

    # --- Ex 06: validation, injected corruption, AutoCorrect ---
    assert validate_table(origin_live, target_live, PK, "users").passed
    corrupted = target_live.withColumn(
        "email",
        F.when(F.col("status") == "migrated-mutation", F.lit("CORRUPT"))
        .otherwise(F.col("email")),
    )
    broken = validate_table(origin_live, corrupted, PK, "users")
    assert not broken.passed and broken.mismatched == 50
    repaired = autocorrect(origin_live, corrupted, PK)
    final = validate_table(origin_live, repaired, PK, "users")
    assert final.passed and final.status == "PASS"


def test_merkle_scoped_repair_flow(spark):
    """The anti-entropy repair loop end to end: Merkle diff names the
    divergent token ranges, row-level reconciliation runs ONLY inside
    them, and the post-repair re-diff is clean."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _origin, _target
    from cassandra_data_migration_spark.functions.hashing import md5_draw
    from cassandra_data_migration_spark.operators.joins import reconcile
    from cassandra_data_migration_spark.operators.merkle import (
        TOKEN_SPACE,
        merkle_diff,
    )

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    origin = _origin(spark, "/root/testdata/sf0.001")
    target = _target(spark, "/root/testdata/sf0.001")

    flagged = merkle_diff(origin, target, "o_orderkey", cols).collect()
    assert flagged, "fixture perturbations must surface"
    buckets = [r["bucket"] for r in flagged]

    # drill down: P4-style token predicate scopes the row-level work
    width = -(-TOKEN_SPACE // 64)
    tok = md5_draw("merkle:tok", "o_orderkey")
    in_scope = F.floor(tok / F.lit(width)).isin(buckets)
    o_scope = origin.filter(in_scope)
    t_scope = target.filter(in_scope)

    # the scoped set is where ALL the damage lives: repair it
    repair = reconcile(o_scope, t_scope, ["o_orderkey"])
    repaired_target = (
        target.join(repair, ["o_orderkey"], "left_anti")
        .unionByName(repair)
    )

    # post-repair: the whole-table re-diff is clean (never-delete
    # semantics hold because the fixture only drops/perturbs rows)
    assert (
        merkle_diff(origin, repaired_target, "o_orderkey", cols).count() == 0
    )
