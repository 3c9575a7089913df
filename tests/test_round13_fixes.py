"""Round-13 regression pins.

The round-12 `tests_ok: false` root cause: `scaled_shuffle_partitions`
trusted Catalyst's sizeInBytes unconditionally, and a
``createDataFrame``-backed frame (LogicalRDD) reports
``spark.sql.defaultSizeInBytes`` = Long.MaxValue — the formula then
returned the 2²⁰-partition cap and the quorum tests' repartition
became a ~10⁶-task exchange (hours of pure task overhead on a 4-row
fixture).  The guard treats any estimate ≥ 2⁵⁰ as unknown and falls
back to the parallelism floor.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_scaled_shuffle_partitions_distrusts_unknown_stats(spark):
    from cassandra_data_migration_spark.sources.tables import (
        scaled_shuffle_partitions,
    )

    # LogicalRDD (createDataFrame) → unknown stats → floor, never cap
    local = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "k long, v long, wt long"
    )
    n = scaled_shuffle_partitions(local)
    assert n == spark.sparkContext.defaultParallelism

    # parquet-backed frame → real file stats → sane bounded count
    from cassandra_data_migration_spark.sources.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    n_scan = scaled_shuffle_partitions(li)
    assert (
        spark.sparkContext.defaultParallelism <= n_scan <= 4096
    ), n_scan


def test_quorum_on_local_frames_is_fast(spark):
    # the exact round-12 hang shape: quorum over createDataFrame
    # replicas must not manufacture a million-partition exchange
    from cassandra_data_migration_spark.operators.cells import (
        quorum_read_repair,
    )

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k long, v long, wt long"
    )
    r0 = mk([(1, 10, 100), (2, 20, 100)])
    r1 = mk([(1, 10, 100), (2, 21, 200)])
    t0 = time.perf_counter()
    out = quorum_read_repair([r0, r1], "k", "v", "wt").collect()
    wall = time.perf_counter() - t0
    got = {r["k"]: (r["winner_v"], r["winner_wt"]) for r in out}
    assert got == {2: (21, 200)}
    # pre-fix this stage alone took hours; generous bound for slow hosts
    assert wall < 120, f"quorum over local frames took {wall:.1f}s"
