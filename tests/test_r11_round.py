"""Round-11 guards: the advisor-hardening items — stabbing join null
/ collision contracts, the bounded-bucket hard backstop, the routing
warning, and the thread-safe pin registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_stabbing_keeps_null_point_rows(spark):
    from cassandra_data_migration_spark.operators.joins import (
        stabbing_count_join,
    )

    points = spark.createDataFrame(
        [(1, 5), (2, None), (3, 100)], "pid int, p int"
    )
    intervals = spark.createDataFrame(
        [(1, 10), (4, 6), (None, 8), (2, None)], "lo int, hi int"
    )
    out = {
        r["pid"]: r["n_covering"]
        for r in stabbing_count_join(points, intervals, "p", "lo", "hi")
        .collect()
    }
    # every points row survives; NULL point and uncovered point get 0;
    # NULL-endpoint intervals cover nothing (and must not shift the
    # block offsets for the rows that do match)
    assert out == {1: 2, 2: 0, 3: 0}


def test_stabbing_out_col_collision_raises(spark):
    from cassandra_data_migration_spark.operators.joins import (
        stabbing_count_join,
    )

    points = spark.createDataFrame([(1, 5)], "n_covering int, p int")
    intervals = spark.createDataFrame([(1, 10)], "lo int, hi int")
    with pytest.raises(ValueError, match="n_covering"):
        stabbing_count_join(points, intervals, "p", "lo", "hi")


def test_bounded_bucket_hard_max_raises_loudly(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from cassandra_data_migration_spark.operators.dedup import (
        bounded_bucket_pairs,
    )

    entries = spark.range(10).select(
        F.lit("hot").alias("k"), F.col("id").alias("m")
    )
    ok = bounded_bucket_pairs(entries, "k", "m", cap=3)
    assert ok.count() > 0  # default backstop far above this bucket
    with pytest.raises(SparkRuntimeException, match="hard_max_bucket"):
        bounded_bucket_pairs(
            entries, "k", "m", cap=3, hard_max_bucket=5
        ).count()


def test_all_pairs_cosine_routing_warns(spark):
    from cassandra_data_migration_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.warns(RuntimeWarning, match="route_above_rows"):
        similarity.all_pairs_cosine(df, route_above_rows=4)
    # exact tier: no warning
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        similarity.all_pairs_cosine(df, route_above_rows=100)


def test_pin_registry_threadsafe_and_bounded(spark):
    import threading

    from cassandra_data_migration_spark import caching

    caching.release_pinned()
    frames = [spark.range(i + 1) for i in range(24)]

    def worker(fs):
        for f in fs:
            caching.pin(f)

    threads = [
        threading.Thread(target=worker, args=(frames[i::4],))
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(caching._pinned) <= caching.MAX_PINNED
    assert caching.release_pinned() <= caching.MAX_PINNED
    assert not caching._pinned


def test_lsh_multiprobe_superset_and_exact_values(spark):
    """n_probe>0 must only ADD true pairs: output is a superset of the
    single-bucket tier, a subset of the exact brute force, and every
    emitted cos_sim matches the exact value (verification is exact on
    any candidate path)."""
    from cassandra_data_migration_spark.operators import similarity

    df = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(8)])
            for i in range(60)
        ],
        "vec_id long, embedding array<double>",
    )
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.all_pairs_cosine(
            df, threshold=0.4, route_above_rows=None
        ).collect()
    }
    base = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.lsh_bucketed_pairs(
            df, dim=8, threshold=0.4, num_planes=5, n_probe=0
        ).collect()
    }
    probed = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.lsh_bucketed_pairs(
            df, dim=8, threshold=0.4, num_planes=5, n_probe=2
        ).collect()
    }
    assert set(base) <= set(probed) <= set(exact)
    assert len(probed) > len(base)  # the probes actually buy recall here
    for k, v in probed.items():
        assert v == exact[k]
