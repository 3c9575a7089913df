"""Scan-side parallelism repair for compute-amplifying operators.

A small single-file parquet scan maps to ONE input split, so an
operator that amplifies work per input row (shingle explode, per-pair
scoring, Arrow-batched BLAS) runs on one core no matter how many the
cluster has.  At the 100 TB design point the scan already yields
thousands of splits and this helper is a planning-time no-op; it only
inserts a (tiny) round-robin shuffle when the input's partition count
is below the cluster's parallelism — exactly the case where the data
is small enough for that shuffle to be free.

Mirrors the reference's split-sizing rule (``numParts`` ideal =
table-size / 10 MB, docs/04-cdm-approach.md:459,472): the unit of scan
parallelism must track compute, not file layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def with_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin to the cluster parallelism ONLY
    if its physical plan has fewer partitions than that.  Checking the
    partition count compiles the plan but executes nothing."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
