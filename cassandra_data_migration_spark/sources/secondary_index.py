"""Secondary index over a parquet table — the Spark-native analogue of
Cassandra's 2i/SAI (query by a non-key column without a full scan;
the reference's data model leans on exactly this for lookup tables,
docs/02-data-modeling).

Index layout: a narrow ``(value, key...)`` parquet table partitioned
by ``bucket = pmod(xxhash64(value), num_buckets)``.  A lookup hashes
the probe value to its bucket, so the index read touches ONE
partition directory (Spark partition pruning — ``PartitionFilters``
in the scan, pinned by a plan test), filters the exact value inside
it, and semi-joins the base table on the returned primary keys.

Why this shape at 100 TB:

- the index is two or three columns regardless of base-row width —
  a terabyte-wide table indexes into gigabytes;
- bucketing by hash keeps partition directories bounded (1024 dirs,
  not one per distinct value) while still pruning ~1/1024 of the
  index per probe;
- the final key fetch is a broadcast semi-join against the base scan
  (selective probes return few keys), which Spark pushes into a
  runtime filter; a PK-partitioned base layout turns it into file
  pruning too.

Maintenance is append-only (index new base files as they land) or
rebuild-by-partition; this module keeps build + probe, the query
path the reference exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket(value_col: str, num_buckets: int):
    return F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_buckets))


def build_secondary_index(
    df: DataFrame,
    index_path: str,
    value_col: str,
    key_cols: list[str],
    num_buckets: int = 64,
) -> None:
    """Materialize the index table: one row per base row, columns
    (value, keys..., idx_bucket), partitioned on disk by idx_bucket."""
    (
        df.select(value_col, *key_cols)
        .withColumn("idx_bucket", _bucket(value_col, num_buckets))
        .repartition("idx_bucket")
        .write.partitionBy("idx_bucket")
        .mode("overwrite")
        .parquet(index_path)
    )


def index_lookup(
    spark: SparkSession,
    base: DataFrame,
    index_path: str,
    value_col: str,
    key_cols: list[str],
    value,
    num_buckets: int = 64,
) -> DataFrame:
    """All base rows with ``value_col == value`` via the index: prune
    to the probe value's bucket directory, filter the value, broadcast
    the matching keys into a semi-join on the base table."""
    idx = spark.read.parquet(index_path)
    # xxhash64 is TYPE-dependent: hashing an int literal does not
    # equal hashing the same value as a long column — cast the probe
    # to the indexed column's exact type before bucketing
    vtype = dict(idx.dtypes)[value_col]
    probe = F.lit(value).cast(vtype)
    probe_bucket = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(probe), F.lit(num_buckets)).alias("b"))
        .collect()[0]["b"]
    )
    keys = (
        idx.filter(F.col("idx_bucket") == probe_bucket)  # partition pruning
        .filter(F.col(value_col) == probe)
        .select(*key_cols)
        .distinct()
    )
    return base.join(F.broadcast(keys), key_cols, "left_semi")
