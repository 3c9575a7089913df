"""Round-9 families: connector-seam warm-up and persisted PQ/SQ8
quantizer artifacts.

Part chain continues from part12 (star-import preserves the shared
namespace/evaluation order of the former monolith).
"""
from __future__ import annotations

from cdm_entry.part12_round8 import *  # noqa: F401,F403

# --- round 9: connector-seam warm-up -----------------------------------------

# The fake Python-DSv2 Cassandra source pays a per-process cost the
# first time a plan touches it (datasource registration + Python
# worker spin-up + first Arrow exchange).  BENCH r7->r8 showed that
# fixed cost MIGRATING between connector_scan and
# connector_write_audit depending on run order (their sum stayed
# flat: 8.5 -> 6.7 s).  Warming the seam once in bench setup — like
# the LSH band index and the repair lake layout — pins both queries
# at steady-state cost (VERDICT r8 ask #4).
_CONNECTOR_SEAM_WARMED: set = set()


def _ensure_connector_seam(spark: SparkSession, sf_dir: str) -> None:
    """Register the fake Cassandra source and run one tiny end-to-end
    read through CassandraTableSource so every per-process first-use
    cost (registration, Python data-source worker, Arrow path) is paid
    OUTSIDE the timed section."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _CONNECTOR_SEAM_WARMED:
        return
    from cassandra_data_migration_spark.sources.connector import (
        CassandraTableSource,
    )
    from cassandra_data_migration_spark.sources.fake_cassandra import (
        register_fake_cassandra,
    )

    register_fake_cassandra(spark)
    src = CassandraTableSource(
        keyspace=sf_dir,
        partition_keys={"region": ["r_regionkey"]},
        fetch_size_rows=1000,
    )
    src.read(spark, "region").count()
    _CONNECTOR_SEAM_WARMED.add(key)


# --- round 9: persisted PQ codebook + SQ8 bounds artifacts -------------------

# the remaining trained artifacts VERDICT r8 flagged: PQ codebooks and
# SQ8 scales were still re-derived per query while IVF/BPE had the
# train-once/probe-many lifecycle.  Same per-process store pattern as
# _IVF_INDEXES (keyed (applicationId, sf_dir)).
_PQ_INDEXES: dict = {}
_SQ8_TABLES: dict = {}


def _ensure_pq_codebook(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    from cassandra_data_migration_spark.operators.ann_index import (
        persist_pq_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    p = _PQ_INDEXES.get(key)
    if p is None:
        p = tempfile.mkdtemp(prefix="pq_index_")
        persist_pq_index(
            spark,
            load_table(spark, sf_dir, "embeddings"),
            p,
            n_centroids=32,
            num_subspaces=8,
        )
        _PQ_INDEXES[key] = p
    return p


def _ensure_sq8_bounds(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    from cassandra_data_migration_spark.operators.ann_index import (
        persist_sq8_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    p = _SQ8_TABLES.get(key)
    if p is None:
        p = tempfile.mkdtemp(prefix="sq8_table_")
        persist_sq8_table(spark, load_table(spark, sf_dir, "embeddings"), p)
        _SQ8_TABLES[key] = p
    return p


def q_pq_index_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # train + publish the PQ index (versioned codebook lake table +
    # the corpus encoded ONCE as 8-byte codes).  Gate surface: the
    # per-(subspace, code) population read back from the PUBLISHED
    # codes layout — it matches the oracle only if the persisted e4
    # argmin encode is engine-exact
    from cassandra_data_migration_spark.operators.ann_index import (
        codes_dir,
        latest_version,
    )

    p = _ensure_pq_codebook(spark, sf_dir)
    codes = spark.read.parquet(codes_dir(p, latest_version(p, "codebook")))
    return (
        codes.select("vec_id", F.posexplode("codes").alias("j", "code"))
        .groupBy("j", "code")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("j", "code")
    )


def q_pq_probe_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe the PERSISTED PQ index: codebook read (O(32) rows) ->
    # driver-built integer LUT -> scan of the 8-byte codes layout +
    # TakeOrdered.  No encode/training stage in the plan (pinned by
    # tests/test_r9_round.py); same output contract as pq_adc_topk
    from cassandra_data_migration_spark.operators.ann_index import (
        pq_probe_persisted,
    )

    p = _ensure_pq_codebook(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    return pq_probe_persisted(spark, p, qv, k=10, exclude_ids=[0])


def q_sq8_bounds_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # publish the SQ8 artifact (versioned bounds table + the corpus
    # quantized ONCE to int8).  Gate surface: per-bucket element stats
    # read back from the PUBLISHED q8 layout — exact iff the persisted
    # quantization matches the oracle's recompute element-for-element
    from cassandra_data_migration_spark.operators.ann_index import (
        latest_version,
        sq8_dir,
    )

    p = _ensure_sq8_bounds(spark, sf_dir)
    q8 = spark.read.parquet(sq8_dir(p, latest_version(p, "bounds")))
    qsum = F.aggregate(
        "qvec", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        q8.select(
            (F.col("vec_id") % 8).alias("bucket"),
            qsum.alias("_s"),
            F.array_min("qvec").alias("_mn"),
            F.array_max("qvec").alias("_mx"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("_s").cast("long").alias("sum_q"),
            F.min("_mn").alias("min_q"),
            F.max("_mx").alias("max_q"),
        )
        .orderBy("bucket")
    )


def q_sq8_topk_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank over the PERSISTED int8 table: one O(1) qvec lookup + a
    # scan of the published layout + TakeOrdered — no per-query
    # re-quantization stage (pinned by tests); same output contract as
    # quantized_topk
    from cassandra_data_migration_spark.operators.ann_index import (
        sq8_topk_persisted,
    )

    p = _ensure_sq8_bounds(spark, sf_dir)
    return sq8_topk_persisted(spark, p, query_id=0, k=10)


QUERIES["pq_index_persist"] = q_pq_index_persist
ORACLES["pq_index_persist"] = f"""
    WITH {_PQ_CTES}
    SELECT j, code, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM codes GROUP BY j, code ORDER BY j, code
"""

QUERIES["pq_probe_persisted"] = q_pq_probe_persisted
# identical contract to the in-query ADC path: the probe must
# reproduce pq_adc_topk exactly from the persisted artifact
ORACLES["pq_probe_persisted"] = ORACLES["pq_adc_topk"]

QUERIES["sq8_bounds_persist"] = q_sq8_bounds_persist
ORACLES["sq8_bounds_persist"] = """
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ),
    m AS (
        SELECT vec_id, ev,
               list_max(list_transform(ev, x -> abs(x))) AS mx
        FROM v
    ),
    q8 AS (
        SELECT vec_id,
               CASE WHEN mx = 0 THEN list_transform(ev, x -> 0)
                    ELSE list_transform(
                        ev, x -> CAST(round(x * 127.0 / mx) AS INT))
               END AS qv
        FROM m
    )
    SELECT CAST(vec_id % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(list_sum(qv)) AS BIGINT) AS sum_q,
           MIN(list_min(qv)) AS min_q,
           MAX(list_max(qv)) AS max_q
    FROM q8 GROUP BY 1 ORDER BY 1
"""

QUERIES["sq8_topk_persisted"] = q_sq8_topk_persisted
# identical contract to the in-query SQ8 path
ORACLES["sq8_topk_persisted"] = ORACLES["quantized_topk"]


register_queries(globals())
__all__ = export_all(globals())
