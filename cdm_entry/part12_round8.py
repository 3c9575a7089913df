"""Round-8 families: node-down liveness alert and persisted index artifacts (IVF, BPE merges).

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part11_round7 import *  # noqa: F401,F403

# --- round 8: node-down liveness alert ---------------------------------------

# synthetic per-node heartbeat gauge from the events table: node =
# event_id % 4, one successful scrape per (node, hour) that saw any
# event, with an INJECTED full-day outage for node 2 on 2024-01-15
# (epoch day 19737) — deterministic in both engines.  Hourly scrape
# grid, down threshold 3 h (the "up == 0 for 1m" rule at the fixture's
# time scale), evaluation instant 2024-01-31T00:00Z.
_HB_SCRAPE_MS = 3_600_000
_HB_DOWN_MS = 3 * 3_600_000
_HB_END_MS = 1_706_659_200_000  # 2024-01-31T00:00:00Z
_HB_OUTAGE_DAY = 19_737  # 2024-01-15


def q_alert_node_down(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Z8 completion: exercise 6's fourth Prometheus alert (up == 0
    # for 1 min, lab/exercises/06-validation-monitoring.md:489-496) —
    # per-node liveness from heartbeat gaps INCLUDING the trailing
    # silent-stop edge, one alert row per outage
    from cassandra_data_migration_spark.streaming.metrics import (
        node_down_alerts,
    )

    hb = (
        load_table(spark, sf_dir, "events")
        .select(
            F.expr("event_id % 4").alias("node"),
            F.expr("unix_millis(ts)").alias("ts_ms"),
        )
        .filter(
            ~(
                (F.col("node") == 2)
                & (F.expr(f"ts_ms DIV 86400000 = {_HB_OUTAGE_DAY}"))
            )
        )
    )
    return node_down_alerts(
        hb,
        scrape_ms=_HB_SCRAPE_MS,
        down_ms=_HB_DOWN_MS,
        range_end_ms=_HB_END_MS,
    )


def _alert_node_down_oracle() -> str:
    from cassandra_data_migration_spark.streaming.metrics import (
        node_down_alerts_sql,
    )

    return node_down_alerts_sql(
        f"""SELECT event_id % 4 AS node, epoch_ms(ts) AS ts_ms
            FROM events
            WHERE NOT (event_id % 4 = 2
                       AND epoch_ms(ts) // 86400000 = {_HB_OUTAGE_DAY})""",
        scrape_ms=_HB_SCRAPE_MS,
        down_ms=_HB_DOWN_MS,
        range_end_ms=_HB_END_MS,
    )


QUERIES["alert_node_down"] = q_alert_node_down
ORACLES["alert_node_down"] = _alert_node_down_oracle()


# --- round 8: persisted index artifacts (train once, probe many) -------------

# per-process artifact stores, keyed (applicationId, sf_dir) like the
# repair lake layout: a real pipeline trains its quantizer/tokenizer
# once and publishes a version; probes must pay probe cost only
_IVF_INDEXES: dict = {}
_BPE_MERGE_TABLES: dict = {}
_IVF_N_CENTROIDS = 16
_IVF_N_PROBE = 4


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    from cassandra_data_migration_spark.operators.ann_index import (
        persist_ivf_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    p = _IVF_INDEXES.get(key)
    if p is None:
        p = tempfile.mkdtemp(prefix="ivf_index_")
        persist_ivf_index(
            spark,
            load_table(spark, sf_dir, "embeddings"),
            p,
            n_centroids=_IVF_N_CENTROIDS,
        )
        _IVF_INDEXES[key] = p
    return p


def q_ivf_index_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # train + publish the IVF index as a versioned lake artifact
    # (operators/ann_index): centroid table under a snapshot manifest,
    # corpus written once partitioned by list_id.  The gate-checked
    # surface is the inverted-list MANIFEST read back from the
    # published layout — per-list vector counts, which only match the
    # oracle if the e4 assignment in the layout is engine-exact
    from cassandra_data_migration_spark.operators.ann_index import (
        latest_version,
        lists_dir,
    )

    p = _ensure_ivf_index(spark, sf_dir)
    return (
        spark.read.parquet(lists_dir(p, latest_version(p)))
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("list_id")
    )


def q_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe the PERSISTED index: centroid read (O(16) rows) -> driver
    # picks the 4 nearest lists by the same e4 key assignment used ->
    # scan ONLY those list_id= partitions (PartitionFilters; plan has
    # no training/assignment stage, pinned in tests) -> exact cosine
    # top-k within.  Approximate BY CONSTRUCTION yet exactly
    # oracle-checkable, because the assignment is engine-exact
    from cassandra_data_migration_spark.operators.ann_index import (
        ivf_probe_persisted,
    )

    p = _ensure_ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    return ivf_probe_persisted(spark, p, qv, k=10, n_probe=_IVF_N_PROBE)


def _ivf_assign_ctes(centroid_src: str = "SELECT * FROM embeddings") -> str:
    """v/cb/asg CTEs for the seeded-IVF oracles; ``centroid_src`` is
    the relation the md5-seeded centroid candidates come from (the
    full corpus for a one-shot build, the initially-indexed subset for
    the incremental-append build — appends never retrain)."""
    return f"""
    v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    cb AS (
        SELECT ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
               embedding::DOUBLE[] AS cv
        FROM (SELECT vec_id, embedding FROM ({centroid_src})
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
              LIMIT {_IVF_N_CENTROIDS})
    ),
    asg AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, cb.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                       CAST(floor((list_dot_product(cv, cv)
                                   - 2.0 * list_dot_product(ev, cv))
                                  * 10000.0 + 0.5) AS BIGINT), cid) AS rn
            FROM v, cb
        ) WHERE rn = 1
    )
"""


_IVF_ASSIGN_CTES = _ivf_assign_ctes()

QUERIES["ivf_index_persist"] = q_ivf_index_persist
ORACLES["ivf_index_persist"] = f"""
    WITH {_IVF_ASSIGN_CTES}
    SELECT CAST(cid AS INT) AS list_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM asg GROUP BY 1 ORDER BY 1
"""

QUERIES["ivf_index_probe"] = q_ivf_index_probe
ORACLES["ivf_index_probe"] = f"""
    WITH {_IVF_ASSIGN_CTES},
    q AS (SELECT embedding::DOUBLE[] AS a_v FROM embeddings
          WHERE vec_id = 0),
    probe AS (
        SELECT cid FROM (
            SELECT cb.cid,
                   ROW_NUMBER() OVER (ORDER BY
                       CAST(floor((list_dot_product(cv, cv)
                                   - 2.0 * list_dot_product(a_v, cv))
                                  * 10000.0 + 0.5) AS BIGINT), cid) AS rn
            FROM cb, q
        ) WHERE rn <= {_IVF_N_PROBE}
    ),
    short AS (
        SELECT v.vec_id, v.ev AS b_v FROM v JOIN asg USING (vec_id)
        WHERE asg.cid IN (SELECT cid FROM probe)
    )
    SELECT vec_id, ROUND({_COS_SIM}, 4) AS cos_sim
    FROM short, q ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


def _ensure_bpe_merges(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    from cassandra_data_migration_spark.operators.ann_index import (
        persist_bpe_merges,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    p = _BPE_MERGE_TABLES.get(key)
    if p is None:
        p = tempfile.mkdtemp(prefix="bpe_merges_")
        persist_bpe_merges(
            spark, load_table(spark, sf_dir, "documents"), p, num_merges=8
        )
        _BPE_MERGE_TABLES[key] = p
    return p


def q_bpe_vocab_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the tokenizer-artifact analogue: read the PUBLISHED merge table
    # (O(merges) rows, versioned) and apply it as a pure fold — no
    # per-round best-pair training jobs in this query's lineage after
    # the first build; same vocabulary oracle as bpe_vocab
    from cassandra_data_migration_spark.operators.ann_index import (
        bpe_apply_persisted,
    )

    p = _ensure_bpe_merges(spark, sf_dir)
    return bpe_apply_persisted(
        spark, load_table(spark, sf_dir, "documents"), p
    )


QUERIES["bpe_vocab_persisted"] = q_bpe_vocab_persisted
# oracle registered in oracle_sql() (fixture-dependent, same as
# bpe_vocab)


# --- round 8: incremental IVF index append ----------------------------------


def _ensure_ivf_incremental(spark: SparkSession, sf_dir: str) -> str:
    """Index built on the even-vec_id half, then the odd half APPENDED
    (assigned against the existing quantizer, prior layout hardlink-
    cloned — zero reprocessing of indexed vectors)."""
    import tempfile

    from cassandra_data_migration_spark.operators.ann_index import (
        ivf_index_append,
        persist_ivf_index,
    )

    key = ("incremental", spark.sparkContext.applicationId, sf_dir)
    p = _IVF_INDEXES.get(key)
    if p is None:
        p = tempfile.mkdtemp(prefix="ivf_incr_")
        emb = load_table(spark, sf_dir, "embeddings")
        persist_ivf_index(
            spark,
            emb.filter(F.expr("vec_id % 2 = 0")),
            p,
            n_centroids=_IVF_N_CENTROIDS,
        )
        ivf_index_append(spark, emb.filter(F.expr("vec_id % 2 = 1")), p)
        _IVF_INDEXES[key] = p
    return p


def q_ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    # incremental ingest: manifest of version 1 (initial even-half
    # build + appended odd half) — counts match the full-corpus
    # assignment against the EVEN-HALF-seeded centroids, which only
    # holds if the append assigned the new vectors with the exact
    # persisted quantizer and lost none of the cloned layout
    from cassandra_data_migration_spark.operators.ann_index import (
        latest_version,
        lists_dir,
    )

    p = _ensure_ivf_incremental(spark, sf_dir)
    return (
        spark.read.parquet(lists_dir(p, latest_version(p)))
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("list_id")
    )


QUERIES["ivf_index_append"] = q_ivf_index_append
ORACLES["ivf_index_append"] = f"""
    WITH {_ivf_assign_ctes("SELECT * FROM embeddings WHERE vec_id % 2 = 0")}
    SELECT CAST(cid AS INT) AS list_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM asg GROUP BY 1 ORDER BY 1
"""


# --- round 8: k-means-refined persisted IVF index ---------------------------

_IVF_REFINE_ITERS = 2


def _ensure_ivf_refined(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    from cassandra_data_migration_spark.operators.ann_index import (
        persist_ivf_index,
    )

    key = ("refined", spark.sparkContext.applicationId, sf_dir)
    p = _IVF_INDEXES.get(key)
    if p is None:
        p = tempfile.mkdtemp(prefix="ivf_refined_")
        persist_ivf_index(
            spark,
            load_table(spark, sf_dir, "embeddings"),
            p,
            n_centroids=_IVF_N_CENTROIDS,
            refine_iters=_IVF_REFINE_ITERS,
        )
        _IVF_INDEXES[key] = p
    return p


def q_ivf_index_persist_refined(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # the quantizer-refinement claim made real: the persisted index's
    # centroids come from 2 engine-exact Lloyd rounds (kmeans_fit,
    # arrow tier) — balanced lists raise probe recall at the same
    # n_probe — and the published layout's inverted-list manifest
    # still matches the oracle bit-for-bit (the kmeans contract)
    from cassandra_data_migration_spark.operators.ann_index import (
        latest_version,
        lists_dir,
    )

    p = _ensure_ivf_refined(spark, sf_dir)
    return (
        spark.read.parquet(lists_dir(p, latest_version(p)))
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("list_id")
    )


def q_ivf_index_probe_refined(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # probe the refined index: same persisted-probe path (centroid
    # read -> driver e4 ranking -> PartitionFilters scan of 4 lists ->
    # exact cosine top-k), exactly oracle-replayed through the kmeans
    # iteration CTEs
    from cassandra_data_migration_spark.operators.ann_index import (
        ivf_probe_persisted,
    )

    p = _ensure_ivf_refined(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    return ivf_probe_persisted(spark, p, qv, k=10, n_probe=_IVF_N_PROBE)


QUERIES["ivf_index_persist_refined"] = q_ivf_index_persist_refined
ORACLES["ivf_index_persist_refined"] = _kmeans_oracle(
    k=_IVF_N_CENTROIDS,
    iters=_IVF_REFINE_ITERS,
    final_select="""SELECT CAST(cluster AS INT) AS list_id,
               CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM a2 GROUP BY 1 ORDER BY 1""",
)

QUERIES["ivf_index_probe_refined"] = q_ivf_index_probe_refined
ORACLES["ivf_index_probe_refined"] = _kmeans_oracle(
    k=_IVF_N_CENTROIDS,
    iters=_IVF_REFINE_ITERS,
    final_select=f"""SELECT s.vec_id, ROUND({_COS_SIM.replace("a_v", "q.qv").replace("b_v", "s.ev")}, 4) AS cos_sim
        FROM (
            SELECT v.vec_id, v.ev
            FROM v JOIN a2 ON v.vec_id = a2.vec_id
            WHERE a2.cluster IN (
                SELECT cid FROM (
                    SELECT cb2.cid,
                           ROW_NUMBER() OVER (ORDER BY
                               CAST(floor((list_dot_product(cv, cv)
                                           - 2.0 * list_dot_product(q.qv, cv))
                                          * 10000.0 + 0.5) AS BIGINT),
                               cid) AS rn
                    FROM cb2, (SELECT embedding::DOUBLE[] AS qv
                               FROM embeddings WHERE vec_id = 0) q
                ) WHERE rn <= {_IVF_N_PROBE}
            )
        ) s, (SELECT embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id = 0) q
        ORDER BY cos_sim DESC, s.vec_id LIMIT 10""",
)


# --- round 8: streaming liveness twin ---------------------------------------

# a SECOND injected failure mode for the live path: node 3 goes
# silent from 2024-01-25 (epoch day 19747) onward — a trailing
# silent-stop the current-instant rule must catch
_HB_SILENT_DAY = 19_747


def q_stream_node_down(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming twin of alert_node_down's trailing-edge rule: per-node
    # last-seen state (ONE row per node, max-fold -> idempotent,
    # replay-safe, no batch gate) maintained across 3 micro-batch
    # slices; the live alert evaluates the state against the same
    # instant/grid arithmetic as the batch operator, so streamed ==
    # batch-tail by construction and the batch SQL oracles it exactly
    import tempfile

    from cassandra_data_migration_spark.streaming.liveness import (
        heartbeat_state_stream,
        node_down_from_state,
    )

    hb = (
        load_table(spark, sf_dir, "events")
        .select(
            F.expr("event_id % 4").alias("node"),
            F.expr("unix_millis(ts)").alias("ts_ms"),
        )
        .filter(
            ~(
                (F.col("node") == 3)
                & (F.expr(f"ts_ms DIV 86400000 >= {_HB_SILENT_DAY}"))
            )
        )
        .withColumn(
            "_s",
            F.pmod(F.expr(f"ts_ms DIV {_HB_SCRAPE_MS}"), F.lit(3)),
        )
    )
    d = tempfile.mkdtemp(prefix="liveness_")
    src, st, ckpt = f"{d}/src", f"{d}/state", f"{d}/ckpt"
    for s in range(3):
        hb.filter(F.col("_s") == s).drop("_s").repartition(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("node bigint, ts_ms long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = heartbeat_state_stream(stream, st, checkpoint=ckpt)
    await_or_raise(q, 300)
    return node_down_from_state(
        spark,
        st,
        scrape_ms=_HB_SCRAPE_MS,
        down_ms=_HB_DOWN_MS,
        range_end_ms=_HB_END_MS,
    )


_HB_SLOTS = _HB_DOWN_MS // _HB_SCRAPE_MS
QUERIES["stream_node_down"] = q_stream_node_down
ORACLES["stream_node_down"] = f"""
    WITH hb AS (
        SELECT event_id % 4 AS node,
               epoch_ms(ts) // {_HB_SCRAPE_MS} AS b
        FROM events
        WHERE NOT (event_id % 4 = 3
                   AND epoch_ms(ts) // 86400000 >= {_HB_SILENT_DAY})
        GROUP BY 1, 2
    )
    SELECT node,
           CAST((MAX(b) + 1) * {_HB_SCRAPE_MS} AS BIGINT)
               AS down_since_ms,
           CAST(({_HB_END_MS // _HB_SCRAPE_MS} - MAX(b) - 1)
                * {_HB_SCRAPE_MS} AS BIGINT) AS down_for_ms,
           'node_down' AS alert
    FROM hb GROUP BY node
    HAVING {_HB_END_MS // _HB_SCRAPE_MS} - MAX(b) - 1 >= {_HB_SLOTS}
    ORDER BY node
"""


register_queries(globals())
__all__ = export_all(globals())
