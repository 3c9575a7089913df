"""Round-7 families: NTS placement, Prometheus histograms and PromQL, ZDM walkthrough, connector write audit, sizing plan, classifier evaluation, training shards.

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part10_stream_state import *  # noqa: F401,F403

# --- round 7: multi-DC placement + per-DC quorum ---------------------------

_NTS_DCS = {"dc1": 4, "dc2": 3}
_NTS_RF = {"dc1": 3, "dc2": 2}


def q_replica_ownership_nts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NetworkTopologyStrategy placement (the reference keyspace's own
    # strategy, lab/init-scripts/01-create-schema.cql:4-8): per-DC
    # replica counts with rack-diverse ring walk — dc1 holds RF=3
    # across 4 nodes/2 racks, dc2 RF=2 across 3 nodes/2 racks.  Same
    # broadcast-range-join plan as SimpleStrategy; only the literal
    # placement table changes.
    from cassandra_data_migration_spark.operators.ring import (
        replica_ownership_nts,
    )

    return replica_ownership_nts(
        load_table(spark, sf_dir, "orders"),
        key_col="o_orderkey",
        dcs=_NTS_DCS,
        rf_per_dc=_NTS_RF,
    )


def _replica_nts_oracle() -> str:
    from cassandra_data_migration_spark.operators.ring import replica_nts_sql

    return replica_nts_sql(
        "orders", "o_orderkey", dcs=_NTS_DCS, rf_per_dc=_NTS_RF
    )


QUERIES["replica_ownership_nts"] = q_replica_ownership_nts
ORACLES["replica_ownership_nts"] = _replica_nts_oracle()


def _event_replicas_by_dc(spark: SparkSession, sf_dir: str) -> dict:
    """Two DCs sharing the round-6 replica fixtures: dc1 = pristine +
    the stale/missing replica, dc2 = pristine + the tie-corrupted
    replica — so some keys repair locally in exactly one DC and the
    stale keys make dc1's local winner RACE AHEAD of dc2's (the
    dc_divergent set)."""
    r0, r1, r2 = _event_replicas(spark, sf_dir)
    return {"dc1": [r0, r1], "dc2": [r0, r2]}


def q_local_quorum_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LOCAL_QUORUM read repair per DC + the cross-DC divergence the
    # local mode cannot see (local winner != EACH_QUORUM winner) —
    # multi-DC NetworkTopologyStrategy repair math
    from cassandra_data_migration_spark.operators.cells import (
        local_quorum_read_repair,
    )

    return local_quorum_read_repair(
        _event_replicas_by_dc(spark, sf_dir),
        "event_id",
        "value_cents",
        "wt_us",
    )


ORACLES["local_quorum_repair"] = f"""
    WITH {_REPLICAS_SQL},
    by_dc AS (
        SELECT 'dc1' AS dc, event_id, wt_us, value_cents FROM base
        UNION ALL
        SELECT 'dc1',
               event_id,
               CASE WHEN event_id % 7 = 0 THEN wt_us + 1000000
                    ELSE wt_us END,
               CASE WHEN event_id % 7 = 0 THEN value_cents + 1
                    ELSE value_cents END
        FROM base WHERE event_id % 10 <> 0
        UNION ALL
        SELECT 'dc2', event_id, wt_us, value_cents FROM base
        UNION ALL
        SELECT 'dc2', event_id, wt_us,
               CASE WHEN event_id % 13 = 0 THEN value_cents + 5
                    ELSE value_cents END
        FROM base
    ),
    per_dc AS (
        SELECT dc, event_id,
               MAX(struct_pack(wt := wt_us, val := value_cents)) AS win,
               COUNT(*) AS n_replicas_present
        FROM by_dc GROUP BY dc, event_id
    ),
    cur AS (
        SELECT t.dc, t.event_id, COUNT(*) AS n_current
        FROM by_dc t JOIN per_dc p ON t.dc = p.dc AND t.event_id = p.event_id
        WHERE t.wt_us = p.win.wt AND t.value_cents = p.win.val
        GROUP BY t.dc, t.event_id
    ),
    gwin AS (
        SELECT event_id,
               MAX(struct_pack(wt := wt_us, val := value_cents)) AS gw
        FROM by_dc GROUP BY event_id
    )
    SELECT p.dc, p.event_id,
           p.win.val AS winner_value_cents,
           p.win.wt AS winner_wt_us,
           p.n_replicas_present,
           CAST(2 - COALESCE(c.n_current, 0) AS BIGINT) AS n_stale,
           (p.win.wt <> g.gw.wt OR p.win.val <> g.gw.val) AS dc_divergent
    FROM per_dc p
    LEFT JOIN cur c ON p.dc = c.dc AND p.event_id = c.event_id
    JOIN gwin g ON p.event_id = g.event_id
    WHERE 2 - COALESCE(c.n_current, 0) > 0
       OR p.win.wt <> g.gw.wt OR p.win.val <> g.gw.val
"""

QUERIES["local_quorum_repair"] = q_local_quorum_repair


# --- round 7: Prometheus histogram buckets + quantile reconstruction -------

# latency (cents of the events value, standing in for ms) bucket
# bounds; the last finite le covers the fixture max so +Inf is empty
_LATENCY_LES = [500, 1000, 2500, 5000, 10000, 25000, 50000]
_LATENCY_SQL = (
    "SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS lat FROM events"
)


def _latency_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("lat")
    )


def q_latency_histogram_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # the _bucket{le=} series a scrape target exports: cumulative
    # counts per configured bound incl. the mandatory +Inf row (=
    # _count) — exercise 6's dashboards consume exactly this shape
    from cassandra_data_migration_spark.streaming.histograms import (
        cumulative_histogram,
    )

    return cumulative_histogram(
        _latency_cents(spark, sf_dir), "lat", _LATENCY_LES
    )


def q_histogram_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PromQL histogram_quantile reconstruction (p50/p95/p99) from the
    # cumulative buckets — deliberately the BOARD's number (with its
    # bucketing error), not a raw-data percentile; exact integer
    # interpolation so the DuckDB twin matches bit-for-bit
    from cassandra_data_migration_spark.streaming.histograms import (
        histogram_quantiles,
    )

    return histogram_quantiles(
        _latency_cents(spark, sf_dir), "lat", _LATENCY_LES
    )


def _histogram_oracles() -> tuple[str, str]:
    from cassandra_data_migration_spark.streaming.histograms import (
        cumulative_histogram_sql,
        histogram_quantiles_sql,
    )

    return (
        cumulative_histogram_sql(_LATENCY_SQL, "lat", _LATENCY_LES),
        histogram_quantiles_sql(_LATENCY_SQL, "lat", _LATENCY_LES),
    )


_HIST_BUCKETS_SQL, _HIST_QUANTILES_SQL = _histogram_oracles()
QUERIES["latency_histogram_buckets"] = q_latency_histogram_buckets
ORACLES["latency_histogram_buckets"] = _HIST_BUCKETS_SQL
QUERIES["histogram_percentiles"] = q_histogram_percentiles
ORACLES["histogram_percentiles"] = _HIST_QUANTILES_SQL


# --- round 7: ZDM 5-phase walkthrough ---------------------------------------


def q_zdm_phase_walkthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the whole ZDM lifecycle (docs/05-zdm-approach.md:323-539;
    # lab/exercises/05-zdm-migration.md:26-33) driven end-to-end
    # through PhaseMachine + ReadRouter over one mutation log: events
    # split into 5 chronological segments (one per phase), reads
    # routed per the phase's proxy config (one route() per user
    # bucket, shadow compares sampled 1-in-4 in phase 3), writes
    # dual-written while the phase requires it and direct-to-target
    # after cutover.  Every count is an exact function of the log, so
    # the oracle replays the same bookkeeping in SQL.
    from cassandra_data_migration_spark.streaming.routing import (
        PHASE_ORDER,
        PhaseMachine,
        RouterMetrics,
    )

    ev = load_table(spark, sf_dir, "events")
    # post-backfill: clusters hold identical data — but the router
    # distinguishes clusters by OBJECT identity, so target gets its
    # own DataFrame handle
    origin, target = ev, ev.alias("zdm_target")
    stats = (
        ev.select(
            F.pmod("event_id", F.lit(5)).alias("ph"),
            (F.pmod("event_id", F.lit(3)) == 0).alias("is_read"),
            F.pmod("user_id", F.lit(8)).alias("bucket"),
        )
        .groupBy("ph")
        .agg(
            F.sum((~F.col("is_read")).cast("long")).alias("n_writes"),
            F.sort_array(
                F.collect_set(
                    F.when(F.col("is_read"), F.col("bucket"))
                )
            ).alias("read_buckets"),
        )
        .collect()
    )
    by_ph = {r["ph"]: r for r in stats}
    machine = PhaseMachine()
    out = []
    for i, phase in enumerate(PHASE_ORDER):
        m = RouterMetrics()
        router = machine.router(m)
        router.shadow_compare_every = 4
        r = by_ph[i]
        for b in [x for x in r["read_buckets"] if x is not None]:
            router.route(
                origin,
                target,
                lambda df, b=b: df.filter(F.pmod("user_id", F.lit(8)) == b),
            )
        n_writes = int(r["n_writes"])
        out.append(
            (
                phase.value,
                m.reads_origin,
                m.reads_target,
                m.shadow_reads,
                m.shadow_compared,
                m.shadow_mismatches,
                n_writes if machine.dual_write_enabled else 0,
                n_writes,
            )
        )
        if i + 1 < len(PHASE_ORDER):
            machine.advance()
    return spark.createDataFrame(
        out,
        "phase string, reads_origin long, reads_target long, "
        "shadow_reads long, shadow_compared long, shadow_mismatches long, "
        "rows_written_origin long, rows_written_target long",
    )


ORACLES["zdm_phase_walkthrough"] = """
    WITH ops AS (
        SELECT event_id % 5 AS ph,
               (event_id % 3 = 0) AS is_read,
               user_id % 8 AS bucket
        FROM events
    ),
    agg AS (
        SELECT ph,
               COUNT(CASE WHEN NOT is_read THEN 1 END) AS nw,
               COUNT(DISTINCT CASE WHEN is_read THEN bucket END) AS nb
        FROM ops GROUP BY ph
    ),
    named AS (
        SELECT ph, nw, nb,
               CASE ph WHEN 0 THEN '1_dual_write_on'
                       WHEN 1 THEN '2_backfill'
                       WHEN 2 THEN '3_shadow_reads'
                       WHEN 3 THEN '4_reads_to_target'
                       WHEN 4 THEN '5_direct_to_target' END AS phase
        FROM agg
    )
    SELECT phase,
           CAST(CASE WHEN ph <= 2 THEN nb ELSE 0 END AS BIGINT)
               AS reads_origin,
           CAST(CASE WHEN ph >= 3 THEN nb ELSE 0 END AS BIGINT)
               AS reads_target,
           CAST(CASE WHEN ph = 2 THEN nb ELSE 0 END AS BIGINT)
               AS shadow_reads,
           CAST(CASE WHEN ph = 2 THEN (nb + 3) // 4 ELSE 0 END AS BIGINT)
               AS shadow_compared,
           CAST(0 AS BIGINT) AS shadow_mismatches,
           CAST(CASE WHEN ph <= 3 THEN nw ELSE 0 END AS BIGINT)
               AS rows_written_origin,
           CAST(nw AS BIGINT) AS rows_written_target
    FROM named
"""

QUERIES["zdm_phase_walkthrough"] = q_zdm_phase_walkthrough


# --- round 7: connector write-path options audit ----------------------------


def q_connector_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the write twin of connector_scan: region is batch-written
    # THROUGH the live connector code path with the reference's write
    # knobs (cdm.properties:28-31 batchSize / ratelimit.target →
    # output.batch.size.rows / the CDM property verbatim), the fake
    # records the option map it received, and the audit report proves
    # (a) every row arrived (read back through the same seam) and
    # (b) each knob reached the source as the documented option
    import json as _json
    import tempfile

    from cassandra_data_migration_spark.sources.connector import (
        CassandraTableSource,
    )
    from cassandra_data_migration_spark.sources.fake_cassandra import (
        fake_cql_log_path,
        register_fake_cassandra,
    )

    register_fake_cassandra(spark)
    ks = tempfile.mkdtemp(prefix="write_audit_ks_")
    src = CassandraTableSource(keyspace=ks)
    src.write(
        load_table(spark, sf_dir, "region"),
        "region_copy",
        batch_size_rows=500,
        rate_limit_rows_per_sec=5000,
        consistency="LOCAL_QUORUM",
    )
    rows_written = src.read(spark, "region_copy").count()
    rec = None
    with open(fake_cql_log_path()) as fh:
        for line in fh:
            if ks in line and '"_op": "write"' in line:
                rec = _json.loads(line)
    if rec is None:
        raise RuntimeError("fake connector recorded no write for the audit")
    audit = [
        ("rows_written", str(rows_written)),
        (
            "batch_size_rows",
            rec.get("spark.cassandra.output.batch.size.rows", "MISSING"),
        ),
        (
            "ratelimit_rows_per_sec",
            rec.get("spark.cdm.perfops.ratelimit.target", "MISSING"),
        ),
        (
            "consistency",
            rec.get("spark.cassandra.output.consistency.level", "MISSING"),
        ),
    ]
    return spark.createDataFrame(audit, "audit_key string, value string")


ORACLES["connector_write_audit"] = """
    SELECT 'rows_written' AS audit_key,
           CAST(COUNT(*) AS VARCHAR) AS value FROM region
    UNION ALL SELECT 'batch_size_rows', '500'
    UNION ALL SELECT 'ratelimit_rows_per_sec', '5000'
    UNION ALL SELECT 'consistency', 'LOCAL_QUORUM'
"""

QUERIES["connector_write_audit"] = q_connector_write_audit


# --- round 7: PromQL evaluation (irate / rate / deriv) ----------------------
# The reference's dashboards COMPUTE with PromQL functions over the
# scraped series (lab/monitoring/grafana-dashboards/
# zdm-proxy-dashboard.json: irate(..._count[range]) throughput panels;
# zdm-go-runtime-metrics.json: deriv(go_memstats_*) trends).  The
# histogram work (latency_histogram_buckets / histogram_percentiles)
# covered the export + histogram_quantile sides; these cover the
# counter/gauge function family, evaluated exactly.

# scrape every 6h; the counter RESETS at 2024-01-15T00:00Z (process
# restart) so reset compensation is exercised on real fixture data
_PROM_STEP_MS = 21_600_000
_PROM_RESET_BUCKET = 1_705_276_800_000 // _PROM_STEP_MS
_PROM_RANGE = (1_704_844_800_000, 1_705_708_800_000)  # Jan 10 → Jan 20
_PROM_SCALE = 1_000_000_000

def _cum_counter_with_reset_sql(per_sql: str, series_col: str) -> str:
    """DuckDB twin of ``_cum_counter_with_reset`` over a (series, b,
    dc) per-scrape subquery — one definition for both fixtures."""
    return f"""
    SELECT {series_col},
           (b + 1) * {_PROM_STEP_MS} AS ts_ms,
           CAST(cum - CASE WHEN b >= {_PROM_RESET_BUCKET} THEN pre
                           ELSE 0 END AS BIGINT) AS value
    FROM (
        SELECT {series_col}, b, dc,
               SUM(dc) OVER (PARTITION BY {series_col} ORDER BY b) AS cum,
               SUM(CASE WHEN b < {_PROM_RESET_BUCKET} THEN dc ELSE 0 END)
                   OVER (PARTITION BY {series_col}) AS pre
        FROM ({per_sql})
    )
    """


_PROM_COUNTER_SQL = _cum_counter_with_reset_sql(
    f"""SELECT event_type,
              epoch_ms(ts) // {_PROM_STEP_MS} AS b,
              COUNT(*) AS dc
        FROM events GROUP BY 1, 2""",
    "event_type",
)

_PROM_GAUGE_SQL = f"""
    SELECT event_type,
           (b + 1) * {_PROM_STEP_MS} AS ts_ms,
           CAST(c AS BIGINT) AS value
    FROM (
        SELECT event_type,
               epoch_ms(ts) // {_PROM_STEP_MS} AS b,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    )
"""


def _cum_counter_with_reset(per_scrape: DataFrame, series_col: str) -> DataFrame:
    """Shared scrape-counter scaffolding: (series, b, dc) per-scrape
    deltas -> (series, ts_ms, value) CUMULATIVE counter samples with
    the mid-month process restart (counter re-zeroes at
    ``_PROM_RESET_BUCKET``).  One definition so the request-counter
    and bucket-counter fixtures (and their oracles) cannot drift."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(series_col)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(series_col)
    return per_scrape.select(
        series_col,
        ((F.col("b") + 1) * _PROM_STEP_MS).alias("ts_ms"),
        (
            F.sum("dc").over(w_cum)
            - F.when(
                F.col("b") >= _PROM_RESET_BUCKET,
                F.sum(
                    F.when(F.col("b") < _PROM_RESET_BUCKET, F.col("dc"))
                    .otherwise(F.lit(0))
                ).over(w_all),
            ).otherwise(F.lit(0))
        ).cast("long").alias("value"),
    )


def _prom_counter_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative request-counter scrapes per event_type with one
    mid-month reset — the ``zdm_*_request_duration_seconds_count``
    shape the proxy dashboard rates over."""
    counts = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_PROM_STEP_MS}").alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("dc"))
    )
    return _cum_counter_with_reset(counts, "event_type")


def _prom_gauge_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-scrape event counts as a gauge series (the go-runtime
    dashboard's deriv() input shape)."""
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(f"unix_millis(ts) div {_PROM_STEP_MS}").alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .select(
            "event_type",
            ((F.col("b") + 1) * _PROM_STEP_MS).alias("ts_ms"),
            "value",
        )
    )


def q_prom_counter_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the dashboard's throughput panels: irate = reset-adjusted delta
    # of the LAST TWO scrapes over their gap (per-second fixed point)
    from cassandra_data_migration_spark.streaming.promql import irate

    return irate(
        _prom_counter_samples(spark, sf_dir),
        ["event_type"],
        out_scale=_PROM_SCALE,
    )


def q_prom_rate_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PromQL rate() over a 10-day range spanning the counter reset:
    # reset-compensated increase × the documented boundary
    # extrapolation factor (incl. the counter zero-crossing cap),
    # all in exact rational arithmetic
    from cassandra_data_migration_spark.streaming.promql import (
        extrapolated_rate,
    )

    return extrapolated_rate(
        _prom_counter_samples(spark, sf_dir),
        ["event_type"],
        range_start_ms=_PROM_RANGE[0],
        range_end_ms=_PROM_RANGE[1],
        out_scale=_PROM_SCALE,
    )


def q_prom_gauge_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PromQL deriv(): per-series least-squares slope of a gauge,
    # timestamps re-based per series, sign factored out of the one
    # half-up division
    from cassandra_data_migration_spark.streaming.promql import deriv

    return deriv(
        _prom_gauge_samples(spark, sf_dir),
        ["event_type"],
        out_scale=_PROM_SCALE,
    )


def _prom_oracles() -> tuple[str, str, str]:
    from cassandra_data_migration_spark.streaming.promql import (
        deriv_sql,
        extrapolated_rate_sql,
        irate_sql,
    )

    return (
        irate_sql(_PROM_COUNTER_SQL, ["event_type"], out_scale=_PROM_SCALE),
        extrapolated_rate_sql(
            _PROM_COUNTER_SQL,
            ["event_type"],
            range_start_ms=_PROM_RANGE[0],
            range_end_ms=_PROM_RANGE[1],
            out_scale=_PROM_SCALE,
        ),
        deriv_sql(_PROM_GAUGE_SQL, ["event_type"], out_scale=_PROM_SCALE),
    )


_PROM_IRATE_SQL, _PROM_RATE_SQL, _PROM_DERIV_SQL = _prom_oracles()
QUERIES["prom_counter_irate"] = q_prom_counter_irate
ORACLES["prom_counter_irate"] = _PROM_IRATE_SQL
QUERIES["prom_rate_reconstruct"] = q_prom_rate_reconstruct
ORACLES["prom_rate_reconstruct"] = _PROM_RATE_SQL
QUERIES["prom_gauge_deriv"] = q_prom_gauge_deriv
ORACLES["prom_gauge_deriv"] = _PROM_DERIV_SQL


# --- round 7: CDM perfops sizing plan ----------------------------------------

# the lab's migration set with the CDM batching flag: lineitem is the
# one table with a clustering key (orderkey, linenumber), so batching
# buys something there; single-column-PK tables force batchSize 1
_SIZING_TABLES = ["customer", "orders", "lineitem", "events"]
_SIZING_PK_IS_PK = {
    "customer": True,
    "orders": True,
    "lineitem": False,
    "events": True,
}


def q_migration_sizing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # docs/04-cdm-approach.md:459-463 sizing rules as a report: rows /
    # compressed bytes from distributed footer reads, then numParts =
    # ceil(bytes/10MB), the batchSize auto rule, the fetchSize
    # large-row rule, and the ETA at the default 20K rows/s ratelimit
    from cassandra_data_migration_spark.plans.sizing import (
        migration_sizing_plan,
    )

    return migration_sizing_plan(
        spark,
        {t: f"{sf_dir}/{t}.parquet" for t in _SIZING_TABLES},
        pk_is_partition_key=_SIZING_PK_IS_PK,
    )


def _sizing_oracle() -> str:
    from cassandra_data_migration_spark.plans.sizing import (
        migration_sizing_plan_sql,
    )

    sf_dir = os.environ.get("CDM_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return migration_sizing_plan_sql(
        {t: f"{sf_dir}/{t}.parquet" for t in _SIZING_TABLES},
        pk_is_partition_key=_SIZING_PK_IS_PK,
    )


QUERIES["migration_sizing_plan"] = q_migration_sizing_plan
ORACLES["migration_sizing_plan"] = _sizing_oracle()


def _bucket_scrape_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-scrape cumulative ``_bucket{le=}`` counters from the events
    latencies — what a real scrape target exports every interval —
    with the same mid-month process restart as the request counters
    (the bucket counters reset together)."""
    les = _LATENCY_LES
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"unix_millis(ts) div {_PROM_STEP_MS}").alias("b"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("lat"),
    )
    aggs = [
        F.sum(F.when(F.col("lat") <= le, 1).otherwise(0))
        .cast("long")
        .alias(f"c{i}")
        for i, le in enumerate(les)
    ] + [F.count(F.lit(1)).cast("long").alias(f"c{len(les)}")]
    per_b = ev.groupBy("b").agg(*aggs)
    stack_args = ", ".join(
        [f"'{le}', c{i}" for i, le in enumerate(les)]
        + [f"'+Inf', c{len(les)}"]
    )
    long_form = per_b.select(
        "b",
        F.expr(f"stack({len(les) + 1}, {stack_args}) AS (le, dc)"),
    )
    return _cum_counter_with_reset(long_form, "le")


def q_histogram_quantile_rated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # exercise 6's ACTUAL panel formula: histogram_quantile(q,
    # increase(..._bucket[range])) — windowed reset-aware bucket
    # increases (integer-exact; rate's constant range division cancels
    # in the quantile ratio) through the same interpolation as
    # histogram_percentiles, over a range spanning the counter reset
    from cassandra_data_migration_spark.streaming.histograms import (
        windowed_histogram_quantiles,
    )

    return windowed_histogram_quantiles(
        _bucket_scrape_samples(spark, sf_dir),
        _LATENCY_LES,
        range_start_ms=_PROM_RANGE[0],
        range_end_ms=_PROM_RANGE[1],
    )


_BUCKET_SCRAPES_SQL_PARTS = [
    f"""SELECT '{le}' AS le, b,
          SUM(CASE WHEN lat <= {le} THEN 1 ELSE 0 END) AS dc
        FROM ev GROUP BY b"""
    for le in _LATENCY_LES
] + ["SELECT '+Inf' AS le, b, COUNT(*) AS dc FROM ev GROUP BY b"]

_BUCKET_SCRAPES_SQL = _cum_counter_with_reset_sql(
    f"""WITH ev AS (
            SELECT epoch_ms(ts) // {_PROM_STEP_MS} AS b,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS lat
            FROM events
        )
        {" UNION ALL ".join(_BUCKET_SCRAPES_SQL_PARTS)}""",
    "le",
)


def _rated_quantiles_oracle() -> str:
    from cassandra_data_migration_spark.streaming.histograms import (
        windowed_histogram_quantiles_sql,
    )

    return windowed_histogram_quantiles_sql(
        _BUCKET_SCRAPES_SQL,
        _LATENCY_LES,
        range_start_ms=_PROM_RANGE[0],
        range_end_ms=_PROM_RANGE[1],
    )


QUERIES["histogram_quantile_rated"] = q_histogram_quantile_rated
ORACLES["histogram_quantile_rated"] = _rated_quantiles_oracle()


def q_stream_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous irate: scrape slices fold into a <=2-rows-per-series
    # state (top-2 by ts is a max-like semilattice fold -> idempotent,
    # no batch gate); the live rate is the BATCH irate operator over
    # that state, so streamed == batch by construction and the batch
    # oracle checks it value for value
    import tempfile

    from cassandra_data_migration_spark.streaming.promql_stream import (
        irate_from_state,
        irate_state_stream,
    )

    # slice by scrape index (ts_ms is a multiple of the step, so mod
    # the BUCKET, not the raw ms) — adjacent scrapes land in different
    # micro-batches, exercising the cross-batch top-2 merge
    # persist: the slice loop below writes the SAME derived series
    # three times (events scan + cumulative-counter window each) — at
    # sf0.1 the triple recompute dominated the query's wall (the r8
    # +35% regression was this, not the extrapolation clamp)
    samples = (
        _prom_counter_samples(spark, sf_dir)
        .withColumn(
            "_s", F.pmod(F.expr(f"ts_ms DIV {_PROM_STEP_MS}"), F.lit(3))
        )
        .persist()
    )
    d = tempfile.mkdtemp(prefix="irate_stream_")
    src, st, ckpt = f"{d}/src", f"{d}/state", f"{d}/ckpt"
    for s in range(3):
        samples.filter(F.col("_s") == s).drop("_s").repartition(
            1
        ).write.mode("append").parquet(src)
    samples.unpersist()
    stream = (
        spark.readStream.schema("event_type string, ts_ms long, value long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = irate_state_stream(stream, st, ["event_type"], checkpoint=ckpt)
    await_or_raise(q, 300)
    return irate_from_state(
        spark, st, ["event_type"], out_scale=_PROM_SCALE
    )


QUERIES["stream_irate"] = q_stream_irate
ORACLES["stream_irate"] = _PROM_IRATE_SQL


# --- round 7: classifier evaluation (AUC / PR / calibration) ----------------

# score = the integer-exact quality score (the same expression the
# preference_pairs oracle proved engine-identical); weak label = the
# doc is English — the classifier-eval loop a quality-filter pipeline
# runs before trusting its filter
_EVAL_SCORED_SQL = """
    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           7 * least(CAST(len(string_split(text, ' ')) AS BIGINT)
                     * 15625, 1000000)
           + 3 * least(CAST(floor(5000000 *
                 CAST(len(list_filter(string_split(text, ' '),
                     t -> list_contains(
                         ['the','a','of','to','and','in','is'], t)))
                     AS BIGINT) * 1.0 /
                 CAST(len(string_split(text, ' ')) AS BIGINT))
                 AS BIGINT), 1000000) AS q
    FROM documents
"""
_EVAL_THRESHOLDS = [2_000_000, 4_000_000, 6_000_000, 8_000_000, 9_000_000]


def _eval_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_data_migration_spark.operators.text import quality_score_e6

    return quality_score_e6(load_table(spark, sf_dir, "documents")).select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.col("quality_e6x10").alias("q"),
    )


def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact Mann-Whitney AUC, average-rank ties; the folded bucketed
    # rank (no single-task sort, no per-row window), with the score
    # domain [0, 1e7] known so explicit bucket bounds make the whole
    # metric ONE scan of the scored frame
    from cassandra_data_migration_spark.operators.evaluation import roc_auc

    return roc_auc(
        _eval_scored(spark, sf_dir),
        "q",
        "y",
        score_bounds=[i * 10_000_000 // 64 for i in range(1, 64)],
    )


def q_classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # precision/recall/F1 at operating thresholds: one scan, broadcast
    # threshold list, exact integer counts + half-up ppm ratios
    from cassandra_data_migration_spark.operators.evaluation import (
        pr_at_thresholds,
    )

    return pr_at_thresholds(
        _eval_scored(spark, sf_dir), "q", "y", _EVAL_THRESHOLDS
    )


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reliability table over confidence bins (score e6x10 -> ppm);
    # ECE derives from Σ n_b·gap_b / N, every cell engine-exact
    from cassandra_data_migration_spark.operators.evaluation import (
        calibration_bins,
    )

    scored = _eval_scored(spark, sf_dir).withColumn(
        "conf_ppm", F.expr("q DIV 10")
    )
    return calibration_bins(scored, "conf_ppm", "y", n_bins=10)


def _eval_oracles() -> tuple[str, str, str]:
    from cassandra_data_migration_spark.operators.evaluation import (
        calibration_bins_sql,
        pr_at_thresholds_sql,
        roc_auc_sql,
    )

    return (
        roc_auc_sql(_EVAL_SCORED_SQL, "q", "y"),
        pr_at_thresholds_sql(_EVAL_SCORED_SQL, "q", "y", _EVAL_THRESHOLDS),
        calibration_bins_sql(_EVAL_SCORED_SQL, "q // 10", "y", n_bins=10),
    )


_EVAL_AUC_SQL, _EVAL_PR_SQL, _EVAL_CAL_SQL = _eval_oracles()
QUERIES["classifier_auc"] = q_classifier_auc
ORACLES["classifier_auc"] = _EVAL_AUC_SQL
QUERIES["classifier_pr_curve"] = q_classifier_pr_curve
ORACLES["classifier_pr_curve"] = _EVAL_PR_SQL
QUERIES["classifier_calibration"] = q_classifier_calibration
ORACLES["classifier_calibration"] = _EVAL_CAL_SQL


def q_classifier_auc_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    # classifier DRIFT view: is the quality filter as discriminative
    # on zh as on en?  Per-group AUC shuffles once on the group key —
    # label here = long document (>= 1000 chars), score = quality e6
    from cassandra_data_migration_spark.operators.evaluation import (
        grouped_roc_auc,
    )
    from cassandra_data_migration_spark.operators.text import quality_score_e6

    scored = quality_score_e6(load_table(spark, sf_dir, "documents")).select(
        "lang",
        F.col("quality_e6x10").alias("q"),
        F.when(F.col("n_chars") >= 1000, 1).otherwise(0).alias("y"),
    )
    return grouped_roc_auc(scored, "lang", "q", "y")


def _grouped_auc_oracle() -> str:
    from cassandra_data_migration_spark.operators.evaluation import (
        grouped_roc_auc_sql,
    )

    scored = """
        SELECT lang,
               CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END AS y,
               7 * least(CAST(len(string_split(text, ' ')) AS BIGINT)
                         * 15625, 1000000)
               + 3 * least(CAST(floor(5000000 *
                     CAST(len(list_filter(string_split(text, ' '),
                         t -> list_contains(
                             ['the','a','of','to','and','in','is'], t)))
                         AS BIGINT) * 1.0 /
                     CAST(len(string_split(text, ' ')) AS BIGINT))
                     AS BIGINT), 1000000) AS q
        FROM documents
    """
    return grouped_roc_auc_sql(scored, "lang", "q", "y")


QUERIES["classifier_auc_by_lang"] = q_classifier_auc_by_lang
ORACLES["classifier_auc_by_lang"] = _grouped_auc_oracle()


# --- round 7: training-shard export manifest ---------------------------------


def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the pipeline end-cap: seeded global shuffle (md5 order, two-phase
    # bucketed rank — no global sort) -> round-robin shard assignment
    # (sizes differ by <= 1 at any corpus size) -> per-shard manifest
    # (rows, token sum, order-independent content digest)
    from cassandra_data_migration_spark.operators.shards import (
        training_shard_manifest,
    )
    from cassandra_data_migration_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", token_count("text").cast("long")
    )
    return training_shard_manifest(
        docs, "doc_id", "n_tok", n_shards=8, seed="r7"
    )


def _training_shards_oracle() -> str:
    from cassandra_data_migration_spark.operators.shards import (
        training_shard_manifest_sql,
    )

    return training_shard_manifest_sql(
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tok"
        " FROM documents",
        "doc_id",
        "n_tok",
        n_shards=8,
        seed="r7",
    )


QUERIES["training_shards"] = q_training_shards
ORACLES["training_shards"] = _training_shards_oracle()


def q_training_shards_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token-BALANCED variant: heavy-tailed doc lengths dealt snake
    # over the token-descending rank (LPT-flavored), so per-shard
    # token sums stay within one block's spread while doc counts
    # still differ by <= 1
    from cassandra_data_migration_spark.operators.shards import (
        training_shard_manifest,
    )
    from cassandra_data_migration_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", token_count("text").cast("long")
    )
    return training_shard_manifest(
        docs, "doc_id", "n_tok", n_shards=8, seed="r7",
        balance="tokens",
    )


def _training_shards_balanced_oracle() -> str:
    from cassandra_data_migration_spark.operators.shards import (
        training_shard_manifest_sql,
    )

    return training_shard_manifest_sql(
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tok"
        " FROM documents",
        "doc_id",
        "n_tok",
        n_shards=8,
        seed="r7",
        balance="tokens",
    )


QUERIES["training_shards_balanced"] = q_training_shards_balanced
ORACLES["training_shards_balanced"] = _training_shards_balanced_oracle()




register_queries(globals())
__all__ = export_all(globals())
