"""Prometheus histogram semantics: cumulative ``le`` buckets and the
``histogram_quantile`` reconstruction.

The reference's monitoring stack derives latency percentiles from
CUMULATIVE bucket counters — Grafana panels run
``histogram_quantile(0.99, rate(..._duration_seconds_bucket[5m]))``
over ``_bucket{le=...}`` series (docs/05-zdm-approach.md:592-598;
lab/exercises/06-validation-monitoring.md:455-497).  The engine's
other percentile surface (``percentile_approx`` over raw latencies)
answers a different question: it needs the raw stream.  These
operators implement the bucket contract itself — what a scrape
target EXPORTS and what a dashboard RECONSTRUCTS — so the engine can
stand on either side of a Prometheus pipeline.

Everything is exact integer arithmetic (counts, fixed-point bounds,
half-up rational rounding via ``(2n + d) DIV (2d)``), so the DuckDB
oracles match bit-for-bit and no cross-engine float drift exists.

Scale shape: the bucket table is O(buckets) rows built by ONE
scan-side bucket-index projection + one tiny groupBy; every
downstream step (cumsum, interpolation) runs over that O(buckets)
frame.  At 100 TB the only full-data cost is the single scan — the
same shape as any counter export.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def _bucket_index(value: Column, les: list[int]) -> Column:
    """Index of the first bucket with ``value <= le`` (Prometheus
    ``le`` is an INCLUSIVE upper bound); len(les) = the +Inf
    overflow bucket.  A when-chain over literals — codegen'd, no
    per-row array allocation."""
    expr = F.lit(len(les))
    for i in range(len(les) - 1, -1, -1):
        expr = F.when(value <= F.lit(les[i]), F.lit(i)).otherwise(expr)
    return expr


def cumulative_histogram(
    df: DataFrame, value_col: str, les: list[int]
) -> DataFrame:
    """(le, bucket_count, cumulative_count) — the ``_bucket{le=}``
    series plus the per-bucket breakdown; the +Inf row's cumulative
    count is the series ``_count``.  ``le`` is rendered as a string
    ('+Inf' for the overflow bucket) exactly as the exposition format
    prints it.  Empty buckets appear with count 0 — a scrape target
    must export every configured bucket every scrape."""
    if les != sorted(les) or len(set(les)) != len(les):
        raise ValueError("les must be strictly increasing")
    spark = df.sparkSession
    counted = (
        df.select(_bucket_index(F.col(value_col), les).alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )
    all_buckets = spark.createDataFrame(
        [(i, str(les[i]) if i < len(les) else "+Inf") for i in range(len(les) + 1)],
        "_b int, le string",
    )
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    return (
        all_buckets.join(counted, "_b", "left")
        .withColumn(
            "bucket_count", F.coalesce(F.col("bucket_count"), F.lit(0))
        )
        .withColumn("cumulative_count", F.sum("bucket_count").over(w))
        .select("le", "bucket_count", "cumulative_count")
        # the window runs over O(buckets) rows — a driver-size frame,
        # not a data-size sort
    )


def cumulative_histogram_sql(
    table_sql: str, value_expr: str, les: list[int]
) -> str:
    """DuckDB twin of :func:`cumulative_histogram`."""
    idx = str(len(les))
    for i in range(len(les) - 1, -1, -1):
        idx = f"CASE WHEN {value_expr} <= {les[i]} THEN {i} ELSE {idx} END"
    le_rows = ", ".join(
        f"({i}, '{les[i] if i < len(les) else '+Inf'}')"
        for i in range(len(les) + 1)
    )
    return f"""
        WITH counted AS (
            SELECT {idx} AS b, COUNT(*) AS bucket_count
            FROM ({table_sql}) GROUP BY 1
        ),
        shell(b, le) AS (VALUES {le_rows})
        SELECT s.le,
               CAST(COALESCE(c.bucket_count, 0) AS BIGINT) AS bucket_count,
               CAST(SUM(COALESCE(c.bucket_count, 0))
                   OVER (ORDER BY s.b) AS BIGINT) AS cumulative_count
        FROM shell s LEFT JOIN counted c ON s.b = c.b
    """


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    les: list[int],
    q_ppm: list[int] = (500_000, 950_000, 990_000),
    out_scale: int = 10_000,
) -> DataFrame:
    """(q_ppm, value_fp) — PromQL ``histogram_quantile`` over the
    cumulative buckets of ``df[value_col]``: rank = q·count lands in
    the first bucket whose cumulative count reaches it, then linear
    interpolation between the bucket's bounds (lower bound 0 for the
    first bucket; the +Inf bucket clamps to the last finite ``le`` —
    the documented PromQL contract).  ``value_fp`` is the
    interpolated value in ``out_scale`` fixed point, computed as an
    exact rational with half-up rounding — bit-identical across
    engines and to the DuckDB oracle.

    This is deliberately NOT a percentile of the raw data: it is what
    a Grafana board shows given only bucket counters, including the
    bucketing error — reconstructing the board's number is the point.
    """
    hist = cumulative_histogram(df, value_col, les)
    return quantiles_from_bucket_counts(
        df.sparkSession, hist, les, q_ppm, out_scale
    )


def quantiles_from_bucket_counts(
    spark,
    hist: DataFrame,
    les: list[int],
    q_ppm: list[int] = (500_000, 950_000, 990_000),
    out_scale: int = 10_000,
) -> DataFrame:
    """The interpolation half of ``histogram_quantile``, over an
    already-counted cumulative frame ``hist`` with columns
    (le string incl. '+Inf', cumulative_count long) — the shape a
    scrape target exports and the shape a windowed bucket-increase
    produces (``windowed_histogram_quantiles``)."""
    # join positions back on the le string (le strings sort wrong
    # lexically, so ordering rides the explicit position table)
    le_pos = spark.createDataFrame(
        [(str(les[i]), i) for i in range(len(les))] + [("+Inf", len(les))],
        "le string, _b int",
    )
    run = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    base = (
        hist.join(le_pos, "le")
        # Prometheus ensureMonotonic: windowed per-le increases can be
        # non-monotone (per-le counter resets land at different scrape
        # boundaries), so clamp each cumulative count to the running
        # max before bucket selection — promql/quantile.go does the
        # same repair before interpolating
        .withColumn("cumulative_count", F.max("cumulative_count").over(run))
        .withColumn("_lo_le", F.lag("le", 1).over(Window.orderBy("_b")))
        .withColumn(
            "_cum_lo",
            F.coalesce(
                F.lag("cumulative_count", 1).over(Window.orderBy("_b")),
                F.lit(0),
            ),
        )
    )
    # total is the +Inf bucket's (repaired) count — the Prometheus
    # contract (histogramQuantile uses buckets[len-1].count, never the
    # max over finite buckets)
    total = (
        base.filter(F.col("le") == "+Inf")
        .agg(F.max("cumulative_count"))
        .collect()[0][0]
        or 0
    )
    if total == 0:
        # nothing observed (empty input, or a window with no rateable
        # scrape pair): PromQL yields NaN here — the relational
        # analogue is NO row, never a divide-by-zero crash
        return spark.createDataFrame([], "q_ppm long, value_fp long")
    last_finite = les[-1]
    qs = spark.createDataFrame([(q,) for q in q_ppm], "q_ppm long")
    # R = q·count in micro-counts; the winning bucket is the first
    # whose cumulative count (scaled to micro-counts) reaches R
    hit = (
        # broadcast the O(quantiles) side explicitly: a plain crossJoin
        # plans as CartesianProduct (both sides shuffled); broadcasting
        # 3 rows against the O(buckets) frame is the right shape
        base.crossJoin(F.broadcast(qs))
        .withColumn("_r", F.col("q_ppm") * F.lit(total))
        .filter(F.col("cumulative_count") * F.lit(PPM) >= F.col("_r"))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("q_ppm").orderBy("_b")
            ),
        )
        .filter(F.col("_rk") == 1)
    )
    d = F.lit(out_scale).cast("decimal(38,0)")
    lo = F.coalesce(F.col("_lo_le").cast("decimal(38,0)"), F.lit(0))
    hi = F.col("le").cast("decimal(38,0)")  # NULL for +Inf
    in_b = (F.col("cumulative_count") - F.col("_cum_lo")).cast("decimal(38,0)")
    num = (
        (hi - lo)
        * d
        * (F.col("_r").cast("decimal(38,0)") - F.col("_cum_lo").cast("decimal(38,0)") * F.lit(PPM))
    )
    den = in_b * F.lit(PPM).cast("decimal(38,0)")
    # half-up via integral DIV of DECIMAL(38) operands (promql.py /
    # evaluation.py pattern) — DECIMAL `/` rounds HALF_UP to scale 6
    # BEFORE a floor(), which is off-by-one vs the oracle's exact `//`
    # when the true quotient sits within 5e-7 below an integer
    interp = lo * d + F.expr(
        "CAST((CAST(2 AS DECIMAL(38,0)) * _num + _den) div "
        "(CAST(2 AS DECIMAL(38,0)) * _den) AS DECIMAL(38,0))"
    )
    return (
        hit.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            "q_ppm",
            F.when(F.col("le") == "+Inf", F.lit(last_finite * out_scale))
            .otherwise(interp.cast("long"))
            .cast("long")
            .alias("value_fp"),
        )
    )


def windowed_bucket_increase(
    samples: DataFrame,
    les: list[int],
    range_start_ms: int,
    range_end_ms: int,
    le_col: str = "le",
    ts_col: str = "ts_ms",
    cum_col: str = "value",
) -> DataFrame:
    """Per-``le`` EXACT increase of cumulative ``_bucket{le=}``
    counters over the left-open range ``(start, end]`` — the
    ``increase(..._bucket[5m])`` a dashboard feeds into
    ``histogram_quantile``.  Reset compensation is the counter rule
    (streaming/promql): a dropped value means the scrape target
    restarted and contributes its post-reset count.  Buckets with no
    in-range samples (or one) report 0 — a board cannot rate a series
    it cannot see twice.  Output: (le, cumulative_count), one row per
    CONFIGURED bucket incl. '+Inf', integer-exact."""
    from cassandra_data_migration_spark.streaming.promql import (
        _range_stats,
    )

    spark = samples.sparkSession
    stats = _range_stats(
        samples, [le_col], ts_col, cum_col, range_start_ms, range_end_ms
    ).filter(F.col("_n") >= 2)
    shell = spark.createDataFrame(
        [(str(le),) for le in les] + [("+Inf",)], f"{le_col} string"
    )
    return shell.join(
        stats.select(le_col, F.col("_d").alias("cumulative_count")),
        le_col,
        "left",
    ).withColumn(
        "cumulative_count",
        F.coalesce(F.col("cumulative_count"), F.lit(0)).cast("long"),
    )


def windowed_histogram_quantiles(
    samples: DataFrame,
    les: list[int],
    range_start_ms: int,
    range_end_ms: int,
    q_ppm: list[int] = (500_000, 950_000, 990_000),
    out_scale: int = 10_000,
    le_col: str = "le",
    ts_col: str = "ts_ms",
    cum_col: str = "value",
) -> DataFrame:
    """``histogram_quantile(q, increase(..._bucket[range]))`` — the
    exact formula exercise 6's latency panels run
    (lab/exercises/06-validation-monitoring.md:455-497; PromQL rate vs
    increase differ only by the constant range division, which the
    quantile ratio cancels).  Windowed reset-aware bucket increases
    (integer-exact) feed the same interpolation as
    :func:`histogram_quantiles`."""
    spark = samples.sparkSession
    inc = windowed_bucket_increase(
        samples, les, range_start_ms, range_end_ms, le_col, ts_col, cum_col
    )
    # the increase frame is O(buckets): materialize it once so the
    # interpolation's total-collect and the returned plan don't each
    # re-run the window pass over the (potentially huge) samples
    inc = spark.createDataFrame(
        inc.collect(), "le string, cumulative_count long"
    )
    return quantiles_from_bucket_counts(spark, inc, les, q_ppm, out_scale)


def histogram_quantiles_sql(
    table_sql: str,
    value_expr: str,
    les: list[int],
    q_ppm: list[int] = (500_000, 950_000, 990_000),
    out_scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`histogram_quantiles` — same buckets, same
    exact rational interpolation."""
    hist = cumulative_histogram_sql(table_sql, value_expr, les)
    return _quantiles_sql_over_hist(hist, les, q_ppm, out_scale)


def windowed_histogram_quantiles_sql(
    samples_sql: str,
    les: list[int],
    range_start_ms: int,
    range_end_ms: int,
    q_ppm: list[int] = (500_000, 950_000, 990_000),
    out_scale: int = 10_000,
    le_col: str = "le",
    ts_col: str = "ts_ms",
    cum_col: str = "value",
) -> str:
    """DuckDB twin of :func:`windowed_histogram_quantiles`."""
    from cassandra_data_migration_spark.streaming.promql import (
        _range_stats_sql,
    )

    stats = _range_stats_sql(
        samples_sql, [le_col], ts_col, cum_col, range_start_ms, range_end_ms
    )
    shell_rows = ", ".join(f"('{le}')" for le in les) + ", ('+Inf')"
    hist = f"""
        {stats}
        SELECT s.{le_col} AS le,
               CAST(COALESCE(t.d, 0) AS BIGINT) AS cumulative_count
        FROM (VALUES {shell_rows}) AS s({le_col})
        LEFT JOIN (SELECT {le_col}, d FROM stats WHERE n >= 2) t
        ON s.{le_col} = t.{le_col}
    """
    return _quantiles_sql_over_hist(hist, les, q_ppm, out_scale)


def _quantiles_sql_over_hist(
    hist: str,
    les: list[int],
    q_ppm: list[int] = (500_000, 950_000, 990_000),
    out_scale: int = 10_000,
) -> str:
    """Shared interpolation SQL over a (le, cumulative_count) frame."""
    le_rows = ", ".join(
        f"('{les[i]}', {i})" for i in range(len(les))
    ) + f", ('+Inf', {len(les)})"
    q_rows = ", ".join(f"({q})" for q in q_ppm)
    return f"""
        WITH hist AS ({hist}),
        le_pos(le, b) AS (VALUES {le_rows}),
        mono AS (
            -- Prometheus ensureMonotonic: clamp each cumulative count
            -- to the running max (mirrors the Spark side exactly)
            SELECT h.le, p.b,
                   MAX(h.cumulative_count)
                       OVER (ORDER BY p.b ROWS UNBOUNDED PRECEDING)
                       AS cumulative_count
            FROM hist h JOIN le_pos p ON h.le = p.le
        ),
        base AS (
            SELECT le, cumulative_count, b,
                   LAG(le) OVER (ORDER BY b) AS lo_le,
                   COALESCE(LAG(cumulative_count) OVER (ORDER BY b), 0)
                       AS cum_lo
            FROM mono
        ),
        -- total is the +Inf bucket's (repaired) count
        tot AS (SELECT cumulative_count AS n FROM base WHERE le = '+Inf'),
        qs(q_ppm) AS (VALUES {q_rows}),
        hit AS (
            SELECT q.q_ppm, b.le, b.b, b.lo_le, b.cum_lo,
                   b.cumulative_count,
                   q.q_ppm * t.n AS r,
                   ROW_NUMBER() OVER (PARTITION BY q.q_ppm ORDER BY b.b)
                       AS rk
            FROM qs q, base b, tot t
            -- t.n > 0 mirrors the engine's empty-result contract for
            -- an unobserved histogram (PromQL NaN => no row)
            WHERE t.n > 0 AND b.cumulative_count * {PPM} >= q.q_ppm * t.n
        )
        SELECT q_ppm,
               CASE WHEN le = '+Inf'
                    THEN CAST({les[-1]} AS HUGEINT) * {out_scale}
                    ELSE CAST(COALESCE(CAST(lo_le AS HUGEINT), 0)
                              * {out_scale}
                         + (2 * (CAST(le AS HUGEINT)
                                 - COALESCE(CAST(lo_le AS HUGEINT), 0))
                              * {out_scale}
                              * (CAST(r AS HUGEINT) - CAST(cum_lo AS HUGEINT) * {PPM})
                            + (cumulative_count - cum_lo) * CAST({PPM} AS HUGEINT))
                           // (2 * (cumulative_count - cum_lo)
                               * CAST({PPM} AS HUGEINT))
                         AS HUGEINT) END::BIGINT AS value_fp
        FROM hit WHERE rk = 1
    """
