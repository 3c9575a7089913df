"""PromQL counter/gauge functions over scraped sample tables.

The reference's Grafana boards are built almost entirely from three
PromQL function families (lab/monitoring/grafana-dashboards/
zdm-proxy-dashboard.json, zdm-go-runtime-metrics.json):
``irate(..._count[range])`` for request throughput,
``rate``/``increase`` for counters, and ``deriv`` for gauge trends —
plus ``histogram_quantile`` (streaming/histograms.py).  These
operators implement the evaluation side of that contract over a
samples table ``(series labels..., ts_ms, value)`` — what the board
COMPUTES from what the scrape target exported — so the engine can
replay a dashboard panel as a DataFrame query.

Counter semantics follow the Prometheus contract (public docs and
promql/functions.go):

- **Reset compensation**: a counter that DROPS between adjacent
  samples was restarted; the post-reset value itself is the increase
  contribution (``v_cur`` rather than ``v_cur - v_prev``).
- **irate**: the reset-adjusted delta of the LAST TWO samples divided
  by their time gap — the spiky instant rate the proxy dashboard's
  throughput panels use.
- **rate / increase**: reset-adjusted increase over a left-open range
  ``(start, end]``, multiplied by the documented boundary
  extrapolation factor: extend the sampled interval toward each
  boundary by the actual gap when the gap is under 1.1× the average
  sample spacing, else by half the average spacing; a counter's
  start extension is additionally capped at its zero crossing
  (``durationToZero = S·v1/D``), applied AFTER the threshold clamp —
  the promql/functions.go (>= 2.50) evaluation order, where the
  clamped durationToStart takes the min with durationToZero.
  ``rate`` divides by the range in seconds.

Everything is exact integer/rational arithmetic: durations stay in
integer milliseconds, the extrapolation rationals are carried as
numerators over one common denominator ``L = 2·(n-1)·max(D,1)``, and
the single final division is a half-up integral ``DIV`` of
non-negative DECIMAL(38) operands — bit-identical in Spark and the
DuckDB oracle twins (no float ever appears).

Scale shape: one window pass per series for the adjacent-sample
deltas (shuffle keyed on the series labels — series count is the
cardinality, never sample count), then one map-combined groupBy to
O(series) rows; all extrapolation math runs on that tiny frame.
Sample tables are append-only scrapes, so at 100 TB the window pass
partitions freely by series and time — the same shape as the
windowed-rate operators (operators/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MS_PER_S = 1000


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _adj_delta(value: Column, prev: Column) -> Column:
    """Reset-adjusted increase contribution of one sample given its
    predecessor: v - prev normally, v after a reset, 0 for the first
    sample of a series."""
    return (
        F.when(prev.isNull(), F.lit(0))
        .when(value >= prev, value - prev)
        .otherwise(value)
    )


def _dedup_ts(
    df: DataFrame, series_cols: list[str], ts_col: str, value_col: str
) -> DataFrame:
    """Collapse same-timestamp duplicates to MAX(value) per series —
    two scraper replicas reporting the same instant must not abort the
    query with a zero-width interval (ANSI divide-by-zero), and MAX
    makes the collapse deterministic.  Also guarantees every adjacent
    pair downstream has a strictly positive time gap."""
    return df.groupBy(*series_cols, ts_col).agg(
        F.max(value_col).alias(value_col)
    )


def irate(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    out_scale: int = 10_000,
) -> DataFrame:
    """Per-series instant rate: reset-adjusted delta of the last two
    samples over their gap, in ``out_scale`` fixed-point per-second
    units.  Same-timestamp duplicates collapse to MAX(value) first
    (zero-width intervals would divide by zero); series with fewer
    than two DISTINCT timestamps produce no row (the PromQL behavior).
    Output: (series_cols..., irate_fp)."""
    w = Window.partitionBy(*series_cols).orderBy(F.desc(ts_col))
    last2 = (
        _dedup_ts(df, series_cols, ts_col, value_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
    )
    g = last2.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.max(ts_col).alias("_t2"),
        F.min(ts_col).alias("_t1"),
        F.max_by(value_col, ts_col).alias("_v2"),
        F.min_by(value_col, ts_col).alias("_v1"),
    )
    delta = _adj_delta(F.col("_v2"), F.col("_v1"))
    num = _dec(delta) * F.lit(MS_PER_S * out_scale).cast("decimal(38,0)")
    den = _dec(F.col("_t2") - F.col("_t1"))
    return (
        g.filter(F.col("_n") == 2)
        .withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn(
            "irate_fp",
            F.expr(
                "CAST((CAST(2 AS DECIMAL(38,0)) * _num + _den) div "
                "(CAST(2 AS DECIMAL(38,0)) * _den) AS BIGINT)"
            ),
        )
        .select(*series_cols, "irate_fp")
    )


def _range_stats(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    range_start_ms: int,
    range_end_ms: int,
) -> DataFrame:
    """Per-series (n, t1, tN, v1, D) over the left-open range
    (start, end] with reset-adjusted increase D.  The lag window runs
    over the RANGE-FILTERED samples — Prometheus only sees what the
    selector returns."""
    in_range = _dedup_ts(
        df.filter(
            (F.col(ts_col) > F.lit(range_start_ms))
            & (F.col(ts_col) <= F.lit(range_end_ms))
        ),
        series_cols,
        ts_col,
        value_col,
    )
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    with_prev = in_range.withColumn("_prev", F.lag(value_col).over(w))
    return with_prev.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(ts_col).alias("_t1"),
        F.max(ts_col).alias("_tn"),
        F.min_by(value_col, ts_col).alias("_v1"),
        F.sum(_adj_delta(F.col(value_col), F.col("_prev"))).alias("_d"),
    )


def extrapolated_rate(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    range_start_ms: int = 0,
    range_end_ms: int = 0,
    per_second: bool = True,
    out_scale: int = 10_000,
) -> DataFrame:
    """PromQL ``rate`` (per_second) / ``increase`` over counters: the
    reset-adjusted in-range increase times the boundary extrapolation
    factor, computed exactly (module docstring).  Output:
    (series_cols..., rate_fp | increase_fp).

    Rational bookkeeping: candidate boundary extensions are ds (the
    real gap), S/(2(n-1)) (half the average spacing) and S·v1/D (the
    zero crossing), all carried as numerators over
    L = 2·(n-1)·max(D,1); the threshold test "gap ≥ 1.1·avg spacing"
    cross-multiplies to 5·ds_num ≥ 11·S·max(D,1).
    """
    if range_end_ms <= range_start_ms:
        raise ValueError("range_end_ms must exceed range_start_ms")
    g = _range_stats(
        df, series_cols, ts_col, value_col, range_start_ms, range_end_ms
    ).filter(F.col("_n") >= 2)

    n1 = F.col("_n") - 1
    s = F.col("_tn") - F.col("_t1")
    ds = F.col("_t1") - F.lit(range_start_ms)
    de = F.lit(range_end_ms) - F.col("_tn")
    d = F.col("_d")
    dmax = F.greatest(d, F.lit(1))
    # common denominator for all extension rationals
    big = g.withColumn("_l", _dec(F.lit(2)) * _dec(n1) * _dec(dmax))
    ds_num = _dec(ds) * F.col("_l")
    de_num = _dec(de) * F.col("_l")
    # threshold FIRST (promql/functions.go >= 2.50 order):
    # ext >= 11S/(10(n-1)) <=> 5·ext_num >= 11·S·dmax; beyond it
    # extend by HALF the average spacing: num = S·dmax
    half_avg_num = _dec(s) * _dec(dmax)
    thresh = _dec(F.lit(11)) * half_avg_num
    ds_num = F.when(
        _dec(F.lit(5)) * ds_num >= thresh, half_avg_num
    ).otherwise(ds_num)
    de_num = F.when(
        _dec(F.lit(5)) * de_num >= thresh, half_avg_num
    ).otherwise(de_num)
    # THEN the counter zero-cap takes the min with the (possibly
    # threshold-clamped) start extension: durationToZero = S·v1/D ->
    # numerator S·v1·2(n-1) over L (valid only when D > 0, i.e.
    # dmax == D; v1 >= 0 holds for counters)
    dz_num = _dec(s) * _dec(F.col("_v1")) * _dec(F.lit(2)) * _dec(n1)
    ds_num = F.when(
        (d > 0) & (F.col("_v1") >= 0) & (dz_num < ds_num), dz_num
    ).otherwise(ds_num)

    factor_num = _dec(s) * F.col("_l") + ds_num + de_num
    out_num = _dec(d) * factor_num * _dec(F.lit(out_scale))
    out_den = _dec(s) * F.col("_l")
    name = "rate_fp"
    if per_second:
        out_num = out_num * _dec(F.lit(MS_PER_S))
        out_den = out_den * _dec(F.lit(range_end_ms - range_start_ms))
    else:
        name = "increase_fp"
    return (
        big.withColumn("_on", out_num)
        .withColumn("_od", out_den)
        .withColumn(
            name,
            F.expr(
                "CAST((CAST(2 AS DECIMAL(38,0)) * _on + _od) div "
                "(CAST(2 AS DECIMAL(38,0)) * _od) AS BIGINT)"
            ),
        )
        .select(*series_cols, name)
    )


def deriv(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    out_scale: int = 10_000,
) -> DataFrame:
    """PromQL ``deriv``: per-series least-squares slope of a GAUGE, in
    ``out_scale`` fixed-point per-second units.  Timestamps are
    re-based to the series' first sample before the regression (the
    slope is shift-invariant; the re-base keeps every product inside
    DECIMAL(38) at any epoch).  slope = (nΣtv − ΣtΣv)/(nΣt² − (Σt)²)
    per millisecond; the sign is factored out so the one final
    half-up DIV sees non-negative operands on both engines.
    Output: (series_cols..., deriv_fp)."""
    w = Window.partitionBy(*series_cols)
    based = df.withColumn(
        "_t0", F.col(ts_col) - F.min(ts_col).over(w)
    )
    g = (
        based.groupBy(*series_cols)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_t0").alias("_st"),
            F.sum(value_col).alias("_sv"),
            F.sum(_dec(F.col("_t0")) * _dec(F.col(value_col))).alias("_stv"),
            F.sum(_dec(F.col("_t0")) * _dec(F.col("_t0"))).alias("_stt"),
        )
        .filter(F.col("_n") >= 2)
    )
    num = _dec(F.col("_n")) * F.col("_stv") - _dec(F.col("_st")) * _dec(
        F.col("_sv")
    )
    den = _dec(F.col("_n")) * F.col("_stt") - _dec(F.col("_st")) * _dec(
        F.col("_st")
    )
    scaled = F.abs(num) * _dec(F.lit(MS_PER_S * out_scale))
    return (
        g.withColumn("_sgn", F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)))
        .withColumn("_an", scaled)
        .withColumn("_ad", den)
        .filter(F.col("_ad") > 0)  # degenerate: all samples at one ts
        .withColumn(
            "deriv_fp",
            F.col("_sgn")
            * F.expr(
                "CAST((CAST(2 AS DECIMAL(38,0)) * _an + _ad) div "
                "(CAST(2 AS DECIMAL(38,0)) * _ad) AS BIGINT)"
            ),
        )
        .select(*series_cols, "deriv_fp")
    )


# --- DuckDB oracle twins ----------------------------------------------------


def _series_csv(series_cols: list[str]) -> str:
    return ", ".join(series_cols)


def irate_sql(
    table_sql: str,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    out_scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`irate`."""
    s = _series_csv(series_cols)
    return f"""
        WITH dedup AS (
            SELECT {s}, {ts_col} AS t, MAX({value_col}) AS v
            FROM ({table_sql}) GROUP BY {s}, {ts_col}
        ),
        ranked AS (
            SELECT {s}, t, v,
                   ROW_NUMBER() OVER (
                       PARTITION BY {s} ORDER BY t DESC) AS rn
            FROM dedup
        ),
        last2 AS (
            SELECT {s},
                   COUNT(*) AS n,
                   MAX(t) AS t2, MIN(t) AS t1,
                   MAX_BY(v, t) AS v2, MIN_BY(v, t) AS v1
            FROM ranked WHERE rn <= 2 GROUP BY {s}
        )
        SELECT {s},
               CAST((2 * (CASE WHEN v2 >= v1 THEN v2 - v1 ELSE v2 END)
                         ::HUGEINT * {MS_PER_S * out_scale}
                     + (t2 - t1))
                    // (2 * (t2 - t1)::HUGEINT) AS BIGINT) AS irate_fp
        FROM last2 WHERE n = 2
    """


def _range_stats_sql(
    table_sql: str,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    range_start_ms: int,
    range_end_ms: int,
) -> str:
    s = _series_csv(series_cols)
    return f"""
        WITH in_range AS (
            SELECT {s}, {ts_col} AS t, MAX({value_col}) AS v
            FROM ({table_sql})
            WHERE {ts_col} > {range_start_ms} AND {ts_col} <= {range_end_ms}
            GROUP BY {s}, {ts_col}
        ),
        with_prev AS (
            SELECT {s}, t, v,
                   LAG(v) OVER (PARTITION BY {s} ORDER BY t) AS pv
            FROM in_range
        ),
        stats AS (
            SELECT {s},
                   COUNT(*) AS n,
                   MIN(t) AS t1, MAX(t) AS tn,
                   MIN_BY(v, t) AS v1,
                   SUM(CASE WHEN pv IS NULL THEN 0
                            WHEN v >= pv THEN v - pv
                            ELSE v END)::HUGEINT AS d
            FROM with_prev GROUP BY {s}
        )
    """


def extrapolated_rate_sql(
    table_sql: str,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    range_start_ms: int = 0,
    range_end_ms: int = 0,
    per_second: bool = True,
    out_scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`extrapolated_rate` — identical rational
    bookkeeping over L = 2·(n-1)·max(D,1)."""
    s = _series_csv(series_cols)
    stats = _range_stats_sql(
        table_sql, series_cols, ts_col, value_col,
        range_start_ms, range_end_ms,
    )
    name = "rate_fp" if per_second else "increase_fp"
    extra_num = f"* {MS_PER_S}" if per_second else ""
    extra_den = (
        f"* {range_end_ms - range_start_ms}::HUGEINT" if per_second else ""
    )
    return f"""
        {stats},
        prep AS (
            SELECT {s}, n, t1, tn, v1, d,
                   (tn - t1)::HUGEINT AS sp,
                   (t1 - {range_start_ms})::HUGEINT AS ds,
                   ({range_end_ms} - tn)::HUGEINT AS de,
                   GREATEST(d, 1)::HUGEINT AS dmax,
                   (n - 1)::HUGEINT AS n1
            FROM stats WHERE n >= 2
        ),
        nums AS (
            SELECT *,
                   2 * n1 * dmax AS l,
                   ds * 2 * n1 * dmax AS ds_num0,
                   de * 2 * n1 * dmax AS de_num0,
                   sp * v1 * 2 * n1 AS dz_num,
                   sp * dmax AS half_avg_num
            FROM prep
        ),
        clamped AS (
            SELECT *,
                   CASE WHEN 5 * ds_num0 >= 11 * half_avg_num
                        THEN half_avg_num ELSE ds_num0 END AS ds_num1,
                   CASE WHEN 5 * de_num0 >= 11 * half_avg_num
                        THEN half_avg_num ELSE de_num0 END AS de_num
            FROM nums
        ),
        ext AS (
            SELECT *,
                   CASE WHEN d > 0 AND v1 >= 0 AND dz_num < ds_num1
                        THEN dz_num ELSE ds_num1 END AS ds_num
            FROM clamped
        )
        SELECT {s},
               CAST((2 * (d * (sp * l + ds_num + de_num)
                          * {out_scale} {extra_num})
                     + (sp * l {extra_den}))
                    // (2 * (sp * l {extra_den})) AS BIGINT) AS {name}
        FROM ext
    """


def deriv_sql(
    table_sql: str,
    series_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    out_scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`deriv`."""
    s = _series_csv(series_cols)
    return f"""
        WITH based AS (
            SELECT {s}, {value_col} AS v,
                   ({ts_col} - MIN({ts_col}) OVER (PARTITION BY {s}))
                       ::HUGEINT AS t0
            FROM ({table_sql})
        ),
        g AS (
            SELECT {s},
                   COUNT(*)::HUGEINT AS n,
                   SUM(t0)::HUGEINT AS st,
                   SUM(v)::HUGEINT AS sv,
                   SUM(t0 * v::HUGEINT) AS stv,
                   SUM(t0 * t0) AS stt
            FROM based GROUP BY {s} HAVING COUNT(*) >= 2
        ),
        nd AS (
            SELECT {s},
                   n * stv - st * sv AS num,
                   n * stt - st * st AS den
            FROM g
        )
        SELECT {s},
               CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                    * ((2 * ABS(num) * {MS_PER_S * out_scale} + den)
                       // (2 * den)) AS BIGINT) AS deriv_fp
        FROM nd WHERE den > 0
    """
