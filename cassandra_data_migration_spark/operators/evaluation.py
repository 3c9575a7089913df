"""Classifier-evaluation operators: exact ROC-AUC, precision/recall
at thresholds, calibration bins.

A quality-classifier-driven pipeline (hashed_linear_score,
quality_score_e6, fastText-style filters) is only as good as its
classifier, and the evaluation step is itself a big-data job: scores
live on every document, labels on audited samples or weak rules.
These operators compute the standard metrics EXACTLY — integer/
rational arithmetic end to end, half-up fixed-point only at the output
edge — so the DuckDB oracles match bit-for-bit and two runs can never
disagree in the last float digit.

Scale shapes:

- ``roc_auc`` uses the rank-sum (Mann-Whitney) identity with
  average-rank tie handling.  Group min-ranks come from the FOLDED
  two-phase bucketed rank (operators/ids.grouped_min_ranks — no
  single-task sort, no per-row window: rows pre-aggregate to tie
  groups in one shuffle and the prefix window runs over group rows);
  positives in a tie group contribute their AVERAGE rank
  ``min_rank + (cnt-1)/2`` whatever the tie-break order, so
  2·Σranks = Σ_groups pos_c·(2·min_rank + cnt − 1) stays integral.
- ``pr_at_thresholds`` is ONE scan with a broadcast threshold list —
  O(thresholds) output rows.
- ``calibration_bins`` is one map-combined groupBy on the bin index;
  the ECE numerator Σ|conf_sum_b − scale·pos_b| stays integral until
  the single final division by N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.ids import grouped_min_ranks

PPM = 1_000_000


def _half_up_ppm(num_col, den_col):
    """half-up (num·1e6)/den as BIGINT; caller guarantees den > 0 and
    num >= 0."""
    return F.expr(
        f"CAST((CAST(2 AS DECIMAL(38,0)) * CAST({num_col} AS DECIMAL(38,0))"
        f" * {PPM} + CAST({den_col} AS DECIMAL(38,0)))"
        f" div (CAST(2 AS DECIMAL(38,0)) * CAST({den_col} AS DECIMAL(38,0)))"
        " AS BIGINT)"
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int = 64,
    score_bounds: list | None = None,
) -> DataFrame:
    """One row: (n_pos, n_neg, auc_ppm) — the exact Mann-Whitney AUC
    of ``score_col`` against binary ``label_col`` (1 = positive),
    average-rank ties.  No row when either class is empty (the metric
    is undefined, not zero).

    The global rank chain is FOLDED (operators/ids.grouped_min_ranks):
    rows pre-aggregate to their tie groups in one shuffle and the
    prefix window runs over group rows per bucket — never a per-row
    rank, tiebreaker, or full-width window sort.  ``score_bounds``
    (ordered bucket boundaries) skips the percentile pass when the
    score domain is known, making the whole metric ONE scan."""
    groups = grouped_min_ranks(
        df.select(
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("long").alias("_y"),
        ),
        "_s",
        [F.sum("_y").alias("_pos_c")],
        buckets=buckets,
        bounds=score_bounds,
    )
    tot = groups.agg(
        F.sum("_pos_c").cast("long").alias("n_pos"),
        F.sum(F.col("_cnt") - F.col("_pos_c")).cast("long").alias("n_neg"),
        # 2 x Σ average ranks of positives; the per-group product is
        # O(n²) so it multiplies in DECIMAL, never in BIGINT
        F.sum(
            _dec(F.col("_pos_c"))
            * (
                F.lit(2).cast("decimal(38,0)") * _dec(F.col("_min_rank"))
                + _dec(F.col("_cnt"))
                - F.lit(1).cast("decimal(38,0)")
            )
        ).alias("_s2"),
    )
    num = (
        F.col("_s2")
        - _dec(F.col("n_pos")) * (_dec(F.col("n_pos")) + F.lit(1))
    )
    den = F.lit(2).cast("decimal(38,0)") * _dec(F.col("n_pos")) * _dec(
        F.col("n_neg")
    )
    return (
        tot.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn(
            "auc_ppm",
            F.expr(
                f"CAST((CAST(2 AS DECIMAL(38,0)) * _num * {PPM} + _den)"
                " div (CAST(2 AS DECIMAL(38,0)) * _den) AS BIGINT)"
            ),
        )
        .select("n_pos", "n_neg", "auc_ppm")
    )


def _dec(c):
    return c.cast("decimal(38,0)")


def pr_at_thresholds(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[int],
) -> DataFrame:
    """(threshold, tp, fp, fn, tn, precision_ppm, recall_ppm, f1_ppm)
    per threshold, predicted positive = ``score >= threshold``.
    Precision is NULL when nothing is predicted positive (undefined,
    not zero); recall requires positives to exist in the data.  One
    scan, broadcast threshold list, exact integer counts."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    spark = df.sparkSession
    th = spark.createDataFrame([(t,) for t in thresholds], "threshold long")
    base = df.select(
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("long").alias("_y"),
    )
    j = base.crossJoin(F.broadcast(th))
    pred = F.col("_s") >= F.col("threshold")
    g = j.groupBy("threshold").agg(
        F.sum((pred & (F.col("_y") == 1)).cast("long")).alias("tp"),
        F.sum((pred & (F.col("_y") == 0)).cast("long")).alias("fp"),
        F.sum(((~pred) & (F.col("_y") == 1)).cast("long")).alias("fn"),
        F.sum(((~pred) & (F.col("_y") == 0)).cast("long")).alias("tn"),
    )
    return (
        g.withColumn(
            "precision_ppm",
            F.when(
                F.col("tp") + F.col("fp") > 0,
                _half_up_ppm("tp", "tp + fp"),
            ),
        )
        .withColumn(
            "recall_ppm",
            F.when(
                F.col("tp") + F.col("fn") > 0,
                _half_up_ppm("tp", "tp + fn"),
            ),
        )
        .withColumn(
            "f1_ppm",
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                _half_up_ppm("2 * tp", "2 * tp + fp + fn"),
            ),
        )
        .orderBy("threshold")
    )


def calibration_bins(
    df: DataFrame,
    conf_ppm_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table: (bin, n_docs, avg_conf_ppm, acc_ppm,
    gap_ppm) over equal-width confidence bins of ``conf_ppm_col``
    (0..1e6 fixed point; the top edge folds into the last bin).  The
    expected calibration error is
    ``ECE_ppm = half_up(Σ_b n_b·gap_b, N)`` — derivable from this
    table; Σ|conf_sum_b − 1e6·pos_b| stays integral so the table (and
    the derived ECE) is engine-exact."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    binned = df.select(
        F.least(
            F.expr(f"CAST({conf_ppm_col} AS BIGINT) * {n_bins} DIV {PPM}"),
            F.lit(n_bins - 1),
        ).cast("int").alias("bin"),
        F.col(conf_ppm_col).cast("long").alias("_c"),
        F.col(label_col).cast("long").alias("_y"),
    )
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_c").alias("_conf_sum"),
        F.sum("_y").alias("_pos"),
    )
    return (
        g.withColumn("avg_conf_ppm", F.expr("_conf_sum DIV n_docs"))
        .withColumn("acc_ppm", _half_up_ppm("_pos", "n_docs"))
        .withColumn(
            "gap_ppm",
            F.expr(
                f"CAST((2 * abs(_conf_sum - CAST(_pos AS DECIMAL(38,0))"
                f" * {PPM}) + n_docs) div (2 * CAST(n_docs AS"
                " DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .select("bin", "n_docs", "avg_conf_ppm", "acc_ppm", "gap_ppm")
        .orderBy("bin")
    )


def grouped_roc_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group exact AUC: (group, n_pos, n_neg, auc_ppm) — the
    classifier-drift view (is the quality filter as discriminative on
    zh as on en?).  Groups missing a class produce no row.

    Scale shape is SIMPLER than the global AUC: the rank window is
    partitioned by the group, so it shuffles once on the group key and
    never needs the two-phase trick; the window runs over O(distinct
    scores) pre-aggregated rows per group."""
    from pyspark.sql import Window

    per_score = (
        df.select(
            F.col(group_col).alias("_g"),
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("_g", "_s")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum("_y").alias("_pos_c"),
        )
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_score.withColumn(
        "_below", F.coalesce(F.sum("_cnt").over(w), F.lit(0))
    )
    # min_rank within the group = rows below + 1
    tot = ranked.groupBy("_g").agg(
        F.sum("_pos_c").cast("long").alias("n_pos"),
        F.sum(F.col("_cnt") - F.col("_pos_c")).cast("long").alias("n_neg"),
        F.sum(
            _dec(F.col("_pos_c"))
            * (
                F.lit(2).cast("decimal(38,0)")
                * (_dec(F.col("_below")) + F.lit(1).cast("decimal(38,0)"))
                + _dec(F.col("_cnt"))
                - F.lit(1).cast("decimal(38,0)")
            )
        ).alias("_s2"),
    )
    num = (
        F.col("_s2")
        - _dec(F.col("n_pos")) * (_dec(F.col("n_pos")) + F.lit(1))
    )
    den = F.lit(2).cast("decimal(38,0)") * _dec(F.col("n_pos")) * _dec(
        F.col("n_neg")
    )
    return (
        tot.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn(
            "auc_ppm",
            F.expr(
                f"CAST((CAST(2 AS DECIMAL(38,0)) * _num * {PPM} + _den)"
                " div (CAST(2 AS DECIMAL(38,0)) * _den) AS BIGINT)"
            ),
        )
        .select(
            F.col("_g").alias(group_col), "n_pos", "n_neg", "auc_ppm"
        )
        .orderBy(group_col)
    )


# --- DuckDB oracle twins ----------------------------------------------------


def roc_auc_sql(table_sql: str, score_expr: str, label_expr: str) -> str:
    """DuckDB twin of :func:`roc_auc`."""
    return f"""
        WITH base AS (
            SELECT {score_expr} AS s, CAST({label_expr} AS BIGINT) AS y
            FROM ({table_sql})
        ),
        ranked AS (
            SELECT s, y, ROW_NUMBER() OVER (ORDER BY s) AS rnk
            FROM base
        ),
        groups AS (
            SELECT s, MIN(rnk) AS min_rank, COUNT(*) AS cnt,
                   SUM(y) AS pos_c
            FROM ranked GROUP BY s
        ),
        tot AS (
            SELECT CAST(SUM(pos_c) AS HUGEINT) AS n_pos,
                   CAST(SUM(cnt - pos_c) AS HUGEINT) AS n_neg,
                   CAST(SUM(pos_c * (2 * min_rank + cnt - 1)) AS HUGEINT)
                       AS s2
            FROM groups
        )
        SELECT CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_neg AS BIGINT) AS n_neg,
               CAST((2 * (s2 - n_pos * (n_pos + 1)) * {PPM}
                     + 2 * n_pos * n_neg)
                    // (2 * 2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
        FROM tot WHERE n_pos > 0 AND n_neg > 0
    """


def grouped_roc_auc_sql(
    table_sql: str,
    group_expr: str,
    score_expr: str,
    label_expr: str,
    group_alias: str | None = None,
) -> str:
    """DuckDB twin of :func:`grouped_roc_auc`.  ``group_alias``
    defaults to ``group_expr`` — it must equal the Spark side's
    ``group_col`` (column names are part of the contract)."""
    group_alias = group_alias or group_expr
    return f"""
        WITH base AS (
            SELECT {group_expr} AS g, {score_expr} AS s,
                   CAST({label_expr} AS BIGINT) AS y
            FROM ({table_sql})
        ),
        per_score AS (
            SELECT g, s, COUNT(*) AS cnt, SUM(y) AS pos_c
            FROM base GROUP BY g, s
        ),
        ranked AS (
            SELECT g, s, cnt, pos_c,
                   COALESCE(SUM(cnt) OVER (
                       PARTITION BY g ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS below
            FROM per_score
        ),
        tot AS (
            SELECT g,
                   CAST(SUM(pos_c) AS HUGEINT) AS n_pos,
                   CAST(SUM(cnt - pos_c) AS HUGEINT) AS n_neg,
                   CAST(SUM(pos_c * (2 * (below + 1) + cnt - 1))
                       AS HUGEINT) AS s2
            FROM ranked GROUP BY g
        )
        SELECT g AS {group_alias},
               CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_neg AS BIGINT) AS n_neg,
               CAST((2 * (s2 - n_pos * (n_pos + 1)) * {PPM}
                     + 2 * n_pos * n_neg)
                    // (2 * 2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
        FROM tot WHERE n_pos > 0 AND n_neg > 0
        ORDER BY 1
    """


def pr_at_thresholds_sql(
    table_sql: str,
    score_expr: str,
    label_expr: str,
    thresholds: list[int],
) -> str:
    """DuckDB twin of :func:`pr_at_thresholds`."""
    th_rows = ", ".join(f"({t})" for t in thresholds)
    return f"""
        WITH base AS (
            SELECT {score_expr} AS s, CAST({label_expr} AS BIGINT) AS y
            FROM ({table_sql})
        ),
        th(threshold) AS (VALUES {th_rows}),
        g AS (
            SELECT CAST(th.threshold AS BIGINT) AS threshold,
                   SUM(CASE WHEN s >= th.threshold AND y = 1
                       THEN 1 ELSE 0 END)::HUGEINT AS tp,
                   SUM(CASE WHEN s >= th.threshold AND y = 0
                       THEN 1 ELSE 0 END)::HUGEINT AS fp,
                   SUM(CASE WHEN s < th.threshold AND y = 1
                       THEN 1 ELSE 0 END)::HUGEINT AS fn,
                   SUM(CASE WHEN s < th.threshold AND y = 0
                       THEN 1 ELSE 0 END)::HUGEINT AS tn
            FROM base, th GROUP BY 1
        )
        SELECT threshold,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
               CASE WHEN tp + fp > 0 THEN
                   CAST((2 * tp * {PPM} + (tp + fp)) // (2 * (tp + fp))
                        AS BIGINT) END AS precision_ppm,
               CASE WHEN tp + fn > 0 THEN
                   CAST((2 * tp * {PPM} + (tp + fn)) // (2 * (tp + fn))
                        AS BIGINT) END AS recall_ppm,
               CASE WHEN 2 * tp + fp + fn > 0 THEN
                   CAST((2 * 2 * tp * {PPM} + (2 * tp + fp + fn))
                        // (2 * (2 * tp + fp + fn)) AS BIGINT)
                   END AS f1_ppm
        FROM g ORDER BY threshold
    """


def calibration_bins_sql(
    table_sql: str,
    conf_ppm_expr: str,
    label_expr: str,
    n_bins: int = 10,
) -> str:
    """DuckDB twin of :func:`calibration_bins`."""
    return f"""
        WITH base AS (
            SELECT LEAST(CAST({conf_ppm_expr} AS BIGINT) * {n_bins}
                       // {PPM}, {n_bins - 1}) AS bin,
                   CAST({conf_ppm_expr} AS BIGINT) AS c,
                   CAST({label_expr} AS BIGINT) AS y
            FROM ({table_sql})
        ),
        g AS (
            SELECT CAST(bin AS INT) AS bin,
                   COUNT(*)::HUGEINT AS n_docs,
                   SUM(c)::HUGEINT AS conf_sum,
                   SUM(y)::HUGEINT AS pos
            FROM base GROUP BY 1
        )
        SELECT bin,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(conf_sum // n_docs AS BIGINT) AS avg_conf_ppm,
               CAST((2 * pos * {PPM} + n_docs) // (2 * n_docs)
                    AS BIGINT) AS acc_ppm,
               CAST((2 * ABS(conf_sum - pos * {PPM}) + n_docs)
                    // (2 * n_docs) AS BIGINT) AS gap_ppm
        FROM g ORDER BY bin
    """
