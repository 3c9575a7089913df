"""Window-function operators (SURVEY.md §2.5).

The reference's only window-like constructs are the clustering order
``activity_time DESC`` within a partition
(lab/init-scripts/01-create-schema.cql:52-53) — whose natural read is
"latest row per partition key" — and Prometheus-style time-bucket
rates (A7, see aggregates.rate_over_window).

At scale, top-1-per-key via ``row_number`` shuffles once on the
partition key and sorts within partitions only — no global sort.  For
plain "latest" (no full-row ties needed) ``max_by`` is cheaper still:
a hash aggregate with map-side partials instead of a sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Top-1 per partition key, newest-first — the `SELECT ... LIMIT 1`
    read against a `CLUSTERING ORDER BY (activity_time DESC)` table.
    Deterministic under ties via ``tiebreak`` columns."""
    order_cols = [F.desc(order_by)] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k_per_key(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    k: int,
    descending: bool = True,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """First k rows per partition in clustering order — the
    ``SELECT ... LIMIT k`` per-partition read."""
    direction = F.desc if descending else F.asc
    order_cols = [direction(order_by)] + [direction(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def clustering_sort(
    df: DataFrame, partition_by: list[str], order_by: str, descending: bool = True
) -> DataFrame:
    """L2: rows co-located by partition key and sorted within
    partitions by clustering column (01-create-schema.cql:52-53) —
    ``repartition + sortWithinPartitions``, no global sort/exchange
    beyond the one hash shuffle."""
    col = F.desc(order_by) if descending else F.asc(order_by)
    return df.repartition(*[F.col(c) for c in partition_by]).sortWithinPartitions(
        *partition_by, col
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization of an event stream: a new session
    starts whenever a user is idle longer than ``gap_seconds``.
    Returns one row per session: (user, session_id, n_events,
    session_start, session_end, duration_s).

    The batch twin of Structured Streaming's ``F.session_window``
    (streaming pipelines use that directly); here expressed as
    lag → flag → running sum → aggregate.  Physical plan: ONE hash
    shuffle on the user key; the lag/sum windows and the final
    per-session aggregate all reuse that partitioning (Catalyst
    collapses them into a single sort within partitions), so cost is
    O(|events|) rows shuffled regardless of session count.  Skewed
    power users are bounded by per-user event counts, not corpus
    size; state never leaves the executor.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    prev = F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(ts_col).cast("long") - prev) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_sess = df.withColumn("session_id", F.sum(is_new).over(run))
    return (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (
                F.max(F.col(ts_col).cast("long"))
                - F.min(F.col(ts_col).cast("long"))
            ).alias("duration_s"),
        )
    )


def running_delta(df: DataFrame, partition_by: list[str], order_by: str, value: str) -> DataFrame:
    """Per-key lag delta (value - previous value in clustering order) —
    the building block for rate-of-change monitoring queries."""
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    return df.withColumn("_prev", F.lag(value).over(w)).withColumn(
        "delta", F.col(value) - F.col("_prev")
    ).drop("_prev")


def running_total(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    out: str = "running_total",
) -> DataFrame:
    """Per-key cumulative sum in deterministic order — the running
    balance / cumulative-revenue analytic.  The value ACCUMULATES as
    DECIMAL(18,2) (exact addition, so the result is independent of
    both partitioning and the window implementation — a float
    cumulative sum differs between engines' accumulation strategies)
    and is emitted as a rounded double, the engine's output-column
    convention.  One shuffle on the key."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out,
        F.round(
            F.sum(F.col(val_col).cast("decimal(18,2)")).over(w).cast("double"),
            2,
        ),
    )


def ntile_buckets(
    df: DataFrame,
    order_col: str,
    n: int = 4,
    tiebreak_col: str | None = None,
    out: str = "tile",
) -> DataFrame:
    """Equal-frequency bucketing (quartiles/deciles) by ``order_col``
    — the length-balancing step before batch packing, and the classic
    per-feature quantile binning.  ``tiebreak_col`` pins a total
    order so tile assignment is deterministic across engines.

    Single-partition window: NTILE needs the global rank, so this
    shape holds to ~10⁸ rows; beyond that switch to approx quantile
    cut points (`sketch_profile`) + a scan-side `when` chain, trading
    exact equal counts for full parallelism."""
    from pyspark.sql import Window

    order = [F.col(order_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    return df.withColumn(out, F.ntile(n).over(Window.orderBy(*order)))


def resample_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-series resample + gap fill: per key, an hourly grid from
    the key's first to last observation, with the event count per
    bucket (0 in gaps) and the bucket-max value forward-filled across
    gaps — the hypertable-rollup / sensor-downsample primitive.

    Emits (key, bucket, n_events, value_ffill).

    Physical plan: one shuffle on the key builds both the per-bucket
    aggregates and the per-key span; the grid explode is narrow
    (sequence() on the span row); the gap-fill window runs on the
    same key partitioning, so AQE reuses a single exchange.  The grid
    is bounded by span-hours per key, never by event count — at
    100 TB of events the output is |keys| x |hours|, usually far
    smaller than the input.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    buckets = (
        df.select(F.col(key_col), hour.alias("_h"), F.col(value_col))
        .groupBy(key_col, "_h")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.max(value_col).alias("_mv"),
        )
    )
    span = df.select(F.col(key_col), hour.alias("_h")).groupBy(key_col).agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(
            buckets,
            (grid[key_col] == buckets[key_col])
            & (grid["bucket"] == buckets["_h"]),
            "left",
        )
        .select(
            grid[key_col],
            "bucket",
            F.coalesce(F.col("_c"), F.lit(0)).alias("n_events"),
            F.col("_mv"),
        )
        .select(
            F.col(key_col),
            "bucket",
            "n_events",
            F.last("_mv", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    open_end: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from an event
    log: per key, keep only rows where ``attr_col`` CHANGES (the first
    row of each run), and give each surviving version a
    ``[valid_from, valid_to)`` interval, the last one open-ended
    (``valid_to`` NULL, or ``open_end`` if given).

    Both windows are PARTITIONed by the key — at 100 TB this is one
    key-hash shuffle and per-key sorts, never a global sort.  Ties on
    the timestamp are broken deterministically by the attribute value.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(attr_col))
    changed = (
        df.select(key_col, ts_col, attr_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
    )
    w2 = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(attr_col))
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn(
            "valid_to",
            F.lead(ts_col).over(w2)
            if open_end is None
            else F.coalesce(
                F.lead(ts_col).over(w2), F.lit(open_end).cast("timestamp")
            ),
        )
        .withColumn(
            "version", F.row_number().over(w2).cast("bigint")
        )
        .select(key_col, "version", attr_col, "valid_from", "valid_to")
    )


def percentile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    out: str = "pct_rank",
) -> DataFrame:
    """Percent-rank of ``value_col`` within each group — the standard
    per-language/per-domain score calibration step before global
    thresholding.  A grouped window (one key shuffle, per-group sort);
    rounded to 6 so the double is engine-reproducible."""
    w = Window.partitionBy(group_col).orderBy(F.asc(value_col))
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.round(F.percent_rank().over(w), 6).alias(out),
    )


def retry_collapse(
    df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    id_col: str = "event_id",
    tolerance_sec: int = 60,
) -> DataFrame:
    """Collapse client retries: within each (user, event_type) stream,
    drop every event whose gap to the PREVIOUS event is within
    ``tolerance_sec`` — an unbroken retry chain collapses to its first
    event (gap-session semantics).  The at-least-once-delivery cleanup
    every event pipeline runs before counting anything.

    Implementation: lag gap (exact integer µs) → cumulative new-session
    counter → keep each session's first row.  One shuffle on the
    stream key; everything else is window arithmetic.
    """
    from pyspark.sql import Window as W

    keys = key_cols or ["user_id", "event_type"]
    w = W.partitionBy(*keys).orderBy(F.col(ts_col), F.col(id_col))
    # exact integer microseconds: no float-epoch drift in the gap test
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    sess = F.sum(
        F.when(
            gap.isNull() | (gap > tolerance_sec * 1_000_000), 1
        ).otherwise(0)
    ).over(w)
    first_in_sess = F.row_number().over(
        W.partitionBy(*keys, "_sess").orderBy(F.col(ts_col), F.col(id_col))
    )
    return (
        df.withColumn("_sess", sess)
        .withColumn("_r", first_in_sess)
        .filter(F.col("_r") == 1)
        .drop("_sess", "_r")
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bar: str = "1 day",
) -> DataFrame:
    """Calendar downsampling to OHLC bars: per (key, time bucket) the
    open (first by time), high, low, close (last by time), and count —
    the classic tick→bar compaction of time-series storage.

    Plan: ONE map-combined aggregation — open/close ride as
    ``min_by``/``max_by`` over (ts, tiebreak) so no window pass or
    second shuffle is needed; high/low/count are plain aggregates.
    The shuffle carries one row per (key, bar).  Ties on identical
    timestamps resolve by a deterministic tiebreak column (the value
    itself), matching the SQL oracle's argmin/argmax semantics."""
    w = F.window(F.col(ts_col), bar)
    tie = F.struct(F.col(ts_col), F.col(value_col))
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.min_by(F.col(value_col), tie).alias("open"),
            F.max(F.col(value_col)).alias("high"),
            F.min(F.col(value_col)).alias("low"),
            F.max_by(F.col(value_col), tie).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            key_col,
            "open", "high", "low", "close", "n_ticks",
        )
    )


def retention_cohorts(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period: str = "week",
) -> DataFrame:
    """Retention matrix: users grouped by first-activity period
    (cohort), counted by how many periods later they return —
    (cohort, period_offset, n_users).  The standard product-analytics
    rollup.

    Plan: first-seen is one groupBy(user) min; activity periods are a
    distinct over (user, period); the offset join is user-keyed (both
    sides hash on the user id — co-partitioned, single shuffle each)
    and the final matrix aggregates O(cohorts × offsets) keys."""
    secs = {"day": 86400, "week": 7 * 86400}[period]
    p = F.date_trunc(period, F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(p).alias("cohort"))
    active = df.select(F.col(user_col), p.alias("period")).distinct()
    return (
        active.join(first, user_col)
        .select(
            "cohort",
            F.floor(
                (F.unix_timestamp("period") - F.unix_timestamp("cohort"))
                / F.lit(secs)
            ).cast("int").alias("period_offset"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cdc_apply(
    changelog: DataFrame,
    pk_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Materialize the current state from a CDC changelog: the latest
    operation per key wins; keys whose latest operation is a DELETE
    vanish.  This is the general changelog fold that CDM's
    AutoCorrect deliberately is NOT (the reference never deletes
    target rows — docs/04-cdm-approach.md:367); migrating FROM a
    CDC feed needs the full insert/update/delete semantics.

    Plan: ONE hash shuffle on the key for the per-key window (same
    shape as Z3's LWW merge), ordered by (ts, tiebreak) with a
    deterministic tiebreak so replayed logs materialize identically;
    the delete filter is scan-side after the rank."""
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*pk_cols).orderBy(*order)
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )


def id_gap_islands(
    df: DataFrame,
    id_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands over a dense id space: contiguous runs of
    present ids collapse to (island_start, island_end, island_len)
    rows — the classic completeness check for sequenced ingest (which
    id ranges did the feed drop?).

    Plan: the island key is ``id − row_number()`` (constant within a
    contiguous run) — one global-ordered window.  To avoid a
    single-task global sort, the row_number is composed from a range
    bucket's local rank plus per-bucket offsets — the same two-phase
    trick as ``operators/ids.stable_dense_ids``; here ids are already
    near-dense so fixed-width buckets serve as the range partitioner.
    Offsets are an exclusive prefix sum over the one-row-per-bucket
    counts (collected and cumsum'd driver-side — O(buckets), tiny),
    shipped back as a BROADCAST-JOINED frame rather than a literal
    map, whose plan size would grow with the id space."""
    bucket = (F.col(id_col) / F.lit(100000)).cast("long")
    w_local = Window.partitionBy("_bkt").orderBy(F.asc(id_col))
    local = (
        df.select(F.col(id_col)).distinct()
        .withColumn("_bkt", bucket)
        .withColumn("_lrn", F.row_number().over(w_local))
    )
    sizes = {
        r["_bkt"]: r["n"]
        for r in local.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows, acc = [], 0
    for b in sorted(sizes):
        rows.append((b, acc))
        acc += sizes[b]
    offsets = df.sparkSession.createDataFrame(rows, "_bkt long, _off long")
    keyed = local.join(F.broadcast(offsets), "_bkt").withColumn(
        "_island", F.col(id_col) - (F.col("_lrn") + F.col("_off"))
    )
    return (
        keyed.groupBy("_island")
        .agg(
            F.min(id_col).alias("island_start"),
            F.max(id_col).alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .select("island_start", "island_end", "island_len")
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union of overlapping/adjacent [start, end] intervals per key —
    (key, span_start, span_end, n_merged).  The interval-coalescing
    pattern (maintenance windows, on-call spans, validity ranges)
    that ``sessionize`` (point events + gap) does not cover.

    Plan: one key shuffle; a running max of end over the start-ordered
    window detects non-overlap starts (start > max(end) so far), a
    running sum of those flags numbers the spans, and one groupBy
    emits them.  Two window passes + one aggregation, all on the same
    partitioning — Spark reuses the exchange."""
    w_order = Window.partitionBy(key_col).orderBy(
        F.asc(start_col), F.asc(end_col)
    )
    prev_max_end = F.max(end_col).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_span = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    spanned = df.withColumn("_new", new_span).withColumn(
        "_span",
        F.sum("_new").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        spanned.groupBy(key_col, "_span")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .select(key_col, "span_start", "span_end", "n_merged")
    )


def transition_matrix(
    df: DataFrame,
    seq_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for every observed (from_state → to_state) pair, the
    transition count and row-normalized probability in integer ppm —
    the behavioral-model summary (next-action prediction, anomaly
    scoring of improbable jumps) a product-analytics pipeline derives
    from its event log.

    ``order_cols`` must make the per-entity order TOTAL (include a
    tiebreaker id next to the timestamp), or adjacent-pair extraction
    is nondeterministic under repartitioning.

    Plan: ONE ``lead`` window (single shuffle on the entity key,
    per-entity sort bounded by session length), then two tiny
    aggregates over (state, state) pairs — state-count² rows at most.
    Integer ppm via explicit FLOOR: DuckDB rounds double→BIGINT casts
    while Spark truncates, so the normalization floors on both sides.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(seq_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(F.col(state_col)).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    totals = counts.groupBy("from_state").agg(
        F.sum("n_transitions").cast("long").alias("_row_total")
    )
    return (
        counts.join(totals, "from_state")
        .select(
            "from_state",
            "to_state",
            "n_transitions",
            F.floor(
                F.col("n_transitions") * F.lit(1_000_000) / F.col("_row_total")
            )
            .cast("long")
            .alias("prob_ppm"),
        )
    )
