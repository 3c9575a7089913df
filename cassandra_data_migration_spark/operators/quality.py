"""Data-quality constraint checks — the declarative expectation suite
(Deequ/Great-Expectations shape) a migration signs off with.

The reference's validation scripts assert count parity and row-hash
equality (lab/scripts/validate_migration.py); production sign-off
also wants COLUMN-level invariants: null rates, key uniqueness,
referential integrity, value domains.  Each check compiles to a plan
fragment and the report is their union — declarative in, one Spark
job out.

Scale notes
-----------
- All row-local checks (not-null / range / set / regex) fold into ONE
  full-scan aggregation: each check is a conditional-sum column, so
  adding checks adds zero passes.  The scan's shuffle is a single
  1-row partial per task.
- ``unique`` folds into the same pass count-distinct-style only via a
  second aggregation on its key (exact distinct needs its own
  shuffle); ``fk`` is a broadcast LEFT ANTI join when the dimension
  is dim-sized (the usual case) — probe-side pruned, no full shuffle.
- The report output is O(checks) rows regardless of table size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    kind: str  # not_null | range | in_set | regex | unique | fk
    column: str
    params: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"


def not_null(column: str) -> Check:
    return Check("not_null", column)


def in_range(column: str, lo, hi) -> Check:
    return Check("range", column, {"lo": lo, "hi": hi})


def in_set(column: str, values: list) -> Check:
    return Check("in_set", column, {"values": values})


def matches(column: str, pattern: str) -> Check:
    return Check("regex", column, {"pattern": pattern})


def unique(column: str) -> Check:
    return Check("unique", column)


def expect(name: str, predicate: str) -> Check:
    """Generic row-level expectation: any SQL boolean expression over
    the row (e.g. ``"o_totalprice >= 0 OR o_orderstatus = 'F'"``).
    Violations are rows where the predicate is NOT satisfied (NULL
    counts as a violation, matching SQL constraint semantics).  Folds
    into the same single scan aggregation as the other row-local
    checks."""
    return Check("expect", name, {"predicate": predicate})


def foreign_key(column: str, dim: DataFrame, dim_key: str) -> Check:
    return Check("fk", column, {"dim": dim, "dim_key": dim_key})


def _violation_expr(c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        bad = col.isNull()
    elif c.kind == "range":
        bad = col.isNull() | (col < F.lit(c.params["lo"])) | (
            col > F.lit(c.params["hi"])
        )
    elif c.kind == "in_set":
        arr = F.array(*[F.lit(v) for v in c.params["values"]])
        bad = ~F.array_contains(arr, col) | col.isNull()
    elif c.kind == "regex":
        bad = col.isNull() | ~col.rlike(c.params["pattern"])
    elif c.kind == "expect":
        bad = ~F.coalesce(F.expr(c.params["predicate"]), F.lit(False))
    else:  # pragma: no cover - guarded by dq_report
        raise ValueError(f"not a row-local check: {c.kind}")
    return F.sum(F.when(bad, 1).otherwise(0)).cast("long")


def dq_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(check_name, violations, n_rows, passed) per check.

    Row-local checks share one aggregation pass; unique/fk checks
    contribute their own single-aggregate plans; the union is a
    constant-size report."""
    row_local = [
        c
        for c in checks
        if c.kind in ("not_null", "range", "in_set", "regex", "expect")
    ]
    parts: list[DataFrame] = []
    if row_local:
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            *[_violation_expr(c).alias(f"_v{i}") for i, c in enumerate(row_local)],
        )
        stack = ", ".join(
            f"'{c.name}', _v{i}" for i, c in enumerate(row_local)
        )
        parts.append(
            agg.selectExpr(
                f"stack({len(row_local)}, {stack}) AS (check_name, violations)",
                "_n AS n_rows",
            )
        )
    for c in checks:
        if c.kind == "unique":
            parts.append(
                df.agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.countDistinct(c.column).cast("long").alias("_d"),
                ).select(
                    F.lit(c.name).alias("check_name"),
                    # duplicates + nulls are both uniqueness violations
                    # (countDistinct ignores NULL, so nulls land here)
                    (F.col("n_rows") - F.col("_d")).alias("violations"),
                    "n_rows",
                )
            )
        elif c.kind == "fk":
            dim = c.params["dim"].select(
                F.col(c.params["dim_key"]).alias(c.column)
            ).distinct()
            orphans = (
                df.join(F.broadcast(dim), c.column, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(F.lit(c.name).alias("check_name"), "violations")
            )
            n_df = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            parts.append(orphans.crossJoin(n_df))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)


def benford_profile(
    df, value_col: str, min_value: float = 1.0
):
    """First-significant-digit distribution vs Benford's law — the
    classic forensic data-quality audit for organically-generated
    numeric columns (fabricated or truncated data skews the profile).

    Output: (digit, n, observed_pct, benford_pct, abs_dev).  One
    map-combined aggregation over 9 keys; the digit extraction is a
    string head after normalization, engine-portable."""
    import math

    from pyspark.sql import functions as F

    if min_value < 1:
        # with |v| < 1 the leading integer digit is 0, which the digit
        # counts drop but the denominator would keep — observed_pct
        # would no longer sum to 1
        raise ValueError("benford_profile requires min_value >= 1")

    # values are filtered to >= min_value >= 1, so the first
    # significant digit is the integer part's leading character —
    # exact and engine-portable, no float formatting involved
    d = F.substring(
        F.floor(F.abs(F.col(value_col))).cast("long").cast("string"), 1, 1
    ).cast("int")
    filtered = df.filter(F.abs(F.col(value_col)) >= min_value)
    counts = filtered.groupBy(d.alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = filtered.count()
    benford = F.array(
        *[F.lit(round(math.log10(1 + 1 / k), 6)) for k in range(1, 10)]
    )
    return (
        counts.filter(F.col("digit").between(1, 9))
        .withColumn("observed_pct", F.round(F.col("n") / F.lit(total), 6))
        .withColumn("benford_pct", F.element_at(benford, F.col("digit")))
        .withColumn(
            "abs_dev",
            F.round(F.abs(F.col("observed_pct") - F.col("benford_pct")), 6),
        )
    )


def psi_drift(
    df_a,
    df_b,
    value_col: str = "value",
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 500.0,
):
    """Population Stability Index between two snapshots of a numeric
    column — the standard distribution-drift monitor a training-data
    pipeline runs between crawl/snapshot versions (PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate).

    Both snapshots bucket on the SAME fixed [lo, hi) grid (out-of-range
    values clamp into the edge buckets), shares are Laplace-smoothed
    (+1 per bucket) so empty buckets stay finite, and
    ``psi_term = (p − q)·ln(p/q)`` per bucket; ``SUM(psi_term)`` is the
    index.  Everything is one map-combined count aggregation per side
    plus an O(bins) spine join — corpus rows shuffle nothing but their
    bucket id.  The O(bins) totals window runs over ``bins`` rows, not
    data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df_a.sparkSession
    width = (hi - lo) / bins

    def bucketed(df, alias):
        b = F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
                .cast("int"),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
        return (
            df.select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    spine = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    j = (
        spine.join(bucketed(df_a, "n_a"), "bucket", "left")
        .join(bucketed(df_b, "n_b"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = (F.col("n_a") + 1) / (F.sum("n_a").over(w) + F.lit(bins))
    q = (F.col("n_b") + 1) / (F.sum("n_b").over(w) + F.lit(bins))
    return j.select(
        "bucket",
        "n_a",
        "n_b",
        F.round(p, 6).alias("share_a"),
        F.round(q, 6).alias("share_b"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


def join_cardinality_audit(
    a: DataFrame, b: DataFrame, key_a: str, key_b: str
) -> DataFrame:
    """Optimizer-stats diagnostics: the textbook equi-join cardinality
    estimate ``|A|·|B| / max(ndv_A, ndv_B)`` (uniformity + containment
    assumptions — what every cost-based optimizer, Catalyst's CBO
    included, computes from table stats) side by side with the ACTUAL
    join cardinality.  ratio_e4 far from 10000 flags the skewed or
    correlated keys where the planner's join-order choice goes wrong —
    the ANALYZE-health check to run before trusting CBO at 100 TB.

    Exact NDVs (countDistinct), not sketches, so both engines agree
    bit-for-bit; all arithmetic integer `div`.  One aggregation per
    side + the probe join, O(1) output.
    """
    sa = a.select(F.col(key_a).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.countDistinct("_k").cast("long").alias("ndv_a"),
    )
    sb = b.select(F.col(key_b).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.countDistinct("_k").cast("long").alias("ndv_b"),
    )
    actual = (
        a.select(F.col(key_a).alias("_k"))
        .join(b.select(F.col(key_b).alias("_k")), "_k")
        .agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    )
    return (
        sa.crossJoin(sb)
        .crossJoin(actual)
        .select(
            "n_a",
            "ndv_a",
            "n_b",
            "ndv_b",
            F.expr("(n_a * n_b) div greatest(ndv_a, ndv_b)").alias(
                "est_rows"
            ),
            "actual_rows",
            F.expr(
                "(actual_rows * 10000) div ((n_a * n_b) div greatest(ndv_a, ndv_b))"
            ).alias("ratio_e4"),
        )
    )
