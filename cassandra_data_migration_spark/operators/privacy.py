"""Privacy / governance operators: differentially-private aggregate
release and k-anonymity auditing.

A data platform that exports statistics from a 100 TB corpus needs a
release gate: aggregate counts jittered with calibrated noise
(differential privacy's Laplace mechanism, Dwork et al. 2006 — public
algorithm) and a quasi-identifier audit (k-anonymity, Sweeney 2002).

Determinism note: production DP uses fresh randomness per release.
Here the Laplace draw is derived from md5(seed, group) through the
inverse CDF, which makes the release REPRODUCIBLE — the property the
cross-engine oracle gate needs, and a legitimate mode in its own
right (a pinned release seed means re-running the export never leaks
a second independent noise sample for the same group, which would
otherwise average the noise away — the "repeated release" attack).

Both operators are single map-combined aggregations; the noise is a
scan-side expression over the group key.  Nothing here shuffles more
than (group, count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _uniform01(seed: str, *cols: Column | str) -> Column:
    """Deterministic open-interval (0,1) draw from md5(seed, cols) —
    8 hex digits → 32-bit int → (i+1)/(2^32+1), never exactly 0/0.5
    pathological endpoints for the inverse CDF."""
    parts = [F.lit(seed)] + [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    i = F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts)), 1, 8), 16, 10
    ).cast("long")
    return (i + 1) / F.lit(float((1 << 32) + 1))


def laplace_noise(seed: str, scale: float, *cols: Column | str) -> Column:
    """Laplace(0, scale) via the inverse CDF applied to the seeded
    uniform: -scale · sign(u−½) · ln(1−2|u−½|).  Same IEEE ops in any
    engine → identical noise for identical (seed, group)."""
    u = _uniform01(seed, *cols)
    centered = u - F.lit(0.5)
    return (
        -F.lit(scale)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def dp_group_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp-release",
) -> DataFrame:
    """ε-DP grouped counts via the Laplace mechanism: true count +
    Laplace(1/ε) per group (count queries have sensitivity 1), noisy
    value clamped at 0 and e6-rounded for cross-engine compare.

    The TRUE count never leaves the plan — only the noisy value is
    in the output schema, which is the point of the release gate."""
    scale = 1.0 / epsilon
    noise = laplace_noise(seed, scale, *[F.col(c) for c in group_cols])
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_true"))
        .select(
            *group_cols,
            F.round(
                F.greatest(F.col("_true") + noise, F.lit(0.0)), 6
            ).alias("noisy_count"),
        )
    )


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Quasi-identifier combinations shared by fewer than ``k``
    rows — each one is a re-identification risk the release must
    suppress or generalize.  One map-combined groupBy; the report is
    O(violating cells)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )
