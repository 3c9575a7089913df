"""Streaming exact windowed quantiles — the Structured Streaming twin
of the batch latency-percentile report (`operators/aggregates.
latency_percentiles` family), continuously maintained per time window
with `applyInPandasWithState`.

Spark's built-in streaming aggregation cannot express exact
percentiles (percentile/median are unsupported in streaming aggs;
approx_percentile changes the answer), so the window's value multiset
is held in GroupState and the exact interpolated quantile is
recomputed on every update — the metrics-tier design where a window
holds one monitoring period of latencies (state O(rate × window),
the same bound as `streaming/attribution.py`), not corpus rows.

Engine-exact arithmetic: values are centified on the scan
(floor(v*100 + 0.5) — the fixtures carry 2-decimal metrics), the
linear interpolation runs over exact integer cents, and the result is
emitted in integer micro-cents via floor(x + 0.5), so a DuckDB oracle
reproduces every digit (same IEEE ops in the same order — no
quantile_cont implementation drift, no float-rounding boundary).

Emission is update-mode: each micro-batch re-emits the windows it
touched with the running n_events, so the finite-replay reduction
"keep the row with max n_events per window" reconstructs the final
exact answer regardless of how the replay was micro-batched (the
stream-equals-batch test replays in 4 slices).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def percentile_col(p: float) -> str:
    """Collision-safe output column name for percentile ``p``.

    ``%g`` of p*100 (not int-truncation, which mislabels 0.29 as p28
    and collapses 0.99/0.999 into one duplicate name): 0.5 → p50_uc,
    0.95 → p95_uc, 0.999 → p99_9_uc.  The oracle builder imports this
    same function so both schemas stay in lockstep.
    """
    return "p" + f"{p * 100:g}".replace(".", "_") + "_uc"


def quantile_ucents(sorted_cents: list[int], p: float) -> int:
    """Exact linear-interpolated p-quantile of integer cents, in
    micro-cents.  pos = p*(n-1); result = lo*1e6 + t*(hi-lo)*1e6,
    floor(x+0.5)-rounded — the precise expression the oracle mirrors."""
    n = len(sorted_cents)
    pos = p * (n - 1)
    idx = int(math.floor(pos))
    t = pos - idx
    lo = sorted_cents[idx]
    hi = sorted_cents[min(idx + 1, n - 1)]
    return int(math.floor(lo * 1_000_000 + t * (hi - lo) * 1_000_000 + 0.5))


def windowed_quantiles_stream(
    stream: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window_hours: int = 1,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
):
    """Continuously maintained exact per-window quantiles.

    Output: (window_h, n_events, p<P>_uc ...) — window_h is the
    epoch-hour index (epoch-aligned tumbling windows, the same
    bucketing as date_trunc('hour')), quantiles in micro-cents.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    hour = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(US_PER_HOUR * window_hours)
    ).cast("long")
    keyed = stream.select(hour.alias("window_h"), cents.alias("_cents"))

    state_schema = StructType([StructField("vals", ArrayType(LongType()))])
    pcols = [percentile_col(p) for p in percentiles]
    out_schema = StructType(
        [
            StructField("window_h", LongType()),
            StructField("n_events", LongType()),
        ]
        + [StructField(c, LongType()) for c in pcols]
    )

    def update(key, pdfs, state: GroupState):
        new: list[int] = []
        for p in pdfs:
            if len(p):
                new.extend(int(v) for v in p["_cents"])
        if not new:
            return
        vals = (list(state.get[0]) if state.exists else []) + new
        state.update((vals,))
        s = sorted(vals)
        row = {"window_h": key[0], "n_events": len(s)}
        for p, c in zip(percentiles, pcols):
            row[c] = quantile_ucents(s, p)
        yield pd.DataFrame([row])

    return keyed.groupBy("window_h").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
