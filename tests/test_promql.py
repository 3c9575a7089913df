"""PromQL counter/gauge semantics (streaming/promql.py): reset
compensation, irate's last-two-samples contract, rate's boundary
extrapolation incl. the counter zero-crossing cap, deriv's exact
least-squares slope — each pinned against a pure-Python float
implementation of the published Prometheus algorithm."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F  # noqa: F401

from cassandra_data_migration_spark.streaming.promql import (
    deriv,
    extrapolated_rate,
    irate,
)

SCALE = 1_000_000_000


def _df(spark, rows):
    return spark.createDataFrame(
        [("s",) + r for r in rows], "series string, ts_ms long, value long"
    )


def _one(df, col):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][col]


def prom_rate_ref(samples, start, end, per_second=True):
    """Float reference of promql/functions.go extrapolatedRate for
    counters (public algorithm)."""
    ss = [(t, v) for t, v in samples if start < t <= end]
    if len(ss) < 2:
        return None
    result = 0.0
    prev = ss[0][1]
    for _, v in ss[1:]:
        result += (v - prev) if v >= prev else v
        prev = v
    t1, tn = ss[0][0], ss[-1][0]
    dur_start, dur_end = float(t1 - start), float(end - tn)
    sampled = float(tn - t1)
    avg = sampled / (len(ss) - 1)
    # promql/functions.go (>= 2.50) order: threshold clamp FIRST,
    # then the zero-cap takes the min with the clamped start extension
    threshold = avg * 1.1
    if dur_start >= threshold:
        dur_start = avg / 2
    if result > 0 and ss[0][1] >= 0:
        dur_zero = sampled * (ss[0][1] / result)
        if dur_zero < dur_start:
            dur_start = dur_zero
    if dur_end >= threshold:
        dur_end = avg / 2
    result *= (sampled + dur_start + dur_end) / sampled
    if per_second:
        result /= (end - start) / 1000.0
    return result


def _assert_matches_ref(got_fp, ref):
    # half-up fixed point of an exact rational vs float reference:
    # agreement to 1 ulp of the fixed point plus float noise
    assert got_fp == pytest.approx(ref * SCALE, abs=2, rel=1e-9)


def test_irate_last_two_only(spark):
    # earlier samples MUST NOT matter: only (2000, 70) -> (3000, 100)
    df = _df(spark, [(0, 1_000_000), (1000, 0), (2000, 70), (3000, 100)])
    got = _one(irate(df, ["series"], out_scale=SCALE), "irate_fp")
    assert got == 30 * 1000 * SCALE // 1000  # 30 per second exactly


def test_irate_reset_uses_post_reset_value(spark):
    # counter dropped 500 -> 80: the increase is 80, not -420
    df = _df(spark, [(0, 10), (1000, 500), (3000, 80)])
    got = _one(irate(df, ["series"], out_scale=SCALE), "irate_fp")
    assert got == 80 * 1000 * SCALE // 2000  # 40/s over the 2 s gap


def test_irate_single_sample_series_dropped(spark):
    df = _df(spark, [(0, 10)])
    assert irate(df, ["series"]).count() == 0


def test_duplicate_timestamps_collapse_instead_of_crashing(spark):
    # two scraper replicas reporting the same instant: same-ts rows
    # collapse to MAX(value); a zero-width interval must never reach
    # the division (ANSI divide-by-zero aborted the whole query)
    df = _df(spark, [(1000, 5), (1000, 7), (3000, 17)])
    assert _one(irate(df, ["series"], out_scale=SCALE), "irate_fp") == (
        10 * 1000 * SCALE // 2000
    )
    got = _one(
        extrapolated_rate(
            df, ["series"], range_start_ms=0, range_end_ms=4000,
            out_scale=SCALE,
        ),
        "rate_fp",
    )
    ref = prom_rate_ref([(1000, 7), (3000, 17)], 0, 4000)
    _assert_matches_ref(got, ref)
    # ALL samples sharing one ts -> no result row, not a crash
    only = _df(spark, [(1000, 5), (1000, 9)])
    assert irate(only, ["series"]).count() == 0
    assert (
        extrapolated_rate(
            only, ["series"], range_start_ms=0, range_end_ms=4000
        ).count()
        == 0
    )


def test_rate_matches_prometheus_reference_dense(spark):
    # dense regular scrapes, gaps under the 1.1x threshold -> the
    # REAL boundary gaps extend the interval
    samples = [(1000 * i, 7 * i) for i in range(1, 61)]
    df = _df(spark, samples)
    got = _one(
        extrapolated_rate(
            df, ["series"], range_start_ms=500, range_end_ms=60_500,
            out_scale=SCALE,
        ),
        "rate_fp",
    )
    _assert_matches_ref(got, prom_rate_ref(samples, 500, 60_500))


def test_rate_sparse_extension_branches(spark):
    # samples cover only the middle third: BOTH sides exceed the
    # 1.1x-avg threshold (-> avg/2 each); the zero crossing (10 s)
    # is then NOT below the clamped 5 s start extension, so it does
    # not fire — the >= 2.50 order (old order would have kept 10 s)
    samples = [(40_000, 100), (50_000, 200), (60_000, 300)]
    df = _df(spark, samples)
    got = _one(
        extrapolated_rate(
            df, ["series"], range_start_ms=0, range_end_ms=100_000,
            out_scale=SCALE,
        ),
        "rate_fp",
    )
    ref = prom_rate_ref(samples, 0, 100_000)
    _assert_matches_ref(got, ref)
    # start side: 40s gap >= 11s threshold -> avg/2 = 5s, and the
    # zero crossing (20s*100/200 = 10s) is not below 5s so the clamp
    # stands; end side: same -> 5s.  factor =
    # (20000 + 5000 + 5000)/20000 = 1.5: increase 200 extrapolates
    # to 300 over a 100 s range -> 3.0/s
    assert got == 3 * SCALE


def test_rate_counter_zero_cap(spark):
    # first value 10, increase 1000, sampled 10s, gap-to-start 60s:
    # durationToZero = 10s*(10/1000) = 0.1s < 60s -> the start
    # extension is capped at the zero crossing, not avg/2
    samples = [(60_000, 10), (65_000, 510), (70_000, 1010)]
    df = _df(spark, samples)
    got = _one(
        extrapolated_rate(
            df, ["series"], range_start_ms=0, range_end_ms=70_000,
            out_scale=SCALE,
        ),
        "rate_fp",
    )
    ref = prom_rate_ref(samples, 0, 70_000)
    _assert_matches_ref(got, ref)


def test_rate_reset_compensation_vs_reference(spark):
    samples = [
        (10_000, 100), (20_000, 400), (30_000, 50), (40_000, 300),
        (50_000, 20),
    ]
    df = _df(spark, samples)
    got = _one(
        extrapolated_rate(
            df, ["series"], range_start_ms=0, range_end_ms=60_000,
            out_scale=SCALE,
        ),
        "rate_fp",
    )
    ref = prom_rate_ref(samples, 0, 60_000)
    _assert_matches_ref(got, ref)
    # increase = 300 + 50 + 250 + 20 = 620, never the raw -80
    assert got > 0


def test_increase_mode_is_rate_times_range(spark):
    samples = [(1000 * i, 5 * i) for i in range(1, 31)]
    df = _df(spark, samples)
    inc = _one(
        extrapolated_rate(
            df, ["series"], range_start_ms=0, range_end_ms=30_000,
            per_second=False, out_scale=SCALE,
        ),
        "increase_fp",
    )
    rate = _one(
        extrapolated_rate(
            df, ["series"], range_start_ms=0, range_end_ms=30_000,
            out_scale=SCALE,
        ),
        "rate_fp",
    )
    # increase == rate * 30 s (exact in the rational; 1 ulp in fp)
    assert abs(inc - rate * 30) <= 30


def test_rate_left_open_range(spark):
    # a sample AT range_start is excluded; one at range_end included
    samples = [(0, 100), (10_000, 200), (20_000, 300)]
    df = _df(spark, samples)
    got = extrapolated_rate(
        df, ["series"], range_start_ms=0, range_end_ms=20_000,
        out_scale=SCALE,
    )
    ref = prom_rate_ref(samples, 0, 20_000)  # ref filter is identical
    _assert_matches_ref(_one(got, "rate_fp"), ref)


def test_rate_requires_valid_range(spark):
    df = _df(spark, [(0, 1), (1, 2)])
    with pytest.raises(ValueError):
        extrapolated_rate(df, ["series"], range_start_ms=5, range_end_ms=5)


def test_deriv_exact_line(spark):
    # v = 3/ms * t + 17 -> slope 3000/s exactly, regardless of epoch
    base = 1_700_000_000_000
    df = _df(spark, [(base + t, 3 * t + 17) for t in (0, 10, 25, 40, 90)])
    got = _one(deriv(df, ["series"], out_scale=SCALE), "deriv_fp")
    assert got == 3 * 1000 * SCALE


def test_deriv_negative_slope_and_constant(spark):
    base = 1_700_000_000_000
    down = _df(spark, [(base + t, 1000 - 2 * t) for t in (0, 50, 100)])
    assert _one(deriv(down, ["series"], out_scale=SCALE), "deriv_fp") == (
        -2 * 1000 * SCALE
    )
    flat = _df(spark, [(base, 7), (base + 1000, 7), (base + 2000, 7)])
    assert _one(deriv(flat, ["series"], out_scale=SCALE), "deriv_fp") == 0


def test_deriv_matches_numpy_lstsq(spark):
    import numpy as np

    ts = [0, 1000, 2500, 4000, 9000, 12_000]
    vs = [10, 14, 11, 29, 40, 38]
    df = _df(spark, list(zip(ts, vs)))
    got = _one(deriv(df, ["series"], out_scale=SCALE), "deriv_fp")
    slope_per_ms = np.polyfit(np.array(ts, float), np.array(vs, float), 1)[0]
    assert got == pytest.approx(slope_per_ms * 1000 * SCALE, abs=2, rel=1e-9)


def prom_rate_ref_exact(samples, start, end, scale=SCALE):
    """EXACT-rational reference of the same algorithm (fractions.Fraction
    end to end, half-up fixed-point at the edge) — the property test
    compares bit-for-bit, no float tolerance."""
    from fractions import Fraction as Fr

    ss = [(t, v) for t, v in samples if start < t <= end]
    if len(ss) < 2:
        return None
    d = 0
    prev = ss[0][1]
    for _, v in ss[1:]:
        d += (v - prev) if v >= prev else v
        prev = v
    t1, tn, v1 = ss[0][0], ss[-1][0], ss[0][1]
    sampled = Fr(tn - t1)
    dur_start, dur_end = Fr(t1 - start), Fr(end - tn)
    avg = sampled / (len(ss) - 1)
    threshold = avg * Fr(11, 10)
    if dur_start >= threshold:
        dur_start = avg / 2
    if d > 0 and v1 >= 0:
        dur_zero = sampled * Fr(v1, d)
        if dur_zero < dur_start:
            dur_start = dur_zero
    if dur_end >= threshold:
        dur_end = avg / 2
    out = Fr(d) * (sampled + dur_start + dur_end) / sampled
    out = out / Fr(end - start, 1000)
    num, den = (out * scale).numerator, (out * scale).denominator
    return (2 * num + den) // (2 * den)  # half-up (num >= 0 always)


def test_rate_property_exact_vs_fraction_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sample_sets = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500_000),  # ts_ms
            st.integers(min_value=0, max_value=10_000),  # counter value
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda tv: tv[0],
    )

    @settings(max_examples=40, deadline=None)
    @given(sample_sets)
    def run(samples):
        samples = sorted(samples)
        start, end = 0, 600_000
        expect = prom_rate_ref_exact(samples, start, end)
        df = _df(spark, samples)
        rows = extrapolated_rate(
            df, ["series"], range_start_ms=start, range_end_ms=end,
            out_scale=SCALE,
        ).collect()
        if expect is None:
            assert rows == []
        else:
            assert len(rows) == 1 and rows[0]["rate_fp"] == expect

    run()


def test_stream_irate_state_bound_and_replay(spark, tmp_path):
    """Streamed irate state holds <= 2 rows per series under any
    slicing, equals the batch irate, survives out-of-order arrival
    (a late sample between the state pair updates it), and a full
    fresh-checkpoint redelivery leaves the state bit-identical
    (top-2-by-ts is a max-like semilattice fold)."""
    from cassandra_data_migration_spark.streaming.promql_stream import (
        irate_from_state,
        irate_state_stream,
    )

    rows = [
        ("a", t * 1000, 5 * t) for t in range(1, 13)
    ] + [("b", t * 1000, 100 * t) for t in (1, 3, 9, 11)]
    # out-of-order: series b's ts=10000 sample arrives in the LAST
    # slice, after 11000 — it must displace 9000 in the state pair
    slices = [rows[0:6], rows[6:12] + rows[12:15], [rows[15], ("b", 10_000, 1000)]]
    d = str(tmp_path)
    src, st = f"{d}/src", f"{d}/state"
    for s in slices:
        spark.createDataFrame(
            s, "series string, ts_ms long, value long"
        ).repartition(1).write.mode("append").parquet(src)

    def start(ckpt):
        return irate_state_stream(
            spark.readStream.schema("series string, ts_ms long, value long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            st,
            ["series"],
            checkpoint=ckpt,
        )

    start(f"{d}/ckpt").awaitTermination(120)
    state = spark.read.parquet(st)
    per = {
        r["series"]: r["n"]
        for r in state.groupBy("series").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"a": 2, "b": 2}
    got = {
        r["series"]: r["irate_fp"]
        for r in irate_from_state(
            spark, st, ["series"], out_scale=SCALE
        ).collect()
    }
    all_rows = [r for s in slices for r in s]
    expect = {
        r["series"]: r["irate_fp"]
        for r in irate(
            spark.createDataFrame(
                all_rows, "series string, ts_ms long, value long"
            ),
            ["series"],
            out_scale=SCALE,
        ).collect()
    }
    assert got == expect
    # b's pair must be (10000, 11000): irate = |1100-1000|/1s = 100/s
    assert got["b"] == 100 * SCALE
    before = sorted(map(tuple, state.collect()))
    start(f"{d}/ckpt2").awaitTermination(120)  # full redelivery
    spark.catalog.refreshByPath(st)
    after = sorted(map(tuple, spark.read.parquet(st).collect()))
    assert after == before


def test_multi_series_independent(spark):
    rows = [("a", 0, 0), ("a", 1000, 10), ("b", 0, 0), ("b", 1000, 50)]
    df = spark.createDataFrame(
        rows, "series string, ts_ms long, value long"
    )
    out = {
        r["series"]: r["irate_fp"]
        for r in irate(df, ["series"], out_scale=SCALE).collect()
    }
    assert out == {"a": 10 * SCALE, "b": 50 * SCALE}
