"""Metrics export surface: exposition-format rendering + scrape
endpoint (the sink adapter for the reference's Prometheus/Grafana
stack, lab/monitoring/)."""

from __future__ import annotations

import urllib.request

from cassandra_data_migration_spark.streaming.dual_write import (
    DualWriteMetrics,
)
from cassandra_data_migration_spark.streaming.prometheus import (
    MetricsEndpoint,
    render_dual_write,
    render_metric,
    render_query_progress,
    render_router,
)
from cassandra_data_migration_spark.streaming.routing import RouterMetrics


def test_render_metric_format():
    text = render_metric(
        "cdm_spark_rows_total",
        42,
        {"cluster": "origin"},
        help_text="rows",
        metric_type="counter",
    )
    assert "# HELP cdm_spark_rows_total rows" in text
    assert "# TYPE cdm_spark_rows_total counter" in text
    assert text.endswith('cdm_spark_rows_total{cluster="origin"} 42')


def test_label_escaping():
    text = render_metric("m", 1, {"q": 'a"b\\c'}, include_header=False)
    assert text == 'm{q="a\\"b\\\\c"} 1'


def test_render_dual_write_families():
    m = DualWriteMetrics(batches=3, rows_origin=100, rows_target=98)
    m.failed_on["target"] = 2
    text = render_dual_write(m)
    assert 'cdm_spark_rows_written_total{cluster="origin"} 100' in text
    assert 'cdm_spark_rows_written_total{cluster="target"} 98' in text
    assert 'cdm_spark_failed_writes_total{failed_on="target"} 2' in text
    # one TYPE header per family, not per sample
    assert text.count("# TYPE cdm_spark_failed_writes_total") == 1
    assert text.count("# TYPE cdm_spark_rows_written_total") == 1


def test_render_router():
    m = RouterMetrics(reads_origin=5, shadow_reads=2, shadow_mismatches=1)
    text = render_router(m)
    assert 'cdm_spark_reads_total{cluster="origin"} 5' in text
    assert "cdm_spark_shadow_mismatches_total 1" in text


def test_render_query_progress_gauges():
    progress = {
        "name": "winops",
        "inputRowsPerSecond": 123.5,
        "processedRowsPerSecond": 120.0,
        "durationMs": {"triggerExecution": 250},
        "stateOperators": [{"numRowsTotal": 7}, {"numRowsTotal": 3}],
    }
    text = render_query_progress(progress)
    assert 'cdm_spark_stream_input_rows_per_second{query="winops"} 123.5' in text
    assert 'cdm_spark_stream_state_rows{query="winops"} 10' in text
    assert "# TYPE cdm_spark_stream_state_rows gauge" in text


def test_endpoint_scrape_roundtrip():
    ep = MetricsEndpoint()
    try:
        m = DualWriteMetrics(batches=1, rows_origin=10, rows_target=10)
        ep.register(lambda: render_dual_write(m))
        with urllib.request.urlopen(
            f"http://127.0.0.1:{ep.port}/metrics", timeout=5
        ) as r:
            body = r.read().decode()
            assert r.headers["Content-Type"].startswith("text/plain")
        assert 'cdm_spark_rows_written_total{cluster="origin"} 10' in body
        # live updates visible on the next scrape
        m.rows_origin = 25
        with urllib.request.urlopen(
            f"http://127.0.0.1:{ep.port}/metrics", timeout=5
        ) as r:
            assert 'cluster="origin"} 25' in r.read().decode()
    finally:
        ep.close()


def test_render_histogram_exposition_format():
    from cassandra_data_migration_spark.streaming.prometheus import (
        render_histogram,
    )

    text = render_histogram(
        "cdm_spark_request_duration_ms",
        [("500", 971), ("1000", 1816), ("+Inf", 10000)],
        sum_value=123456,
        labels={"cluster": "origin"},
        help_text="request latency",
    )
    lines = text.split("\n")
    assert lines[0] == "# HELP cdm_spark_request_duration_ms request latency"
    assert lines[1] == "# TYPE cdm_spark_request_duration_ms histogram"
    assert (
        'cdm_spark_request_duration_ms_bucket{cluster="origin",le="500"} 971'
        in lines
    )
    assert (
        'cdm_spark_request_duration_ms_bucket{cluster="origin",le="+Inf"} 10000'
        in lines
    )
    # _count equals the +Inf cumulative bucket — the scrape invariant
    assert 'cdm_spark_request_duration_ms_count{cluster="origin"} 10000' in lines
    assert 'cdm_spark_request_duration_ms_sum{cluster="origin"} 123456' in lines


def test_render_histogram_requires_inf():
    import pytest

    from cassandra_data_migration_spark.streaming.prometheus import (
        render_histogram,
    )

    with pytest.raises(ValueError, match="\\+Inf"):
        render_histogram("m", [("500", 1)], 1.0)


def test_histogram_quantile_known_values(spark):
    """Hand-checkable reconstruction: 100 values uniform over one
    bucket — the PromQL linear interpolation lands exactly q of the
    way through the bucket."""
    from pyspark.sql import functions as F

    from cassandra_data_migration_spark.streaming.histograms import (
        histogram_quantiles,
    )

    # 100 rows all inside (0, 1000]: p50 = 0 + 1000 * (50/100) = 500
    df = spark.range(0, 100).select((F.col("id") * 10 + 1).alias("lat"))
    got = {
        r["q_ppm"]: r["value_fp"]
        for r in histogram_quantiles(
            df, "lat", [1000, 2000], q_ppm=[500_000, 990_000]
        ).collect()
    }
    assert got[500_000] == 500 * 10_000
    assert got[990_000] == 990 * 10_000


def test_histogram_quantile_inf_clamps(spark):
    """Rank landing in +Inf clamps to the last finite le — the
    documented PromQL contract."""
    from pyspark.sql import functions as F

    from cassandra_data_migration_spark.streaming.histograms import (
        histogram_quantiles,
    )

    df = spark.range(0, 10).select((F.lit(5000)).alias("lat"))
    got = {
        r["q_ppm"]: r["value_fp"]
        for r in histogram_quantiles(
            df, "lat", [10, 20], q_ppm=[500_000]
        ).collect()
    }
    assert got[500_000] == 20 * 10_000


def test_cumulative_histogram_exports_empty_buckets(spark):
    from pyspark.sql import functions as F

    from cassandra_data_migration_spark.streaming.histograms import (
        cumulative_histogram,
    )

    df = spark.range(0, 5).select(F.lit(7).alias("lat"))
    rows = {
        r["le"]: (r["bucket_count"], r["cumulative_count"])
        for r in cumulative_histogram(df, "lat", [5, 10, 20]).collect()
    }
    assert rows == {
        "5": (0, 0),
        "10": (5, 5),
        "20": (0, 5),
        "+Inf": (0, 5),
    }


def test_windowed_histogram_quantiles_known_values(spark):
    """histogram_quantile over windowed bucket increases: crafted
    scrapes where the in-range increase per bucket is known, including
    a counter reset inside the window."""
    from cassandra_data_migration_spark.streaming.histograms import (
        windowed_bucket_increase,
        windowed_histogram_quantiles,
    )

    les = [10, 20]
    # scrapes at t=1000..4000; cumulative counters; the le=10 series
    # RESETS at t=3000 (process restart: 8 -> 2)
    rows = [
        ("10", 1000, 5), ("10", 2000, 8), ("10", 3000, 2), ("10", 4000, 4),
        ("20", 1000, 9), ("20", 2000, 14), ("20", 3000, 16), ("20", 4000, 20),
        ("+Inf", 1000, 10), ("+Inf", 2000, 16), ("+Inf", 3000, 18),
        ("+Inf", 4000, 24),
    ]
    df = spark.createDataFrame(rows, "le string, ts_ms long, value long")
    inc = {
        r["le"]: r["cumulative_count"]
        for r in windowed_bucket_increase(df, les, 0, 4000).collect()
    }
    # le=10: (8-5) + reset-> 2 + (4-2) = 7; le=20: 20-9 = 11; inf: 14
    assert inc == {"10": 7, "20": 11, "+Inf": 14}
    got = {
        r["q_ppm"]: r["value_fp"]
        for r in windowed_histogram_quantiles(
            df, les, 0, 4000, q_ppm=[500_000], out_scale=1
        ).collect()
    }
    # p50 rank = 7 -> first bucket (cum 7 >= 7): interp within (0,10]
    # at exactly the bucket's full span -> 10
    assert got == {500_000: 10}


def test_windowed_equals_total_when_range_covers_all(spark):
    """With no reset and a window covering every scrape, the windowed
    quantile equals histogram_quantiles over the raw values EXCEPT for
    the first scrape's count (increase needs a predecessor) — so feed
    a zero first scrape and they must agree exactly."""

    from cassandra_data_migration_spark.streaming.histograms import (
        histogram_quantiles,
        windowed_histogram_quantiles,
    )

    les = [5, 10, 25]
    vals = [1, 3, 6, 7, 9, 11, 24, 25, 30, 2, 8, 26]
    raw = spark.createDataFrame([(v,) for v in vals], "lat long")
    expect = {
        r["q_ppm"]: r["value_fp"]
        for r in histogram_quantiles(raw, "lat", les).collect()
    }
    # two scrapes: t=1000 all-zero, t=2000 the full cumulative counts
    def cum(le):
        return sum(1 for v in vals if v <= le)

    rows = [(str(le), 1000, 0) for le in les] + [("+Inf", 1000, 0)]
    rows += [(str(le), 2000, cum(le)) for le in les] + [
        ("+Inf", 2000, len(vals))
    ]
    scr = spark.createDataFrame(rows, "le string, ts_ms long, value long")
    got = {
        r["q_ppm"]: r["value_fp"]
        for r in windowed_histogram_quantiles(scr, les, 0, 2000).collect()
    }
    assert got == expect


def test_windowed_quantiles_empty_window_yields_no_rows(spark):
    """A panel range with no rateable scrape pair (fresh target
    scraped once) must yield NO rows — PromQL's NaN — never a
    divide-by-zero crash."""
    from cassandra_data_migration_spark.streaming.histograms import (
        windowed_histogram_quantiles,
    )

    rows = [("10", 1000, 5), ("20", 1000, 9), ("+Inf", 1000, 10)]
    df = spark.createDataFrame(rows, "le string, ts_ms long, value long")
    out = windowed_histogram_quantiles(df, [10, 20], 0, 1000)
    assert out.collect() == []
