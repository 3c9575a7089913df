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
