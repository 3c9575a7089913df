"""Metrics export surface: Prometheus text exposition format.

The reference ships a full Prometheus + Grafana stack
(lab/monitoring/prometheus.yml, grafana-dashboards/
zdm-proxy-dashboard.json) scraping proxy counters like
``zdm_proxy_failed_writes_total{failed_on=...}`` and
``zdm_proxy_request_duration_seconds_*``.  This engine already
COMPUTES every metric those dashboards chart (DualWriteMetrics,
RouterMetrics, windowed rates, threshold alerts); what was missing
was the sink adapter emitting them to a metrics store.  This module
renders the engine's metric objects to the Prometheus text exposition
format (version 0.0.4 — the stable, universally-scraped one) and can
serve them over HTTP for a scrape target.

Pure rendering + stdlib HTTP only: no client library dependency, and
everything is unit-testable without a Prometheus server.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _escape_label(v: object) -> str:
    """Prometheus text exposition label escaping: backslash, double
    quote AND newline (an unescaped newline breaks the whole /metrics
    scrape, not just one sample)."""
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
    )


def _fmt_labels(labels: dict[str, str] | None) -> str:
    if not labels:
        return ""
    inner = ",".join(
        f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
    )
    return "{" + inner + "}"


def render_metric(
    name: str,
    value: float,
    labels: dict[str, str] | None = None,
    help_text: str | None = None,
    metric_type: str = "counter",
    include_header: bool = True,
) -> str:
    """One metric line (plus optional # HELP/# TYPE header)."""
    lines = []
    if include_header:
        if help_text:
            lines.append(f"# HELP {name} {help_text}")
        lines.append(f"# TYPE {name} {metric_type}")
    v = int(value) if float(value).is_integer() else value
    lines.append(f"{name}{_fmt_labels(labels)} {v}")
    return "\n".join(lines)


def render_dual_write(m, prefix: str = "cdm_spark") -> str:
    """DualWriteMetrics -> exposition text, mirroring the proxy's
    metric family shapes (``..._failed_writes_total{failed_on=...}``,
    zdm-proxy-dashboard.json)."""
    out = [
        render_metric(
            f"{prefix}_batches_total",
            m.batches,
            help_text="micro-batches processed by the dual writer",
        ),
        render_metric(
            f"{prefix}_rows_written_total",
            m.rows_origin,
            {"cluster": "origin"},
            help_text="rows written per cluster",
        ),
        render_metric(
            f"{prefix}_rows_written_total",
            m.rows_target,
            {"cluster": "target"},
            include_header=False,
        ),
    ]
    first = True
    for route, n in sorted(m.failed_on.items()):
        out.append(
            render_metric(
                f"{prefix}_failed_writes_total",
                n,
                {"failed_on": route},
                help_text="failed writes by route",
                include_header=first,
            )
        )
        first = False
    return "\n".join(out)


def render_router(m, prefix: str = "cdm_spark") -> str:
    """RouterMetrics -> exposition text (reads per cluster + shadow
    compare counters)."""
    out = [
        render_metric(
            f"{prefix}_reads_total",
            m.reads_origin,
            {"cluster": "origin"},
            help_text="reads served per cluster",
        ),
        render_metric(
            f"{prefix}_reads_total",
            m.reads_target,
            {"cluster": "target"},
            include_header=False,
        ),
        render_metric(
            f"{prefix}_shadow_reads_total",
            m.shadow_reads,
            help_text="shadow reads dispatched to the secondary",
        ),
        render_metric(
            f"{prefix}_shadow_compared_total",
            m.shadow_compared,
            help_text="shadow reads actually compared (sampled)",
        ),
        render_metric(
            f"{prefix}_shadow_mismatches_total",
            m.shadow_mismatches,
            help_text="shadow comparisons that differed",
        ),
    ]
    return "\n".join(out)


def render_query_progress(progress: dict, prefix: str = "cdm_spark") -> str:
    """One StreamingQuery progress event (``q.lastProgress``) ->
    gauges: input/processed rates, batch duration, state rows.  This
    is the per-scrape surface a Grafana 'streaming health' dashboard
    reads — rates chart directly without a PromQL ``rate()`` because
    Spark already computes them per trigger."""
    labels = {"query": progress.get("name") or progress.get("id", "unknown")}
    out = [
        render_metric(
            f"{prefix}_stream_input_rows_per_second",
            progress.get("inputRowsPerSecond", 0.0) or 0.0,
            labels,
            help_text="source rows/s this trigger",
            metric_type="gauge",
        ),
        render_metric(
            f"{prefix}_stream_processed_rows_per_second",
            progress.get("processedRowsPerSecond", 0.0) or 0.0,
            labels,
            help_text="processed rows/s this trigger",
            metric_type="gauge",
        ),
        render_metric(
            f"{prefix}_stream_batch_duration_ms",
            (progress.get("durationMs") or {}).get("triggerExecution", 0),
            labels,
            help_text="trigger execution time",
            metric_type="gauge",
        ),
    ]
    state_rows = sum(
        op.get("numRowsTotal", 0) for op in progress.get("stateOperators", [])
    )
    out.append(
        render_metric(
            f"{prefix}_stream_state_rows",
            state_rows,
            labels,
            help_text="total state-store rows",
            metric_type="gauge",
        )
    )
    return "\n".join(out)


def render_histogram(
    name: str,
    buckets: list[tuple[str, int]],
    sum_value: float,
    labels: dict[str, str] | None = None,
    help_text: str | None = None,
) -> str:
    """A full histogram family in exposition format:
    ``<name>_bucket{le=...}`` per CUMULATIVE bucket (the '+Inf'
    bucket is mandatory and equals ``_count``), then ``_sum`` and
    ``_count`` — the exact series the reference's Grafana boards feed
    into ``histogram_quantile``
    (lab/exercises/06-validation-monitoring.md:455-497).

    ``buckets`` is [(le_string, cumulative_count)] in ascending le
    order ending with '+Inf' (the shape
    ``streaming.histograms.cumulative_histogram`` emits)."""
    if not buckets or buckets[-1][0] != "+Inf":
        raise ValueError("histogram buckets must end with '+Inf'")
    lines = []
    if help_text:
        lines.append(f"# HELP {name} {help_text}")
    lines.append(f"# TYPE {name} histogram")
    base = dict(labels or {})
    for le, cum in buckets:
        lines.append(
            f"{name}_bucket{_fmt_labels({**base, 'le': le})} {cum}"
        )
    count = buckets[-1][1]
    s = int(sum_value) if float(sum_value).is_integer() else sum_value
    lines.append(f"{name}_sum{_fmt_labels(base)} {s}")
    lines.append(f"{name}_count{_fmt_labels(base)} {count}")
    return "\n".join(lines)


class MetricsEndpoint:
    """A /metrics scrape target over registered render callables.

    ``register(fn)`` adds a zero-arg callable returning exposition
    text; each scrape concatenates all of them.  Serves on a
    background thread; ``close()`` shuts it down.  Deployment shape:
    one endpoint per driver, scraped by the same prometheus.yml the
    reference ships."""

    def __init__(self, port: int = 0):
        self._renderers: list = []
        renderers = self._renderers

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — stdlib API name
                if self.path != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                body = (
                    "\n".join(fn() for fn in renderers) + "\n"
                ).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self._srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )
        self._thread.start()

    def register(self, renderer) -> None:
        self._renderers.append(renderer)

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
