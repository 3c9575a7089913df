"""zdm-config.yml drop-in surface (lab/zdm-config/zdm-config.yml) —
the ZDM-proxy twin of ``plans/properties.py``'s cdm.properties
loader.

The shipped config is a FLAT ``key: value`` YAML subset (comments +
scalars, no nesting), so a dependency-free parser covers it exactly;
values coerce to int/bool where they look like one.  The keys that
drive behavior here map onto the streaming modules:

- ``read_mode`` / ``primary_cluster`` → :class:`streaming.routing.ReadRouter`
  (zdm-config.yml:27-33);
- ``metrics_enabled`` → attach :class:`RouterMetrics`
  (zdm-config.yml:38-40);
- connection/rate keys (contact points, ports, max connections) are
  surfaced verbatim for the sink layer — in this parquet stand-in
  they are carried, not dialed.
"""

from __future__ import annotations

from cassandra_data_migration_spark.streaming.routing import (
    Cluster,
    ReadMode,
    ReadRouter,
    RouterMetrics,
)


def _coerce(v: str):
    s = v.strip().strip("'\"")
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(s)
    except ValueError:
        return s


def load_zdm_config(path: str) -> dict:
    """Parse the flat ``key: value`` YAML subset the ZDM proxy ships.
    Comments and blank lines are skipped; unknown keys are preserved
    (the proxy tolerates and so do we)."""
    cfg: dict = {}
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            if val.strip() == "":
                continue  # nested block header — not used by the lab file
            cfg[key.strip()] = _coerce(val)
    return cfg


def router_from_zdm_config(cfg: dict) -> ReadRouter:
    """Build the read router exactly as the proxy would from its
    config keys; metrics attach when ``metrics_enabled`` is true."""
    return ReadRouter(
        read_mode=ReadMode(cfg.get("read_mode", "PRIMARY_ONLY")),
        primary_cluster=Cluster(cfg.get("primary_cluster", "ORIGIN")),
        metrics=RouterMetrics() if cfg.get("metrics_enabled") else None,
    )
