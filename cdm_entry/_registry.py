"""Shared query/oracle registries for the split driver contract.

The monolithic ``__spark_entry__.py`` grew ~1,000 lines per round; the
``cdm_entry`` package splits it into per-family part modules chained
by star-imports (each part sees the full namespace built so far, so
the original single-file evaluation order — helper reuse, oracle
fragments, the streaming state-wrapper rebind loop — is preserved
exactly).  These two dicts are the single shared registry every part
mutates; ``cdm_entry/__init__`` applies the driver-window rotation and
exposes ``entry``/``queries``/``oracle_sql``.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def register_queries(ns: dict) -> None:
    """Register every ``q_<name>`` function DEFINED in the calling
    part module under key ``<name>`` — the naming contract the
    monolith's literal registry followed for all 284 entries (audited:
    zero exceptions).  ``setdefault`` so explicit registrations inside
    a part body (wrapped streaming queries, non-q callables) are never
    clobbered by the part's own footer."""
    mod = ns.get("__name__")
    for k, v in list(ns.items()):
        if (
            k.startswith("q_")
            and callable(v)
            and getattr(v, "__module__", None) == mod
        ):
            QUERIES.setdefault(k[2:], v)


def export_all(ns: dict) -> list[str]:
    """__all__ for a part module: every non-dunder top-level name,
    underscore-prefixed helpers included — the next part in the chain
    star-imports them, reproducing the monolith's shared namespace."""
    return [k for k in ns if not k.startswith("__")]
