"""Driver-contract package: the per-family split of the former
monolithic ``__spark_entry__.py`` (round-8 modularity item).

Part modules register into the shared ``_registry.QUERIES``/``ORACLES``
dicts in chain order (each part star-imports its predecessor, so the
original single-namespace evaluation order is preserved exactly);
this ``__init__`` applies the driver-window rotation and exposes the
three contract functions ``entry`` / ``queries`` / ``oracle_sql``.
``__spark_entry__`` is a thin re-export over this package.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdm_entry._registry import ORACLES, QUERIES, export_all
from cdm_entry.part14_round10 import *  # noqa: F401,F403 — chain end

# Driver-window rotation: the driver hash-checks the FIRST 50
# queries() entries each round.  Round-11 head = this round's changed
# or re-measured queries (the scaled-bucket/salted joins, the
# pin-restructured exact-Jaccard family and every consumer of the
# hard-capped bounded_bucket_pairs, the null-hardened stabbing sweep,
# the warning-instrumented routed cosine tier, the three
# noise-adjudicated movers), then the core reference S/P/J/A/F
# families the window has not sampled since round 7 so the driver's
# cumulative union keeps growing.
_ROUND_HEAD: list[str] = [
    # dedup family ordered as in the r10 window (pair generators
    # before prefix_filter_pairs): the FIRST dedup query in a bench
    # run absorbs the family's cold-JIT/codegen start (measured
    # +1.5-2.5 s on whichever runs first), so keeping the absorber
    # constant is what makes the per-query numbers comparable
    # round-over-round
    "salted_join", "bucketed_join", "dup_clusters",
    "dedup_survivors", "dedup_ngram_jaccard", "minhash_lsh_dedup",
    "lsh_candidates", "ann_lsh_pairs", "prefix_filter_pairs",
    "in_transit_orders", "embedding_near_dup", "mmr_diverse_select",
    "histogram_quantile_rated", "stream_cow_upsert",
    "full_scan", "projection", "filter_eq", "token_range_filter",
    "point_lookup", "grouped_count", "writetime_filter",
    "guardrail_violations", "paged_fetch_audit",
    "missing_rows", "mismatch_detect", "reconcile_rows",
    "bucket_count_compare", "fk_join_enrich", "autocorrect_lww",
    "validation_summary", "latency_percentiles", "windowed_rate",
    "latest_event_per_user", "union_summary", "value_set_diff",
    "traffic_summary", "alert_error_windows",
    "continuous_validation_ticks", "lab_migration_report",
    "string_funcs", "date_funcs", "round_cast", "row_hash",
    "json_extract", "map_explode", "ttl_expiry", "null_unset_mask",
    "custom_transform", "uuid_derivation", "synthetic_users",
]
assert len(_ROUND_HEAD) == len(set(_ROUND_HEAD)) == 50

_missing_head = [k for k in _ROUND_HEAD if k not in QUERIES]
assert not _missing_head, f"unregistered _ROUND_HEAD names: {_missing_head}"
_ROTATED: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **{k: QUERIES[k] for k in _ROUND_HEAD},
    **{k: v for k, v in QUERIES.items() if k not in set(_ROUND_HEAD)},
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")  # noqa: F405


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_ROTATED)


def oracle_sql() -> dict[str, str]:
    sf_dir = os.environ.get("CDM_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    out = dict(ORACLES)
    out["bpe_vocab"] = _bpe_oracle_sql(sf_dir)  # noqa: F405
    out["bpe_vocab_persisted"] = _bpe_oracle_sql(sf_dir)  # noqa: F405
    out["bpe_pack_pipeline"] = _bpe_pack_oracle_sql(sf_dir)  # noqa: F405
    out["rowgroup_stats"] = _rowgroup_stats_oracle()  # noqa: F405
    out["html_extract"] = _html_extract_oracle()  # noqa: F405
    out["warc_ingest"] = _warc_ingest_oracle()  # noqa: F405
    return out


__all__ = export_all(globals())
