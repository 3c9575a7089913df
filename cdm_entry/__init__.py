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
from cdm_entry.part13_round9 import *  # noqa: F401,F403 — chain end

# Driver-window rotation: the driver hash-checks the FIRST 50
# queries() entries each round.  Round-9 head = this round's new
# queries (persisted PQ/SQ8 artifacts), then the queries whose plans
# changed (the bounded-bucket dedup pair generators and everything
# downstream of them, the folded stream_irate clamp), then the round-8
# head families the window has sampled only once (liveness, IVF/BPE
# artifacts, PromQL exactness), then older entries outside every prior
# head (lakehouse, graph, sketches, OLAP, ZDM) so the driver's union
# keeps growing.
_ROUND_HEAD: list[str] = [
    "pq_index_persist", "pq_probe_persisted", "sq8_bounds_persist",
    "sq8_topk_persisted",
    "dedup_ngram_jaccard", "prefix_filter_pairs", "dup_clusters",
    "dedup_survivors", "minhash_lsh_dedup", "lsh_candidates",
    "stream_irate", "connector_scan", "connector_write_audit",
    "alert_node_down", "stream_node_down", "ivf_index_persist",
    "ivf_index_probe", "ivf_index_append", "bpe_vocab_persisted",
    "classifier_auc", "prom_rate_reconstruct", "histogram_percentiles",
    "histogram_quantile_rated", "repair_pipeline_pruned",
    "prom_counter_irate", "prom_gauge_deriv",
    "rowgroup_stats", "semantic_decontaminate",
    "cow_merge_upsert", "snapshot_changes_feed", "cow_time_travel",
    "domain_pagerank", "domain_triangles",
    "domain_k_core", "domain_bfs_hops", "hll_distinct",
    "kmv_set_ops", "cms_token_counts", "mg_heavy_hitters",
    "pricing_summary", "part_type_revenue", "top_value_parts",
    "order_priority_check", "shipping_priority", "local_quorum_repair",
    "replica_ownership_nts", "zdm_phase_walkthrough", "read_routing",
    "lww_merge", "stream_cell_lww",
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
