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
from cdm_entry.part12_round8 import *  # noqa: F401,F403 — chain end

# Driver-window rotation: the driver hash-checks the FIRST 50
# queries() entries each round.  Round-8 head = this round's new
# queries (node-down alert, persisted IVF/BPE artifacts), then the
# queries whose semantics or plans changed (folded-rank AUC, the
# promql >=2.50 clamp order, ensureMonotonic histogram quantiles, the
# amortized pruned repair, token-balanced shard writes), then the
# round-7 families the driver window has never sampled (PromQL,
# classifier evaluation, shards, sizing), then 32 older entries
# outside every prior head (cells, attribution, privacy, retrieval,
# text, sampling) so the driver's union keeps growing.
_ROUND_HEAD: list[str] = [
    "alert_node_down", "stream_node_down", "ivf_index_persist",
    "ivf_index_probe", "ivf_index_persist_refined",
    "ivf_index_probe_refined", "ivf_index_append", "bpe_vocab_persisted",
    "classifier_auc", "prom_rate_reconstruct", "histogram_percentiles",
    "histogram_quantile_rated", "repair_pipeline_pruned",
    "training_shards_balanced",
    "prom_counter_irate", "prom_gauge_deriv", "stream_irate",
    "classifier_pr_curve", "classifier_calibration",
    "classifier_auc_by_lang", "training_shards", "migration_sizing_plan",
    "cell_compaction", "quorum_read_repair", "cas_replay",
    "counter_merge", "compaction_audit", "stream_cell_lww",
    "stream_attribution", "stream_merkle_digests", "stream_reservoir",
    "multi_touch_credit", "asof_last_click", "pit_enrich",
    "scd2_history", "retention_cohorts", "growth_accounting",
    "psi_drift", "dp_group_counts", "k_anonymity", "pii_redact",
    "column_encryption", "doremi_weights", "dsir_select",
    "temperature_mixture", "semantic_decontaminate",
    "winnow_fingerprints", "ngram_novelty", "perplexity_buckets",
    "pmi_collocations",
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
