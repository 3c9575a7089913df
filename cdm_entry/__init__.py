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
# queries() entries each round.  Round-10 head = this round's new or
# re-planned queries (the pair-producing range join under its own
# oracle, the in-transit stabbing sweep, the tier-routed cosine
# near-dup, the fused/rebanded dedup pair generators and their
# downstream consumers), then the four sub-2s movers round 9 asked to
# re-measure, then older families the window has not sampled since
# their round (file roundtrips, migrate/throttle, text-quality,
# sampling) so the driver's union keeps growing.
_ROUND_HEAD: list[str] = [
    "range_join_pairs", "in_transit_orders", "embedding_near_dup",
    "ann_lsh_pairs", "dedup_ngram_jaccard", "prefix_filter_pairs",
    "dup_clusters", "dedup_survivors", "minhash_lsh_dedup",
    "lsh_candidates", "lsh_index_incremental", "incremental_dedup",
    "semantic_dedup", "simhash", "dedup_exact", "minhash_signatures",
    "stream_windowed_rate", "observe_progress", "stream_dual_write",
    "schema_diff",
    "csv_roundtrip", "csv_gzip_roundtrip", "json_roundtrip",
    "xml_roundtrip", "csv_import_quarantine", "orc_roundtrip",
    "fixed_width_roundtrip",
    "migrate_pipeline", "migrate_bulk", "migrate_dry_run",
    "write_batches", "run_tracker_resume", "throttle_schedule",
    "throttled_stream_pacing",
    "token_count", "text_quality", "lang_id", "doc_fingerprint",
    "dup_ngram_fraction", "zipf_head_coverage", "winnow_fingerprints",
    "substring_dup_spans", "ngram_novelty", "source_overlap",
    "corpus_sample", "mixture_sample", "temperature_mixture",
    "weighted_sample", "hash_split_counts", "line_dedup_docs",
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
