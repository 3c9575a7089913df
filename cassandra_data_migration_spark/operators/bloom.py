"""Bloom-filter membership: a compact, rebuildable fingerprint of a
key set, probed scan-side with zero false negatives and a tunable
false-positive rate.

Why it is a first-class operator here: the reference's validation
path probes the target cluster per origin row (missing-row detection,
lab/scripts/validate_migration.py:49-67 — re-expressed as the J1
anti-join in ``operators/joins.py``).  At 100 TB the cheaper first
pass is a Bloom probe: build the filter over the small/changed side
once, prune the big scan to probable members, and only the survivors
reach the exact join — the same runtime-bloom-pruning trick Spark's
own optimizer applies inside one query
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), made explicit
so the filter can persist ACROSS runs (e.g. an incremental-dedup
fingerprint set probed by every new batch).

Hashes are md5-derived (``functions/hashing.md5_draw``) rather than
xxhash so any engine — including the DuckDB oracle — recomputes the
identical bit set; determinism beats the ~3x hash-speed win at this
layer, and k draws per value stay scan-side codegen.

Physical plan: the build is one distinct-aggregate (map-side combine;
the shuffle carries set bits, bounded by ``num_bits``); the bit set
re-enters as a 1-row broadcast array and probing is pure scan-stage
arithmetic — no join, no shuffle.  A sorted int array of ≤2^20 set
bits is ≤4 MB broadcast; beyond that, pack bits into an
``array<long>`` bitmap (num_bits/64 words) and probe with
bit-shifts, identical dataflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.functions.hashing import md5_draw, md5_draw_sql

NUM_BITS = 1 << 13
NUM_HASHES = 4


def bloom_positions(
    col: str,
    num_hashes: int = NUM_HASHES,
    num_bits: int = NUM_BITS,
    salt: str = "bloom",
) -> Column:
    """The k bit positions a value sets/probes: independent md5 draws
    (one per hash seed) reduced mod ``num_bits``, as an array column."""
    return F.array(
        *[md5_draw(f"{salt}:{i}", col) % num_bits for i in range(num_hashes)]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    num_hashes: int = NUM_HASHES,
    num_bits: int = NUM_BITS,
    salt: str = "bloom",
) -> DataFrame:
    """Distributed build: the distinct set bits of every key in
    ``df[col]``, one ``pos`` row per set bit.  Persist this (≤num_bits
    rows regardless of input size) to reuse the filter across runs."""
    return (
        df.select(F.explode(bloom_positions(col, num_hashes, num_bits, salt)).alias("pos"))
        .distinct()
    )


def bloom_might_contain(
    candidates: DataFrame,
    bloom: DataFrame,
    col: str,
    num_hashes: int = NUM_HASHES,
    num_bits: int = NUM_BITS,
    salt: str = "bloom",
    out: str = "might_contain",
) -> DataFrame:
    """Probe: 1 iff every one of the value's k positions is set.
    Members always probe 1 (no false negatives); non-members probe 1
    with probability ≈ fill_ratio^k.  The bit set joins in as a 1-row
    broadcast sorted array, so the probe is scan-side ``forall`` +
    ``array_contains`` — no shuffle on the candidate side."""
    bits = bloom.agg(F.sort_array(F.collect_set("pos")).alias("_bits"))
    probe = bloom_positions(col, num_hashes, num_bits, salt)
    return (
        candidates.crossJoin(F.broadcast(bits))
        .withColumn(
            out,
            F.forall(probe, lambda p: F.array_contains(F.col("_bits"), p)).cast(
                "int"
            ),
        )
        .drop("_bits")
    )


def bloom_prune(
    candidates: DataFrame,
    bloom: DataFrame,
    col: str,
    num_hashes: int = NUM_HASHES,
    num_bits: int = NUM_BITS,
    salt: str = "bloom",
) -> DataFrame:
    """Join-pruning form: keep only probable members.  Place this
    before an exact join/anti-join so the shuffle carries only
    survivors (member fraction + FP rate of the input instead of all
    of it)."""
    flagged = bloom_might_contain(
        candidates, bloom, col, num_hashes, num_bits, salt
    )
    return flagged.filter(F.col("might_contain") == 1).drop("might_contain")


def bloom_positions_sql(
    col: str,
    num_hashes: int = NUM_HASHES,
    num_bits: int = NUM_BITS,
    salt: str = "bloom",
) -> list[str]:
    """DuckDB twins of :func:`bloom_positions`, kept beside it so the
    two definitions cannot drift."""
    return [
        f"({md5_draw_sql(f'{salt}:{i}', col)} % {num_bits})"
        for i in range(num_hashes)
    ]
