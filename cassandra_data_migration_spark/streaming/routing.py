"""Z2/Z4: read routing modes + the 5-phase migration state machine.

The proxy routes reads by ``read_mode`` / ``primary_cluster``
(lab/zdm-config/zdm-config.yml:27-33; docs/05-zdm-approach.md:116-121,
279-281): PRIMARY_ONLY, DUAL_ASYNC_ON_SECONDARY (async shadow reads,
results only metered), TARGET_ONLY.  Phases flip these configs over
the migration lifecycle (docs/05-zdm-approach.md:323-539).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame


class ReadMode(str, Enum):
    PRIMARY_ONLY = "PRIMARY_ONLY"
    DUAL_ASYNC_ON_SECONDARY = "DUAL_ASYNC_ON_SECONDARY"
    TARGET_ONLY = "TARGET_ONLY"


class Cluster(str, Enum):
    ORIGIN = "ORIGIN"
    TARGET = "TARGET"


@dataclass
class RouterMetrics:
    reads_origin: int = 0
    reads_target: int = 0
    shadow_reads: int = 0
    shadow_compared: int = 0
    shadow_mismatches: int = 0


@dataclass
class ReadRouter:
    """Route a read against (origin, target) DataFrames per proxy
    config.  Shadow reads run the same plan on the secondary and are
    only compared/metered — never returned.

    The reference proxy's DUAL_ASYNC_ON_SECONDARY shadow reads are
    fire-and-forget (docs/05-zdm-approach.md:116-121): they must not
    sit on the response path.  The comparison here is therefore

    - ONE Spark action per compared read (the two ``exceptAll``
      directions unioned under a single ``isEmpty`` — a LocalLimit(1)
      probe, not two full counts);
    - SAMPLED: ``shadow_compare_every=k`` compares 1 read in k
      (every shadow read is still metered);
    - optionally ASYNC: pass ``shadow_executor`` (e.g. a
      ``ThreadPoolExecutor``) and the compare job is submitted off the
      caller's thread — Spark job submission is thread-safe, so the
      primary result returns immediately.  ``drain_shadow()`` joins
      outstanding compares (tests call it for determinism).
    """

    read_mode: ReadMode = ReadMode.PRIMARY_ONLY
    primary_cluster: Cluster = Cluster.ORIGIN
    metrics: RouterMetrics | None = None
    shadow_compare_every: int = 1
    shadow_executor: object | None = None  # concurrent.futures.Executor

    def __post_init__(self) -> None:
        self._pending: list = []

    def _primary(self, origin: DataFrame, target: DataFrame) -> DataFrame:
        return origin if self.primary_cluster == Cluster.ORIGIN else target

    def _secondary(self, origin: DataFrame, target: DataFrame) -> DataFrame:
        return target if self.primary_cluster == Cluster.ORIGIN else origin

    def _compare(self, result: DataFrame, shadow: DataFrame) -> None:
        m = self.metrics
        if m:
            m.shadow_compared += 1
            # one action: symmetric difference probed with isEmpty
            # (LocalLimit 1 — stops at the first differing row)
            diff = shadow.exceptAll(result).unionAll(result.exceptAll(shadow))
            if not diff.isEmpty():
                m.shadow_mismatches += 1

    def drain_shadow(self) -> None:
        """Join any async shadow compares still in flight."""
        pending, self._pending = self._pending, []
        for fut in pending:
            fut.result()

    def route(self, origin: DataFrame, target: DataFrame, query) -> DataFrame:
        """``query`` is a DataFrame→DataFrame callable (the read)."""
        m = self.metrics
        if self.read_mode == ReadMode.TARGET_ONLY:
            if m:
                m.reads_target += 1
            return query(target)
        primary = self._primary(origin, target)
        if m:
            if primary is origin:
                m.reads_origin += 1
            else:
                m.reads_target += 1
        result = query(primary)
        if self.read_mode == ReadMode.DUAL_ASYNC_ON_SECONDARY:
            shadow = query(self._secondary(origin, target))
            if m:
                m.shadow_reads += 1
                if (m.shadow_reads - 1) % max(1, self.shadow_compare_every):
                    return result  # metered, not compared this time
            if self.shadow_executor is not None:
                self._pending.append(
                    self.shadow_executor.submit(self._compare, result, shadow)
                )
            else:
                self._compare(result, shadow)
        return result


class Phase(str, Enum):
    """docs/05-zdm-approach.md:323-539 / lab/exercises/05-zdm-migration.md:26-33."""

    DUAL_WRITE = "1_dual_write_on"
    BACKFILL = "2_backfill"
    SHADOW_READS = "3_shadow_reads"
    READS_TO_TARGET = "4_reads_to_target"
    DIRECT = "5_direct_to_target"


PHASE_ORDER = list(Phase)

# which router config each phase implies
PHASE_ROUTING: dict[Phase, tuple[ReadMode, Cluster]] = {
    Phase.DUAL_WRITE: (ReadMode.PRIMARY_ONLY, Cluster.ORIGIN),
    Phase.BACKFILL: (ReadMode.PRIMARY_ONLY, Cluster.ORIGIN),
    Phase.SHADOW_READS: (ReadMode.DUAL_ASYNC_ON_SECONDARY, Cluster.ORIGIN),
    Phase.READS_TO_TARGET: (ReadMode.PRIMARY_ONLY, Cluster.TARGET),
    Phase.DIRECT: (ReadMode.TARGET_ONLY, Cluster.TARGET),
}


class PhaseMachine:
    """Z4: driver-held phase state; advancing reconfigures routing and
    says whether dual-write is still required."""

    def __init__(self) -> None:
        self._idx = 0

    @property
    def phase(self) -> Phase:
        return PHASE_ORDER[self._idx]

    @property
    def dual_write_enabled(self) -> bool:
        return self.phase != Phase.DIRECT

    def router(self, metrics: RouterMetrics | None = None) -> ReadRouter:
        mode, primary = PHASE_ROUTING[self.phase]
        return ReadRouter(mode, primary, metrics)

    def advance(self) -> Phase:
        if self._idx + 1 >= len(PHASE_ORDER):
            raise ValueError("already at final phase")
        self._idx += 1
        return self.phase

    def rollback(self) -> Phase:
        """Phases 1-4 are reversible (the proxy still dual-writes);
        phase 5 is the point of no return (docs/05-zdm-approach.md)."""
        if self.phase == Phase.DIRECT:
            raise ValueError("cannot roll back after direct-to-target cutover")
        self._idx = max(0, self._idx - 1)
        return self.phase
