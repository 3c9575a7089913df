"""Cell-level Cassandra semantics: compaction, quorum read repair, LWT replay, per-cell TTL.

Split from the monolithic __spark_entry__.py; the part chain
(star-import of the previous part) preserves the original single-
namespace evaluation order, and ``register_queries`` re-derives the
``"name": q_name`` registry the monolith kept as one literal.
"""
from __future__ import annotations

from cdm_entry.part08_bpe_oracles import *  # noqa: F401,F403

# --- round-10 additions: cell-level Cassandra semantics -------------------
# (sstable-merge compaction, quorum read repair, LWT/CAS replay —
# operators/cells.py; reference parity: per-cell writetime treatment in
# docs/04-cdm-approach.md:401-434 and the public Cassandra
# reconciliation order)


def _event_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events reinterpreted as a CELL-VERSION log (deterministically,
    so the DuckDB twin rebuilds the identical input): pk=user_id,
    column=event_type, value in integer cents, writetime=epoch µs;
    every 17th event is a cell tombstone, every 97th a row tombstone."""
    from cassandra_data_migration_spark.operators.cells import ROW_TOMBSTONE

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("pk"),
        F.when(
            F.pmod("event_id", F.lit(97)) == 0, F.lit(ROW_TOMBSTONE)
        )
        .otherwise(F.col("event_type"))
        .alias("column_name"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("value_cents"),
        F.unix_micros("ts").alias("writetime_us"),
        (F.pmod("event_id", F.lit(17)) == 0).alias("is_tombstone"),
    )


_CELLS_SQL = """
    SELECT user_id AS pk,
           CASE WHEN event_id % 97 = 0 THEN '__row__'
                ELSE event_type END AS column_name,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
           epoch_us(ts) AS writetime_us,
           (event_id % 17 = 0) AS is_tombstone
    FROM events
"""

_CELL_TTL_S = 7 * 86400  # every 5th cell carries a 7-day TTL


def _event_cells_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cells fixture with per-cell TTL: every 5th event's cell
    expires 7 days after its writetime (events span 30 days, so the
    TTL'd population splits into expired-and-past-grace /
    expired-in-grace / still-live)."""
    return _event_cells(spark, sf_dir).withColumn(
        "ttl_s",
        F.when(
            F.pmod(F.col("writetime_us"), F.lit(5)) == 0,
            F.lit(_CELL_TTL_S),
        ).cast("long"),
    )


# keyed on writetime so the SQL twin needs no second event_id pass
_CELLS_TTL_SQL = f"""
    SELECT *,
           CASE WHEN writetime_us % 5 = 0
                THEN CAST({_CELL_TTL_S} AS BIGINT) END AS ttl_s
    FROM ({_CELLS_SQL})
"""


def q_cell_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sstable-merge semantics at CELL granularity: per (key, column)
    # LWW with tombstone-beats-live tie-break, row tombstones shadow
    # older cells — the live view a major compaction produces
    from cassandra_data_migration_spark.operators.cells import (
        cell_lww_compact,
    )

    return cell_lww_compact(
        _event_cells(spark, sf_dir), value_col="value_cents"
    )


ORACLES_CELL_COMPACTION = f"""
    WITH cells AS ({_CELLS_SQL}),
    winners AS (
        SELECT pk, column_name, value_cents, writetime_us, is_tombstone,
               ROW_NUMBER() OVER (
                   PARTITION BY pk, column_name
                   ORDER BY writetime_us DESC, is_tombstone DESC,
                            value_cents DESC) AS rn
        FROM cells WHERE column_name <> '__row__'
    ),
    row_tombs AS (
        SELECT pk, MAX(writetime_us) AS row_tomb_wt
        FROM cells WHERE column_name = '__row__' GROUP BY pk
    )
    SELECT w.pk, w.column_name, w.value_cents, w.writetime_us
    FROM winners w LEFT JOIN row_tombs r USING (pk)
    WHERE w.rn = 1 AND NOT w.is_tombstone
      AND (r.row_tomb_wt IS NULL OR w.writetime_us > r.row_tomb_wt)
"""


def _event_replicas(
    spark: SparkSession, sf_dir: str
) -> list[DataFrame]:
    """Three deterministic replica views of events keyed by event_id:
    r0 pristine; r1 missing every 10th row and holding a NEWER write
    (+1 s, +1 cent) for every 7th; r2 corrupted (+5 cents, same
    writetime) on every 13th — the three divergence modes read repair
    must detect (miss, stale, timestamp-tie corruption)."""
    base = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("wt_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("value_cents"),
    )
    r0 = base
    r1 = base.filter(F.pmod("event_id", F.lit(10)) != 0).select(
        "event_id",
        F.when(
            F.pmod("event_id", F.lit(7)) == 0, F.col("wt_us") + 1_000_000
        )
        .otherwise(F.col("wt_us"))
        .alias("wt_us"),
        F.when(
            F.pmod("event_id", F.lit(7)) == 0, F.col("value_cents") + 1
        )
        .otherwise(F.col("value_cents"))
        .alias("value_cents"),
    )
    r2 = base.select(
        "event_id",
        "wt_us",
        F.when(
            F.pmod("event_id", F.lit(13)) == 0, F.col("value_cents") + 5
        )
        .otherwise(F.col("value_cents"))
        .alias("value_cents"),
    )
    return [r0, r1, r2]


def q_quorum_read_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # coordinator-side read repair across RF=3: per-key LWW winner
    # (writetime, then value on ties — the public reconciliation
    # order) and how many replicas hold something else
    from cassandra_data_migration_spark.operators.cells import (
        quorum_read_repair,
    )

    return quorum_read_repair(
        _event_replicas(spark, sf_dir), "event_id", "value_cents", "wt_us"
    )


_REPLICAS_SQL = """
    base AS (
        SELECT event_id, epoch_us(ts) AS wt_us,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
        FROM events
    ),
    tagged AS (
        SELECT event_id, wt_us, value_cents FROM base
        UNION ALL
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN wt_us + 1000000
                    ELSE wt_us END,
               CASE WHEN event_id % 7 = 0 THEN value_cents + 1
                    ELSE value_cents END
        FROM base WHERE event_id % 10 <> 0
        UNION ALL
        SELECT event_id, wt_us,
               CASE WHEN event_id % 13 = 0 THEN value_cents + 5
                    ELSE value_cents END
        FROM base
    )
"""

ORACLES_QUORUM_READ_REPAIR = f"""
    WITH {_REPLICAS_SQL},
    per_key AS (
        SELECT event_id,
               MAX(struct_pack(wt := wt_us, val := value_cents)) AS win,
               COUNT(*) AS n_replicas_present
        FROM tagged GROUP BY event_id
    ),
    current AS (
        SELECT t.event_id, COUNT(*) AS n_current
        FROM tagged t JOIN per_key p USING (event_id)
        WHERE t.wt_us = p.win.wt AND t.value_cents = p.win.val
        GROUP BY t.event_id
    )
    SELECT p.event_id,
           p.win.val AS winner_value_cents,
           p.win.wt AS winner_wt_us,
           p.n_replicas_present,
           CAST(3 - COALESCE(c.n_current, 0) AS BIGINT) AS n_stale
    FROM per_key p LEFT JOIN current c USING (event_id)
    WHERE 3 - COALESCE(c.n_current, 0) > 0
"""


def q_cas_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LWT outcome fold: per-user op log replayed in (ts, event_id)
    # order — every 3rd op unconditional, the rest IF value = expected
    # over a small state domain so both outcomes occur
    from cassandra_data_migration_spark.operators.cells import cas_replay

    ops = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").alias("seq"),
        F.when(
            F.pmod("event_id", F.lit(3)) == 0, F.lit(None).cast("long")
        )
        .otherwise(F.pmod(F.col("event_id") * 7, F.lit(8)))
        .alias("expected"),
        F.pmod(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            F.lit(8),
        ).alias("new_value"),
    )
    return cas_replay(
        ops, "user_id", "ts_us", "seq", "expected", "new_value"
    )


# NOTE: deliberately a RECURSIVE CTE, not DuckDB's list_reduce —
# list_reduce in DuckDB 1.0 returns wrong folds when evaluated over
# many grouped rows at once (verified: correct for a single user,
# corrupt in the full-table query), so the oracle steps the CAS state
# machine one op-index per recursion level instead.
ORACLES_CAS_REPLAY = """
    WITH RECURSIVE ops AS (
        SELECT user_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS rn,
               CASE WHEN event_id % 3 = 0 THEN NULL
                    ELSE CAST((event_id * 7) % 8 AS BIGINT) END AS exp,
               CAST(floor(value * 100 + 0.5) AS BIGINT) % 8 AS nv
        FROM events
    ),
    sim AS (
        SELECT user_id, CAST(0 AS BIGINT) AS rn,
               CAST(NULL AS BIGINT) AS cur,
               CAST(0 AS BIGINT) AS applied,
               CAST(0 AS BIGINT) AS rejected
        FROM (SELECT DISTINCT user_id FROM ops)
        UNION ALL
        SELECT s.user_id, s.rn + 1,
               CASE WHEN o.exp IS NULL OR o.exp = s.cur
                    THEN o.nv ELSE s.cur END,
               s.applied + CASE WHEN o.exp IS NULL OR o.exp = s.cur
                                THEN 1 ELSE 0 END,
               s.rejected + CASE WHEN o.exp IS NULL OR o.exp = s.cur
                                 THEN 0 ELSE 1 END
        FROM sim s JOIN ops o
          ON o.user_id = s.user_id AND o.rn = s.rn + 1
    )
    SELECT s.user_id, s.cur AS final_value,
           s.applied AS n_applied, s.rejected AS n_rejected
    FROM sim s
    JOIN (SELECT user_id, MAX(rn) AS last_rn FROM ops GROUP BY user_id) z
      ON z.user_id = s.user_id AND z.last_rn = s.rn
"""

QUERIES["cell_compaction"] = q_cell_compaction
QUERIES["quorum_read_repair"] = q_quorum_read_repair
QUERIES["cas_replay"] = q_cas_replay
ORACLES["cell_compaction"] = ORACLES_CELL_COMPACTION
ORACLES["quorum_read_repair"] = ORACLES_QUORUM_READ_REPAIR
ORACLES["cas_replay"] = ORACLES_CAS_REPLAY




register_queries(globals())
__all__ = export_all(globals())
