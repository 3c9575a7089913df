"""Token-ring data distribution — Cassandra's placement model
(SURVEY.md §1.3, docs/01-migration-overview.md token ranges) surfaced
as an analytics operator: given a virtual-node ring, which node owns
each row, and how balanced is the ownership?

This is the report a migration plans capacity with (per-node row/byte
ownership before cutover) and the same machinery CDM's
``numParts``/token-range splitting rides on (plans/migrate.py).

Design
------
- Tokens are the portable 60-bit md5 draw (functions/hashing.md5_draw)
  so Spark, DuckDB, and driver-side Python all derive identical ring
  positions — the ring itself is pure data, not engine state.
- The ring is tiny (nodes·vnodes entries) and ships as two aligned
  ARRAY LITERALS (sorted tokens + owner per slot).  Successor lookup
  is ``array_min(filter(tokens, t -> t >= row_token))`` with a
  wraparound coalesce — scan-side, codegen'd, no join, no shuffle for
  the assignment itself; the ownership report is one map-combined
  groupBy over O(nodes) keys.
- At 100 TB the same expression assigns every row without touching
  the exchange; only the per-node aggregates move.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migration_spark.functions.hashing import md5_draw


def _py_token(seed: str, *vals) -> int:
    """Driver-side twin of md5_draw — same string form, same 60 bits."""
    s = ":".join([seed] + [str(v) for v in vals])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def vnode_ring(
    num_nodes: int = 4, vnodes_per_node: int = 16, seed: str = "ring"
) -> list[tuple[int, int]]:
    """[(token, node)] sorted by token: each node claims
    ``vnodes_per_node`` deterministic positions on the ring."""
    entries = [
        (_py_token(seed, n, v), n)
        for n in range(num_nodes)
        for v in range(vnodes_per_node)
    ]
    entries.sort()
    return entries


def token_owner(
    ring: list[tuple[int, int]], key_token: Column
) -> Column:
    """Owning node for a token: the successor vnode on the ring
    (smallest vnode token ≥ key token, wrapping to the ring's first
    vnode).  Pure scan-side array expressions over the ring literals."""
    tokens = F.array(*[F.lit(t) for t, _ in ring])
    nodes = F.array(*[F.lit(n) for _, n in ring])
    succ = F.array_min(F.filter(tokens, lambda t: t >= key_token))
    wrapped = F.coalesce(succ, F.lit(ring[0][0]))
    return F.element_at(nodes, F.array_position(tokens, wrapped).cast("int"))


def ring_ownership(
    df: DataFrame,
    key_col: str,
    num_nodes: int = 4,
    vnodes_per_node: int = 16,
    seed: str = "ring",
) -> DataFrame:
    """(node, n_rows, pct) ownership report over ``df`` keyed by
    ``key_col`` — the pre-cutover balance check.  With vnodes, spread
    concentrates toward 1/num_nodes; the pct column is what capacity
    review reads."""
    ring = vnode_ring(num_nodes, vnodes_per_node, seed)
    tok = md5_draw(seed + ":key", key_col)
    owned = df.select(token_owner(ring, tok).alias("node"))
    total = df.count()
    return (
        owned.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("pct", F.round(F.col("n_rows") / F.lit(total), 4))
    )


def ring_sql(
    table: str,
    key_expr: str,
    num_nodes: int = 4,
    vnodes_per_node: int = 16,
    seed: str = "ring",
) -> str:
    """DuckDB twin of :func:`ring_ownership` (same ring literals)."""
    from cassandra_data_migration_spark.functions.hashing import md5_draw_sql

    ring = vnode_ring(num_nodes, vnodes_per_node, seed)
    tokens = "[" + ", ".join(str(t) for t, _ in ring) + "]"
    nodes = "[" + ", ".join(str(n) for _, n in ring) + "]"
    tok = md5_draw_sql(seed + ":key", key_expr)
    return f"""
        WITH assigned AS (
            SELECT ({nodes})[list_position({tokens},
                       COALESCE(list_min(list_filter({tokens},
                                t -> t >= {tok})), {ring[0][0]}))] AS node
            FROM {table}
        ),
        tot AS (SELECT COUNT(*) AS n FROM {table})
        SELECT node, COUNT(*) AS n_rows,
               ROUND(COUNT(*) * 1.0 / tot.n, 4) AS pct
        FROM assigned, tot
        GROUP BY node, tot.n
    """


def replica_sets(
    ring: list[tuple[int, int]], rf: int = 3
) -> list[tuple[int, list[int]]]:
    """[(token, [owners])] per vnode slot: walk clockwise from each
    vnode collecting the first ``rf`` DISTINCT nodes — Cassandra's
    SimpleStrategy placement.  Driver-side over the tiny ring; the
    result ships to executors as literals."""
    n_slots = len(ring)
    out = []
    for i, (tok, _) in enumerate(ring):
        owners: list[int] = []
        j = i
        while len(owners) < rf and j < i + n_slots:
            node = ring[j % n_slots][1]
            if node not in owners:
                owners.append(node)
            j += 1
        out.append((tok, owners))
    return out


def replica_ownership(
    df: DataFrame,
    key_col: str,
    num_nodes: int = 4,
    vnodes_per_node: int = 16,
    rf: int = 3,
    seed: str = "ring",
) -> DataFrame:
    """(node, n_replica_rows, pct_of_rows) under RF=``rf``: how many
    rows each node stores INCLUDING replicas — the capacity number a
    migration actually provisions for (RF× the primary ownership,
    rebalanced by the ring walk).

    Plan shape: slot lookup is the same scan-side successor expression
    as :func:`ring_ownership`; the rf owners per slot ride along as an
    aligned array-of-arrays literal, one explode fans each row to its
    replicas, and the report aggregates O(nodes) keys.  Rows fan out
    ×rf, but only AFTER projection to the 4-byte node id — the wide
    row never replicates.
    """
    from cassandra_data_migration_spark.functions.hashing import md5_draw

    ring = vnode_ring(num_nodes, vnodes_per_node, seed)
    sets = replica_sets(ring, rf)
    tokens = F.array(*[F.lit(t) for t, _ in sets])
    owners = F.array(
        *[F.array(*[F.lit(n) for n in ns]) for _, ns in sets]
    )
    tok = md5_draw(seed + ":key", key_col)
    succ = F.array_min(F.filter(tokens, lambda t: t >= tok))
    wrapped = F.coalesce(succ, F.lit(sets[0][0]))
    slot_owners = F.element_at(
        owners, F.array_position(tokens, wrapped).cast("int")
    )
    total = df.count()
    return (
        df.select(F.explode(slot_owners).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_replica_rows"))
        .withColumn(
            "pct_of_rows",
            F.round(F.col("n_replica_rows") / F.lit(total), 4),
        )
    )


def replica_sql(
    table: str,
    key_expr: str,
    num_nodes: int = 4,
    vnodes_per_node: int = 16,
    rf: int = 3,
    seed: str = "ring",
) -> str:
    """DuckDB twin of :func:`replica_ownership`."""
    from cassandra_data_migration_spark.functions.hashing import md5_draw_sql

    ring = vnode_ring(num_nodes, vnodes_per_node, seed)
    sets = replica_sets(ring, rf)
    tokens = "[" + ", ".join(str(t) for t, _ in sets) + "]"
    owners = (
        "["
        + ", ".join("[" + ", ".join(str(n) for n in ns) + "]" for _, ns in sets)
        + "]"
    )
    tok = md5_draw_sql(seed + ":key", key_expr)
    return f"""
        WITH assigned AS (
            SELECT unnest(({owners})[list_position({tokens},
                       COALESCE(list_min(list_filter({tokens},
                                t -> t >= {tok})), {sets[0][0]}))]) AS node
            FROM {table}
        ),
        tot AS (SELECT COUNT(*) AS n FROM {table})
        SELECT node, COUNT(*) AS n_replica_rows,
               ROUND(COUNT(*) * 1.0 / tot.n, 4) AS pct_of_rows
        FROM assigned, tot
        GROUP BY node, tot.n
    """
