"""Graph operators: connected components over candidate-duplicate
pair graphs — the clustering step that turns near-dup PAIRS (from
``operators.dedup``) into dedup GROUPS, so one canonical document per
component survives.

The reference's dedup surface stops at pair detection; a production
corpus pipeline needs the transitive closure (A~B, B~C ⇒ {A,B,C} is
one group).  Spark-first design: iterative min-label propagation
expressed as DataFrame joins, `localCheckpoint` per round to truncate
lineage (a cluster run points ``setCheckpointDir`` at durable storage
and uses ``checkpoint()`` instead — same call shape).

Scale notes:
- Each round shuffles |E| (neighbor messages) + |V| (labels) rows of
  two 8-byte columns — ~16 bytes/edge, independent of document width.
- Round count is bounded by graph diameter.  Duplicate-cluster graphs
  are near-cliques (every dup pairs with every other), so 2-3 rounds
  converge in practice.  For adversarial long-chain graphs the
  alternating large-star/small-star formulation (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14) bounds
  rounds at O(log² n) using these same join/groupBy primitives.
- The convergence probe is `limit(1)` over changed labels: it
  short-circuits scanning as soon as one change is found.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_data_migration_spark.operators.dedup import ngram_jaccard_pairs


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) where component = min node id reachable from
    ``id`` over the undirected ``edges``.  Isolated nodes (present in
    ``nodes``, absent from ``edges``) form singleton components.

    Min-label propagation: every node repeatedly adopts the smallest
    label among itself and its neighbors until a fixpoint.  The loop
    is driver-side control flow over distributed joins — no data ever
    lands on the driver.
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rev = edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    und = (
        fwd.union(rev).filter(F.col("a") != F.col("b")).distinct().persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("a"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        msgs = und.join(labels, "a").select(
            F.col("b").alias("a"), F.col("component")
        )
        new_labels = (
            labels.union(msgs)
            .groupBy("a")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "a")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels.select(F.col("a").alias(id_col), "component")


def dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate clusters: n-gram-Jaccard pairs → connected
    components → (doc_id, component, cluster_size).  Keep
    ``doc_id == component`` to materialize the deduped corpus (the
    min-id doc is the canonical representative).

    The pair table is persisted because the propagation loop re-reads
    it every round; at corpus scale this is the standard "materialize
    the candidate-pair table, then cluster" step.
    """
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n, threshold).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    cc = connected_components(pairs, df.select(id_col), id_col)
    w = Window.partitionBy("component")
    return cc.select(
        id_col,
        "component",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
