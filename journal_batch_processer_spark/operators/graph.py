"""Iterative graph operators: connected components for dedup clustering.

A near-dup pass emits PAIRS; a pipeline needs CLUSTERS — the
transitive closure — so one representative per component survives.
That closure is inherently iterative, which is exactly where a
DataFrame engine needs a driver-side loop: each round is a
join + min-aggregate (all Catalyst-planned), and ``localCheckpoint``
truncates the growing lineage so round N's plan doesn't contain
rounds 1..N-1 (the classic iterative-Spark failure mode).

Algorithm: min-label propagation. Every node starts labeled with
itself; each round a node takes the minimum label among itself and
its neighbors; fixpoint when no label changes. Rounds needed = the
largest component's diameter — small for dedup clusters (near-dup
graphs are dense blobs, not chains). For adversarial long-chain
graphs, switch to the large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14), which
converges in O(log n) rounds with the same per-round join shape.

At 100 TB: labels and edges are both hash-partitioned on the join
key every round; persisting `labels` between rounds keeps the small
side resident, and the convergence check is a cheap count over the
changed-label join, not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected edge list from (a, b) pairs."""
    return pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).union(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation to fixpoint over a symmetric edge list
    (columns ``src``, ``dst``). Returns (n, component) for every node
    that appears in an edge; isolated nodes are the caller's join-back.

    Deterministic: the component id is the minimum node id reachable.
    """
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    labels = nodes.withColumn("l", F.col("n")).localCheckpoint(eager=True)
    # labels only ever DECREASE (min-propagation), so the label sum is
    # a strictly-decreasing potential function: sum unchanged ⟺ fixpoint.
    # That makes the per-round convergence check one aggregate over the
    # (small) label table instead of a changed-rows join. DECIMAL(38)
    # accumulator: 1e9 nodes x 64-bit ids overflows a long sum.
    prev_sum = labels.agg(F.sum(F.col("l").cast("decimal(38,0)"))).collect()[0][0]

    for _ in range(max_iter):
        neigh = edges.join(
            labels, edges["src"] == labels["n"], "inner"
        ).select(F.col("dst").alias("n"), F.col("l"))
        labels = (
            labels.select("n", "l")
            .union(neigh)
            .groupBy("n")
            .agg(F.min("l").alias("l"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum(F.col("l").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("n"), F.col("l").alias("component"))


def cluster_assignments(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
) -> DataFrame:
    """Every row of ``df`` → (id, cluster_id, is_rep): transitive
    closure over ``pairs`` with singletons as their own cluster and
    the minimum id as the deterministic representative."""
    # materialize pairs ONCE: symmetrize unions two selects over the
    # same (expensive — shingle-join) plan, which would execute twice
    pairs = pairs.localCheckpoint(eager=True)
    cc = connected_components(symmetrize(pairs, a, b))
    out = df.select(F.col(id_col)).join(
        cc, df[id_col] == cc["n"], "left"
    )
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (F.col(id_col) == cluster).cast("int").alias("is_rep"),
    )
