"""Connected components over the near-duplicate pair graph.

Completes the dedup story: pairwise candidates (MinHash LSH) -> duplicate
CLUSTERS -> one survivor per cluster.  Implemented as iterative min-label
propagation on DataFrames (the standard large-graph formulation — each
round is one join + one aggregation, both keyed shuffles; rounds needed =
graph diameter, which for near-dup clusters is tiny).

This is the repo's example of an iterative algorithm that plain SQL can't
express directly — the oracle uses DuckDB's WITH RECURSIVE to reach the
same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """(id_a, id_b) edges -> (id, component) with component = min id
    reachable.  Converges when no label changes (checked per round)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # every node offers its label to its neighbors; take the min
        offered = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            offered.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = offered
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Duplicate clusters from near-dup pairs: (component, n_members,
    keep_id) — keep_id is the min id, everything else is droppable."""
    cc = connected_components(pairs)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"), F.min("id").alias("keep_id"))
        .select("keep_id", "n_members")
    )
