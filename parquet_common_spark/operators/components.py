"""Connected components over the near-duplicate pair graph.

Completes the dedup story: pairwise candidates (MinHash LSH) -> duplicate
CLUSTERS -> one survivor per cluster.  Implemented as iterative min-label
propagation on DataFrames with pointer jumping (the standard large-graph
formulation — each round is a couple of keyed shuffles).

Iterative-plan discipline (the part Spark does NOT do for you):
  - `edges` is persisted once, so the upstream pipeline that produced the
    pairs (e.g. the whole MinHash LSH candidate join) runs exactly once,
    not once per round per action;
  - each round's labels are persisted and the previous round's are
    unpersisted — the convergence check and the next round share one
    materialization;
  - lineage is cut with localCheckpoint every few rounds, keeping the
    plan (and task-serialization cost) constant across iterations;
  - each round min-propagates along edges AND pointer-jumps
    (component <- component-of-component), so label reach doubles per
    round: max_iter=20 covers graph diameter ~2^20, and exhausting the
    loop without convergence raises instead of silently returning
    non-fixpoint labels (the DuckDB WITH RECURSIVE oracle always reaches
    the fixpoint).

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
    reachable.  Converges when no label changes (checked per round);
    raises RuntimeError if max_iter rounds don't reach the fixpoint."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    converged = False
    for it in range(max_iter):
        # every node offers its label to its neighbors; take the min ...
        offered = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # ... then pointer-jump: follow the label's own label, doubling
        # reach per round (log-diameter rounds instead of diameter)
        parent = offered.select(
            F.col("id").alias("_pid"), F.col("component").alias("_pcomp")
        )
        offered = offered.join(parent, offered.component == parent._pid, "left").select(
            "id", F.coalesce("_pcomp", "component").alias("component")
        )
        if (it + 1) % 5 == 0:
            # cut lineage so the per-round plan stays constant-size
            offered = offered.localCheckpoint(eager=True)
        else:
            offered = offered.persist()
        changed = (
            offered.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = offered
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter > 2^max_iter is implausible — check the input)"
        )
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
