"""Connected components over the near-duplicate pair graph.

Completes the dedup story: pairwise candidates (MinHash LSH) -> duplicate
CLUSTERS -> one survivor per cluster.  Implemented as iterative min-label
propagation on DataFrames with pointer jumping (the standard large-graph
formulation — each round is a couple of keyed shuffles).

Iterative-plan discipline (the part Spark does NOT do for you):
  - `edges` is persisted once, so the upstream pipeline that produced the
    pairs (e.g. the whole MinHash LSH candidate join) runs exactly once,
    not once per round per action;
  - rounds run in BATCHES of `check_every` rounds with ONE aggregate
    action per batch (per-action job overhead, not shuffle volume,
    dominates at check scale); every intermediate inside the batch is
    cut with localCheckpoint(eager=False) — each round references its
    input twice (union + pointer-jump self-join), so any lineage-carrying
    plan grows ~4^rounds and OOMs the driver's plan machinery; the lazy
    local checkpoint truncates the logical plan to a constant-size
    LogicalRDD AND implicitly persists it, so the batch-end aggregate
    materializes every round exactly once in one job (stale round RDDs
    are dropped by the ContextCleaner once unreferenced);
  - convergence is a driver-side checksum: labels only DECREASE under
    min-propagation, so sum(component) is constant iff the fixpoint is
    reached — no per-round change-count join;
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


def _one_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-propagation + pointer-jump round (no action).  `offered`
    is referenced twice (left side + pointer-jump parent), so it is cut
    with a LAZY localCheckpoint: constant-size logical plan, implicit
    persist, computed exactly once when the batch action runs."""
    # every node offers its label to its neighbors; take the min ...
    offered = (
        edges.join(labels, edges.src == labels.id)
        .select(F.col("dst").alias("id"), F.col("component"))
        .unionByName(labels)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
        .localCheckpoint(eager=False)
    )
    # ... then pointer-jump: follow the label's own label, doubling
    # reach per round (log-diameter rounds instead of diameter)
    parent = offered.select(F.col("id").alias("_pid"), F.col("component").alias("_pcomp"))
    return offered.join(parent, offered.component == parent._pid, "left").select(
        "id", F.coalesce("_pcomp", "component").alias("component")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
    check_every: int = 2,
) -> DataFrame:
    """(id_a, id_b) edges -> (id, component) with component = min id
    reachable.  Raises RuntimeError if max_iter rounds don't reach the
    fixpoint.

    Iteration runs in batches of rounds between actions — one aggregate
    action per batch instead of a join+count per round.  The schedule is
    ``check_every`` rounds first (pointer jumping does nearly all the
    work in rounds 1-2 on near-dup graphs), then 1-round confirm batches
    (a single round with an unchanged sum proves the fixpoint), doubling
    the batch size on repeated non-convergence (high-diameter graphs).
    Every intermediate is lineage-cut with a lazy localCheckpoint so the
    plan stays constant-size — see module docstring.  Convergence is
    detected with a driver-side sum: labels
    only ever DECREASE under min-propagation / pointer jumping, so
    sum(component) is strictly decreasing until — and constant exactly at
    — the fixpoint (decimal(38,0) cast: no long overflow for arbitrary
    64-bit ids)."""
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
    checksum = F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    prev_sum = labels.agg(checksum).collect()[0]["s"]
    converged = False
    it = 0
    batch, opening = max(check_every, 1), True
    while it < max_iter:
        new_labels = labels
        for _ in range(min(batch, max_iter - it)):
            new_labels = _one_round(edges, new_labels)
            it += 1
        # after the opening batch: cheap 1-round confirms, doubling if
        # the graph turns out to have real diameter
        batch, opening = (1, False) if opening else (min(batch * 2, 8), False)
        # one action materializes the whole batch chain (each lazily
        # checkpointed round computed exactly once); stale round RDDs are
        # reclaimed by the ContextCleaner once out of scope
        new_labels = new_labels.localCheckpoint(eager=False)
        cur_sum = new_labels.agg(checksum).collect()[0]["s"]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
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
