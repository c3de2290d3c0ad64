"""Iterative graph algorithms as fixed-point DataFrame plans.

PageRank here is the training-data-pipeline shape (authority scoring a
quality filter consumes), and the representative of the ITERATIVE class
of operators: per iteration ONE equi-join (ranks ⋈ edges on src) and
ONE groupBy(dst) — both hash-partitioned on node id, so at 100 TB each
iteration is a standard shuffle pair over |edges| rows, never a
collect, never a driver-side loop over DATA (the Python loop is over
the fixed iteration COUNT, building one lazy plan).

Scale notes:
* `edges` (+ out-degrees) are the loop invariant; their exchange is
  physically deduplicated across iterations by Spark's ReusedExchange
  rule (pinned by test), so the scan+join cost is paid once, not once
  per iteration.  Ranks (|nodes| rows) is the only frame that changes.
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
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node, rank)`` after ``iterations`` synchronous updates
    from the uniform start, with ``rank' = (1-d)/N + d * Σ_in r/outdeg``.
    Every node must have out-degree ≥ 1 (no dangling mass); in-degree 0
    is allowed — such nodes keep their teleport rank ``(1-d)/N`` and
    keep contributing to their out-neighbors every iteration (each
    update left-joins contributions back onto the full node spine, so
    no node or rank mass is dropped).  The (edges ⋈ outdeg) invariant
    is not cached explicitly; its exchange is physically deduplicated
    across iterations by Spark's ReusedExchange rule.  Ranks stay an
    |nodes|-row frame throughout.

    ``checkpoint_every``: for DEEP iteration counts the lazy plan grows
    linearly with k and Catalyst re-optimizes the whole chain each
    action — ``localCheckpoint`` the ranks frame every that-many
    rounds to truncate lineage (bounded plan depth, bounded optimizer
    time, and the executors hold one materialized |nodes|-row frame
    instead of the re-derivation chain).  Results are identical
    (pinned by test); the registry's fixed k=3 doesn't need it.
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
    # counts pass checkpoint_every to truncate lineage (built + pinned
    # below); the registry entry runs a fixed small k.
    contrib_src = e.join(deg, "src")
    for _i in range(iterations):  # loop over fixed iteration COUNT, not data
        contrib = (
            contrib_src.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        # Left-join onto the full node spine: a node with in-degree 0
        # receives no contributions but must keep its teleport rank
        # (and thereby its outgoing mass next iteration) — rebuilding
        # ranks from contrib alone would silently drop it.
        ranks = nodes.join(
            contrib.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping)
                * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
        if checkpoint_every and (_i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous min-label propagation over a directed edge list —
    the community-detection member of the iterative-graph family
    (deterministic variant: each node adopts the MINIMUM of its own
    label and its in-neighbors' labels, so no random tie-breaking and
    the result is exactly reproducible — integer-exact, unlike
    PageRank's float ranks).

    Returns ``(node, label)`` after ``iterations`` synchronous updates
    from ``label0(v) = v``.  After k iterations two nodes share a label
    iff the smaller label reaches them within k hops — on a symmetrized
    graph this converges to connected components (the batched
    pointer-jumping in operators/components.py gets there in O(log n)
    rounds; this is the fixed-depth, one-shuffle-per-round shape that
    LPA-style community detection uses).

    Scale shape: per iteration ONE equi-join (labels ⋈ edges on src)
    and ONE groupBy(dst) min — hash-partitioned on node id, map-side
    combinable (MIN is associative), labels never exceeds |nodes| rows.
    The node spine is kept via left-join so isolated-in-degree nodes
    retain their own label (same fix-class as pagerank's spine join).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(iterations):  # loop over fixed iteration COUNT, not data
        incoming = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("_nbr_min"))
            .withColumnRenamed("dst", "node")
        )
        labels = labels.join(incoming, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("_nbr_min"), F.col("label"))
            ).alias("label"),
        )
    return labels


def triangle_count(
    edges: DataFrame, u: str = "u", v: str = "v", orientation: str = "id"
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph given
    as oriented edges (u < v, deduplicated) — the third static-graph
    member (PageRank: ranks; LPA: communities; triangles: clustering /
    cohesion, the local-density signal a link-spam or bot-ring filter
    consumes).

    Algorithm: the oriented wedge join.  Under a TOTAL ORDER on nodes,
    with every edge stored once as (lo, hi), a triangle a<b<c is found
    EXACTLY once by e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c) — two hash
    equi-joins, no distinct needed afterwards, integer-exact.  Per-node
    counts are one explode of the three corners + a groupBy.

    ``orientation`` picks the order:
    * ``"id"`` — node id.  Wedge count is Σ_b |{a<b}|·|{c>b}|, fine on
      graphs without high-degree low-id hubs.
    * ``"degree"`` — (degree, id) lexicographic: each edge points from
      the lower-(deg, id) endpoint to the higher, so every wedge pivots
      on its LOWEST-DEGREE corner; the classic bound makes the wedge
      total O(m^1.5) on ANY graph (a celebrity hub generates no wedges
      because all its edges point INTO it).  Costs one extra degree
      groupBy + reorient join; same join shape after that.  This is the
      100 TB setting.

    Both joins are hash-partitioned on a node id; residual hot keys are
    ordinary AQE skew work.  Results are identical under either
    orientation (pinned by test) — the order only changes which corner
    pivots each wedge.
    """
    e = edges.select(F.col(u).alias("u"), F.col(v).alias("v"))
    if orientation == "degree":
        und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("_deg"))
        ranked = (
            und.join(deg, "u")
            .join(
                deg.select(F.col("u").alias("v"), F.col("_deg").alias("_degv")),
                "v",
            )
            # keep each undirected edge once, pointing low->high in the
            # (deg, id) order
            .where(
                (F.col("_deg") < F.col("_degv"))
                | ((F.col("_deg") == F.col("_degv")) & (F.col("u") < F.col("v")))
            )
        )
        e = ranked.select("u", "v")
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    broadcast_dist_max_rows: int = 4_000_000,
) -> DataFrame:
    """Bounded Bellman-Ford: minimum path weight from a source set.

    Returns ``(node, dist)`` for every node whose shortest path from
    the source set uses at most ``iterations`` edges — the WEIGHTED
    generalization of ``k_hop`` (hop count is the special case w ≡ 1)
    and the min-plus member of the iterative-graph family.  Distances
    are exact for those paths: each round applies the relaxation
    ``dist'(v) = min(dist(v), min_{(u,v,w)} dist(u) + w)``; with
    integer weights the result is integer-exact and engine-portable.

    Scale shape: per round ONE equi-join (dist ⋈ edges on src) and ONE
    groupBy(node) MIN over (previous dists ∪ relaxed candidates) —
    both hash-partitioned on node id, MIN map-side combinable; dist
    never exceeds |reachable nodes| rows.  The round count is a fixed
    small constant (the Python loop is over iteration COUNT, not
    data).  Each round's dist frame is ``localCheckpoint``-ed: it is
    referenced twice per round (edge join + union spine), the k_hop
    double-reference lineage class (~2^k plan growth untruncated —
    PERF_NOTES r9).

    Negative weights are accepted (Bellman-Ford semantics) but cycles
    are not detected — with ``iterations`` fixed the recurrence is
    well-defined regardless; callers wanting a negative-cycle check
    should compare round k-1 vs k for changes.

    r10 scale lessons (measured at sf10, SCALE.md):

    * The edge frame is MATERIALIZED ONCE (eager localCheckpoint)
      before the loop.  Only ``dist`` was checkpointed before, so
      every round re-derived ``edges`` from the caller's full lineage
      — for gr5 that was a 60M-group aggregation re-run 4× per query.
      On a cluster the analog is ``persist(DISK_ONLY)``.
    * When the dist frame is small enough
      (``broadcast_dist_max_rows``, row count is cheap on a
      checkpointed frame), the per-round join BROADCASTS dist instead
      of sort-merge-joining — which otherwise re-shuffles AND re-sorts
      the full edge frame every round (the sf10 straggler: one task
      spill-merging an external sort while 31 cores idled).  Past the
      threshold it falls back to the shuffle join, which is the right
      plan once the frontier itself is cluster-scale.
    """
    e = edges.select(
        F.col(src).alias("node"),
        F.col(dst).alias("_to"),
        F.col(weight).alias("_w"),
    )
    # materialize edges ONCE (see above) — DISK_ONLY: the edge frame is
    # the big side (120M rows at sf10), and holding it in unified memory
    # starves task execution (measured: UNABLE_TO_ACQUIRE_MEMORY in the
    # relaxation round at sf10 under an 8g heap).  Disk blocks don't
    # compete with execution memory and never evict-recompute; the
    # cluster analog is persist(DISK_ONLY) on the edge RDD.
    from pyspark import StorageLevel

    e = e.persist(StorageLevel.DISK_ONLY)
    e.count()  # eager
    dist = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    dist = dist.localCheckpoint(eager=True)
    for _ in range(iterations):  # loop over fixed round COUNT, not data
        d = (
            F.broadcast(dist)
            if dist.count() <= broadcast_dist_max_rows
            else dist
        )
        relaxed = (
            d.join(e, "node")
            .select(
                F.col("_to").alias("node"),
                (F.col("dist") + F.col("_w")).alias("dist"),
            )
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        dist = dist.localCheckpoint(eager=True)  # double-reference class
    # ADVICE r10: dist is eagerly checkpointed and no longer depends on
    # e — drop the disk-cached edge blocks instead of leaking one cached
    # edge relation per call for the session lifetime.
    e.unpersist()
    return dist


def k_hop(
    edges: DataFrame,
    sources: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_rows: int = 4_000_000,
) -> DataFrame:
    """Bounded-depth BFS: minimum hop distance from a source set.

    Returns ``(node, dist)`` for every node reachable within ``k``
    hops (sources themselves at dist 0, each node at its MINIMUM
    distance exactly once).  This is the frontier-expansion member of
    the iterative-graph family (pagerank: value iteration; LPA:
    label flow; components: pointer jumping) — the shape behind
    blast-radius / contamination-reach queries ("everything within 3
    links of a flagged document").

    Scale shape: per hop one equi-join (frontier ⋈ edges on src), one
    distinct, and one left-anti join against the reached set — all
    hash-partitioned on node id; the frontier only SHRINKS relative
    to |nodes| as levels saturate, and reached is at most |nodes|
    rows.  k is a fixed small constant (the Python loop is over hop
    COUNT, not data).

    Each hop's fresh level is ``localCheckpoint``-ed (eager): the
    level frame is referenced TWICE (union into reached + next hop's
    frontier) and reached is referenced by every later anti-join, so
    without truncation the lazy plan re-derives the whole prefix per
    reference — ~2^k plan growth (measured: 60 joins at k=3 un-
    checkpointed vs 3 per hop truncated).  This is the BFS variant of
    the ``pagerank(checkpoint_every=...)`` lineage posture, on by
    default because the level frame is small (≤ |nodes| rows) and the
    recomputation is not.

    r10: the edge frame is materialized ONCE before the loop and the
    frontier/reached sides broadcast below ``broadcast_max_rows`` —
    the same two lessons as ``shortest_paths`` (see its docstring):
    without them every hop re-derived the caller's edge lineage and
    re-shuffled+sorted the full edge frame for the SMJ.
    """
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("_to"))
    from pyspark import StorageLevel

    e = e.persist(StorageLevel.DISK_ONLY)  # materialize edges ONCE
    e.count()  # eager; DISK_ONLY — see shortest_paths
    reached = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
    )
    reached = reached.localCheckpoint(eager=True)
    frontier = reached.select("node")
    for i in range(1, k + 1):  # loop over fixed hop COUNT, not data
        f = (
            F.broadcast(frontier)
            if frontier.count() <= broadcast_max_rows
            else frontier
        )
        nxt = (
            f.join(e, "node")
            .select(F.col("_to").alias("node"))
            .distinct()
        )
        seen = reached.select("node")
        if reached.count() <= broadcast_max_rows:
            seen = F.broadcast(seen)
        fresh = nxt.join(seen, "node", "left_anti")
        fresh = fresh.localCheckpoint(eager=True)  # see docstring
        reached = reached.unionAll(fresh.withColumn("dist", F.lit(i)))
        frontier = fresh
    # Safe: every level in the reached union is an eagerly checkpointed
    # frame, so the plan no longer reads e — drop the disk-cached edge
    # blocks instead of leaking one per call (ADVICE r10).
    e.unpersist()
    return reached
