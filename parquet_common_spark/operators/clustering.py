"""Lloyd's k-means over an embedding column — the centroid-model member
of the iterative family (PageRank: graph ranks; label propagation:
communities; k-means: vector clusters — the shape an embedding-based
curation pipeline uses for diversity sampling and SemDeDup-style
bucketing, cf. operators/dedup.py::semdedup).

Determinism contract (what makes this oracle-checkable bit-for-bit):
* inputs are QUANTIZED to integers (``round(x * 1000)``) so iteration-0
  distances are exact BIGINT arithmetic;
* centroid updates are ``SUM(int)/COUNT`` — one exact integer sum and
  one double division, no order-dependent float accumulation;
* later distances are fixed-order left-to-right sums over the dim axis
  (same association as the oracle's explicit 64-term expression);
* argmin tie-breaks on the lowest centroid id (lexicographic
  ``(dist, cid)`` min both engines).

Scale shape (100 TB): centroids are k x dim scalars — a bounded driver
collect per iteration (the similarity.py smallness contract), broadcast
into a map-only assignment stage; the update is ONE groupBy(cluster)
with map-side partial sums over dim columns.  No shuffle grows with
iterations; assignment never materializes a corpus x k join (the k
distances are computed per row against broadcast literals).  The Python
loop is over the fixed iteration COUNT, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _dist_int(qcol, centroid: list[int]):
    """Exact integer squared distance (iteration 0)."""
    arr = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(qcol, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dist_dbl(qcol, centroid: list[float]):
    """Fixed-order double squared distance (later iterations)."""
    arr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(
            qcol,
            arr,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """``(vec_id, q)`` with q = round(x * 1000) as BIGINT — the shared
    quantization that makes every cross-row aggregation exact."""
    return df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 1000).cast("long"),
        ).alias("q"),
    )


def assign_to_centroids(q: DataFrame, centroids: list[list], integer_centroids: bool):
    """Map-only argmin assignment against broadcast-literal centroids:
    lexicographic (dist, cid) min.  Returns (cluster Column, sqdist
    Column) — streaming-legal (no aggregation, no state)."""
    dist = _dist_int if integer_centroids else _dist_dbl
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    dist(F.col("q"), c).alias("d"),
                    F.lit(cid).alias("c"),
                )
                for cid, c in enumerate(centroids)
            ]
        )
    )
    return best["c"], best["d"]


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
    dim: int = 64,
) -> list[list[float]]:
    """Run ``iterations`` (assign -> update) Lloyd's rounds from the
    lowest-id seeds; return the final centroids (k x dim floats, each
    component an exact SUM(int)/COUNT division)."""
    q = quantize_vectors(df, id_col, vec_col)
    # deterministic seed: lowest-id vectors (bounded collect of k rows)
    seed_rows = q.orderBy("vec_id").limit(k).collect()
    centroids: list[list] = [list(r["q"]) for r in seed_rows]
    integer_centroids = True
    for _ in range(iterations):  # fixed COUNT, not data
        cluster, _d = assign_to_centroids(q, centroids, integer_centroids)
        assign = q.select("vec_id", "q", cluster.alias("cluster"))
        # update: exact integer sums per dim + one double division each
        agg = assign.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(dim)],
        )
        got = {r["cluster"]: r for r in agg.collect()}  # k bounded rows
        centroids = [
            [got[cid][f"s{i}"] / got[cid]["n"] for i in range(dim)]
            if cid in got
            else [float(v) for v in centroids[cid]]  # empty cluster keeps seat
            for cid in range(k)
        ]
        integer_centroids = False
    return centroids


def kmeans_quantized(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means with deterministic seeding: the
    k vectors with the lowest ids are the initial centroids.  Runs
    ``iterations`` (assign -> update) rounds plus a final assignment
    against the last centroids; returns per-vector ``(vec_id, cluster)``.
    """
    centroids = kmeans_fit(df, id_col, vec_col, k, iterations, dim)
    q = quantize_vectors(df, id_col, vec_col)
    cluster, _d = assign_to_centroids(q, centroids, integer_centroids=iterations == 0)
    return q.select("vec_id", cluster.alias("cluster"))


def kmeans_cluster_profile(
    spark: SparkSession,
    df: DataFrame,
    k: int = 4,
    iterations: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Registry shape: cluster sizes + the final-centroid L2 norm (a
    deterministic float fingerprint of the model, computed driver-side
    in the same fixed term order as the oracle's 64-term expression)."""
    assign = kmeans_quantized(df, k=k, iterations=iterations, dim=dim)
    counts = assign.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    # recompute final centroids exactly as the last update would
    agg = assign.join(
        df.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 1000).cast("long"),
            ).alias("q"),
        ),
        "vec_id",
    ).groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(dim)],
    )
    norms = []
    for r in agg.collect():  # k bounded rows
        acc = 0.0
        for i in range(dim):
            c = r[f"s{i}"] / r["n"]
            acc = acc + c * c
        norms.append((r["cluster"], round(acc ** 0.5, 6)))
    norms_df = spark.createDataFrame(norms, "cluster int, centroid_norm double")
    return counts.join(norms_df, "cluster").orderBy("cluster")
