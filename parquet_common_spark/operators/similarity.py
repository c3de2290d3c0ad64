"""Similarity search over embedding columns (array<float>).

Two paths, per SURVEY.md §7 phase 4:
  - brute-force cosine top-k: the exactness baseline.  Queries are
    broadcast (small side), the corpus is scanned once, per-partition
    top-k heaps via window row_number — no all-pairs shuffle.
  - LSH-bucketed top-k (random hyperplanes): the 100 TB path.  Signature
    is map-only; candidates come from an equi-join on bucket id, so cost
    scales with bucket occupancy, not corpus size.  Recall is tested
    against the brute-force baseline (tests/test_similarity.py).

Dot products: the brute-force scan defaults to a numpy Arrow engine whose
cumsum accumulation reproduces the JVM fold's IEEE rounding bit-for-bit
(see _brute_force_topk_arrow); the zip_with + aggregate Column
formulation remains as the parity-tested reference and powers the LSH/IVF
candidate scoring (candidate volume there is small, so interpreted HOF
cost is immaterial).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from parquet_common_spark.operators.text import HASH_P


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    """cos(a, b) with sequential-fold double arithmetic (mirrors the
    DuckDB oracle's list_dot_product formulation)."""
    return dot(a, b) / (norm(a) * norm(b))


def _brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    negative_label_col: str | None = None,
    round_cos: bool = True,
) -> DataFrame:
    """numpy engine for brute_force_topk: bit-identical cosines to the
    JVM fold — ``np.cumsum(axis=1)[:, -1]`` accumulates strictly left to
    right, the same IEEE rounding sequence as ``aggregate(zip_with(...))``
    starting from 0.0 (0.0+x == x exactly).  Queries are collected to the
    driver (same smallness contract as the JVM path's broadcast); each
    corpus batch emits its local top-k, a global window keeps the exact
    top-k of those."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    q_cols = [F.col(id_col).cast("long"), F.col(vec_col).cast("array<double>")]
    if negative_label_col:
        q_cols.append(F.col(negative_label_col).cast("long"))
    q_rows = queries.select(*q_cols).collect()
    qids = [r[0] for r in q_rows]
    qvecs = [list(r[1]) for r in q_rows]
    qlabels = [r[2] for r in q_rows] if negative_label_col else None
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        Q = np.asarray(qvecs, dtype=np.float64)
        qn = np.sqrt(np.cumsum(Q * Q, axis=1)[:, -1]) if len(qvecs) else np.empty(0)
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf.iloc[:, 0].to_numpy()
            C = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            labels = pdf.iloc[:, 2].to_numpy() if qlabels is not None else None
            cn = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
            rq, rn, rc = [], [], []
            for qi, qid in enumerate(qids):
                dots = np.cumsum(C * Q[qi][None, :], axis=1)[:, -1]
                cos = dots / (qn[qi] * cn)
                mask = ids != qid
                if labels is not None:
                    # hard-negative mode: candidates must carry a
                    # DIFFERENT label than the query
                    mask &= labels != qlabels[qi]
                mids, mcos = ids[mask], cos[mask]
                top = np.lexsort((mids, -mcos))[:k]
                rq.extend([qid] * len(top))
                rn.extend(mids[top].tolist())
                rc.extend(mcos[top].tolist())
            yield pd.DataFrame({"query_id": rq, "neighbor_id": rn, "cos": rc})

    c_cols = [F.col(id_col).cast("long"), F.col(vec_col).cast("array<double>")]
    if negative_label_col:
        c_cols.append(F.col(negative_label_col).cast("long"))
    scored = corpus.select(*c_cols).mapInPandas(batches, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    out_cos = F.round("cos", 5).alias("cos") if round_cos else F.col("cos")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", out_cos, F.col("rank").cast("int"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    engine: str = "arrow",
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus rows
    (self excluded), deterministic tie-break on neighbor id.

    ``engine="arrow"`` (default) vectorizes the scan with numpy at the
    fold's exact rounding (see _brute_force_topk_arrow); ``"column"`` is
    the JVM higher-order-function twin (parity-tested)."""
    if engine == "arrow":
        return _brute_force_topk_arrow(corpus, queries, id_col, vec_col, k)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"), F.col("rank").cast("int"))
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the k corpus vectors MOST similar to it that carry a DIFFERENT
    label — the classic "hardest negatives" batch-construction step for
    embedding-model training (triplet / InfoNCE), where random
    negatives are too easy to produce gradient signal.

    Same engine and exactness contract as :func:`brute_force_topk`
    (left-to-right IEEE fold, self-exclusion, id tie-break) with one
    extra map-side mask on the label column — the corpus is still
    scanned once, map-only, with per-batch local top-k before the
    single bounded window; queries (the small side, by contract)
    ride along as a closure, never a shuffle."""
    return _brute_force_topk_arrow(
        corpus, queries, id_col, vec_col, k, negative_label_col=label_col
    )


# ----------------------------------------------------------- LSH (scale path)

N_TABLES = 8  # independent hash tables (union of candidates)
N_BITS = 6    # hyperplanes per table; recall ≈ 1-(1-p^N_BITS)^N_TABLES
              # with p = 1 - angle/pi per bit


def _plane_component(plane: int, dim: int):
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    poly-hash the (plane, dim) pair and scale.  Pure arithmetic — works
    in any engine, no stored model."""
    h = (1_000_003 * (plane + 1) + 7919 * (dim + 1)) % HASH_P
    h = (h * 2_654_435_761) % HASH_P
    return (h / HASH_P) * 2.0 - 1.0


def lsh_buckets(vec, dim: int = 64):
    """Array of N_TABLES bucket keys; table t uses hyperplanes
    [t*N_BITS, (t+1)*N_BITS).  Key encodes (table, bits) so tables never
    collide with each other in the equi-join."""
    keys = []
    for t in range(N_TABLES):
        bucket = F.lit(t << N_BITS).cast("long")
        for b in range(N_BITS):
            plane_idx = t * N_BITS + b
            plane = F.array(*[F.lit(_plane_component(plane_idx, d)) for d in range(dim)])
            bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        keys.append(bucket)
    return F.array(*keys)


def lsh_buckets_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = 64,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
) -> DataFrame:
    """(id, vec, bucket) rows — one per (row, table) — via ONE numpy matmul
    per Arrow batch: signs = V @ P.T > 0, bits packed per table.

    Same plane components and bucket key layout as :func:`lsh_buckets`;
    the Column-expression path folds 48 interpreted HOF dot products per
    row (a ~3000-node expression tree that dominates wall time), while
    this stage is a single BLAS call.  Map-only, no shuffle.

    ``n_tables``/``n_bits`` tune the recall/candidate-volume trade
    (recall ≈ 1-(1-p^n_bits)^n_tables for per-bit collision p); the
    defaults are the oracle-checked sim2 configuration."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    N_TABLES, N_BITS = n_tables, n_bits
    out_schema = StructType(
        [
            StructField("_id", LongType()),
            StructField("_v", ArrayType(DoubleType())),
            StructField("_bkt", LongType()),
        ]
    )
    n_planes = N_TABLES * N_BITS
    planes = [[_plane_component(p, d) for d in range(dim)] for p in range(n_planes)]

    def batches(it):
        import numpy as np
        import pandas as pd

        P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
        shifts = np.arange(N_BITS, dtype=np.int64)

        def fold_signs(V):
            # Left-to-right accumulation (cumsum) instead of BLAS matmul:
            # reproduces the aggregate(zip_with(...)) fold's IEEE rounding
            # bit-for-bit, so the bucket SIGN agrees exactly with the
            # DuckDB oracle's list_dot_product.  Chunked to bound the
            # (rows, n_planes, dim) intermediate at ~25 MB.
            out = np.empty((V.shape[0], P.shape[0]), dtype=bool)
            step = 2048
            for i in range(0, V.shape[0], step):
                prod = V[i : i + step, None, :] * P[None, :, :]
                out[i : i + step] = np.cumsum(prod, axis=2)[:, :, -1] > 0
            return out

        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[pdf.columns[0]].to_numpy()
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[pdf.columns[1]]])
            bits = fold_signs(V).astype(np.int64)  # (n, n_planes)
            out_ids, out_vs, out_bkts = [], [], []
            vs = V.tolist()
            for t in range(N_TABLES):
                keys = (t << N_BITS) + (bits[:, t * N_BITS : (t + 1) * N_BITS] << shifts).sum(
                    axis=1
                )
                out_ids.extend(int(i) for i in ids)
                out_vs.extend(vs)
                out_bkts.extend(int(b) for b in keys)
            yield pd.DataFrame({"_id": out_ids, "_v": out_vs, "_bkt": out_bkts})

    return df.select(
        F.col(id_col).cast("long"), F.col(vec_col).cast("array<double>")
    ).mapInPandas(batches, schema=out_schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: candidates share
    a bucket in ANY of the n_tables tables (equi-join on (table,bits)
    key), then exact cosine re-rank over the candidate union."""
    c = lsh_buckets_arrow(
        corpus, id_col, vec_col, dim=dim, n_tables=n_tables, n_bits=n_bits
    ).select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_cv"), "_bkt")
    q = lsh_buckets_arrow(
        queries, id_col, vec_col, dim=dim, n_tables=n_tables, n_bits=n_bits
    ).select(F.col("_id").alias("query_id"), F.col("_v").alias("_qv"), "_bkt")
    cand = (
        q.join(c, "_bkt")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .distinct()
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"), F.col("rank").cast("int"))
    )


# ----------------------------------------------------------- IVF (scale path)


def ivf_assign(df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, nprobe: int = 1) -> DataFrame:
    """Assign each vector to its `nprobe` nearest centroids (by cosine).
    Centroids are broadcast (they're small by construction); assignment is
    a map-side cross join + per-row top-nprobe — no shuffle of the corpus."""
    c = F.broadcast(
        centroids.select(F.col("centroid_id"), F.col("cvec"))
    )
    scored = (
        df.select(F.col(id_col).alias("_vid"), F.col(vec_col).cast("array<double>").alias("_v"))
        .crossJoin(c)
        .withColumn("_sim", cosine(F.col("_v"), F.col("cvec")))
    )
    w = Window.partitionBy("_vid").orderBy(F.desc("_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= nprobe)
        .select("_vid", "_v", "centroid_id")
    )


def sample_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> DataFrame:
    """Deterministic pseudo-random centroid sample: the ``n_centroids``
    smallest rows by a Knuth-multiplicative id mix — a TakeOrdered, no
    count/sort of the corpus and no extra driver action.  The mix is
    plain BIGINT arithmetic so any engine (including the DuckDB oracle)
    reproduces the exact sample; ids must stay below ~3.4e9 to avoid
    64-bit overflow.  Shared by :func:`ivf_topk` and
    :func:`build_ivf_index`; feed the result through
    :func:`refine_centroids` for Lloyd-sharpened cells."""
    mix = (F.col(id_col).cast("long") * F.lit(2654435761) + F.lit(40503)) % F.lit(
        999999937
    )
    return (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("cvec"))
        .orderBy(mix, F.col(id_col))
        .limit(n_centroids)
        .select(F.dense_rank().over(Window.orderBy(id_col)).alias("centroid_id"), "cvec")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into centroid
    cells (corpus assigned to its 1 nearest centroid), probe the query's
    `nprobe` nearest cells, exact cosine re-rank inside the probed cells.

    Centroids here are deterministic pseudo-random samples (the
    n_centroids smallest rows by a Knuth-multiplicative id mix — a
    TakeOrdered, no count/sort of the corpus and no extra driver action)
    — one k-means sweep would sharpen them, but the *plan shape* is the
    point: cell assignment is map-only, the search is an equi-join on
    centroid_id, cost scales with cells probed.  The mix is plain BIGINT
    arithmetic (``(id*2654435761 + 40503) % 999999937``) so any engine —
    including the DuckDB oracle — reproduces the exact sample; ids must
    stay below ~3.4e9 to avoid 64-bit overflow (the driver's vec_ids are
    dense small ints; for larger id spaces swap in a 128-bit mix).

    Pass ``centroids`` (centroid_id, cvec) to search against externally
    supplied cells — e.g. a :func:`refine_centroids` output.
    """
    if centroids is None:
        centroids = sample_centroids(corpus, id_col, vec_col, n_centroids)
    cells = ivf_assign(corpus, centroids, id_col, vec_col, nprobe=1).select(
        F.col("_vid").alias("neighbor_id"), F.col("_v").alias("_cv"), "centroid_id"
    )
    probes = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col("_vid").alias("query_id"), F.col("_v").alias("_qv"), "centroid_id"
    )
    cand = (
        probes.join(cells, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .distinct()
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"), F.col("rank").cast("int"))
    )


def build_ivf_index(
    corpus: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
) -> None:
    """Persist the IVF index: ``centroids.parquet`` (centroid_id, cvec)
    and ``cells.parquet`` (centroid_id, neighbor_id, _cv), the corpus
    partitioned on disk BY CELL.  Searching a prebuilt index
    (:func:`ivf_topk_prebuilt`) then reads only the probed cells'
    partitions — at 100 TB the index build is one pass amortized over
    every subsequent query batch, and each query touches
    nprobe/n_centroids of the data via partition pruning instead of
    re-assigning the whole corpus per call.

    Same deterministic centroid choice as :func:`ivf_topk`, so a
    prebuilt search returns bit-identical results to the inline form
    (pinned in tests)."""
    import os

    centroids = sample_centroids(corpus, id_col, vec_col, n_centroids)
    os.makedirs(out_dir, exist_ok=True)
    centroids.write.mode("overwrite").parquet(os.path.join(out_dir, "centroids.parquet"))
    cells = ivf_assign(corpus, centroids, id_col, vec_col, nprobe=1).select(
        F.col("_vid").alias("neighbor_id"), F.col("_v").alias("_cv"), "centroid_id"
    )
    (
        cells.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(out_dir, "cells.parquet"))
    )


def ivf_topk_prebuilt(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k search against a :func:`build_ivf_index` index.  The probe
    set's centroid ids become a partition filter on the cells table —
    `.explain` shows ``PartitionFilters`` on ``centroid_id`` via the
    dynamic filter of the equi-join, so unprobed cells are never read."""
    import os

    centroids = spark.read.parquet(os.path.join(index_dir, "centroids.parquet"))
    cells = spark.read.parquet(os.path.join(index_dir, "cells.parquet"))
    probes = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col("_vid").alias("query_id"), F.col("_v").alias("_qv"), "centroid_id"
    )
    cand = (
        probes.join(cells, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .distinct()
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"), F.col("rank").cast("int"))
    )


def refine_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sweeps: int = 1,
) -> DataFrame:
    """Lloyd refinement of IVF centroids: assign every corpus vector to
    its nearest centroid, replace each centroid with its cell's mean
    vector.  ``sweeps`` iterations, each one broadcast-assign (map-only
    over the corpus) + one groupBy(centroid_id) shuffle of (id, vec)
    pairs with map-side partial aggregation — the canonical distributed
    k-means step.  Empty cells keep their previous centroid.

    Deterministic: assignment ties break on centroid_id, and the mean
    is computed with F.aggregate elementwise sums (fixed association
    order within each partition is NOT guaranteed — float sums can
    reorder across partitionings, so refined centroids are
    deterministic only up to float summation order; the recall TEST
    uses behavioral assertions, not bit-equality, and the
    oracle-checked sim3 keeps the unrefined sampling)."""
    cur = centroids
    for _ in range(sweeps):
        assigned = ivf_assign(corpus, cur, id_col, vec_col, nprobe=1)
        # per-dimension partial sums: posexplode keeps the aggregation
        # in plain (centroid, pos) groupBy land — map-side combined,
        # no arrays crossing the shuffle
        dims = assigned.select(
            "centroid_id", F.posexplode("_v").alias("_pos", "_val")
        )
        means = dims.groupBy("centroid_id", "_pos").agg(
            (F.sum("_val") / F.count(F.lit(1))).alias("_mean")
        )
        refined = (
            means.groupBy("centroid_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("_pos", "_mean"))
                ).alias("_pm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("_pm"), lambda s: s["_mean"]).alias("cvec"),
            )
        )
        cur = (
            cur.select("centroid_id", F.col("cvec").alias("_old"))
            .join(refined, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("cvec"), F.col("_old")).alias("cvec"),
            )
        )
    return cur


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    pool: int = 20,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k: greedy selection of
    ``k`` results from the per-query ``pool`` best candidates, each step
    maximizing ``lam * cos(q, c) - (1 - lam) * max_{s in selected}
    cos(c, s)`` — the standard redundancy-penalized re-rank for
    retrieval-augmented pipelines (rank 1 is the pure-relevance argmax;
    ties break on neighbor id at every step).

    Scale shape: stage 1 is the brute-force scan (queries broadcast,
    corpus map-only, per-batch local top-pool before one bounded
    window); stage 2 re-attaches the pool's vectors via ONE equi-join
    on neighbor id, then the greedy loop runs per query group over
    pool-bounded rows in ``applyInPandas`` — the quadratic part is
    pool², never corpus².  All cosines use the same left-to-right IEEE
    fold as sim1, so a SQL oracle unrolling the greedy steps replays
    the exact doubles."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    cand = _brute_force_topk_arrow(
        corpus, queries, id_col, vec_col, k=pool, round_cos=False
    )
    withv = cand.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        ),
        "neighbor_id",
    )
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("mmr_rank", IntegerType()),
            StructField("score", DoubleType()),
        ]
    )

    def greedy(pdf):
        import numpy as np
        import pandas as pd

        qid = int(pdf["query_id"].iloc[0])
        nids = pdf["neighbor_id"].to_numpy()
        cos = pdf["cos"].to_numpy(dtype=np.float64)
        C = np.stack(pdf["_cv"].to_numpy()).astype(np.float64)
        cn = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
        alive = np.ones(len(nids), dtype=bool)
        maxsim = None
        out_n, out_r, out_s = [], [], []
        for step in range(min(k, len(nids))):
            if step == 0:
                scores = cos.copy()
            else:
                scores = lam * cos - (1.0 - lam) * maxsim
            scores_m = np.where(alive, scores, -np.inf)
            order = np.lexsort((nids, -scores_m))
            pick = order[0]
            out_n.append(int(nids[pick]))
            out_r.append(step + 1)
            out_s.append(float(scores[pick]))
            alive[pick] = False
            sv = C[pick]
            sims = np.cumsum(C * sv[None, :], axis=1)[:, -1] / (cn * cn[pick])
            maxsim = sims if maxsim is None else np.maximum(maxsim, sims)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(out_n),
                "neighbor_id": out_n,
                "mmr_rank": out_r,
                "score": out_s,
            }
        )

    out = withv.groupBy("query_id").applyInPandas(greedy, schema=out_schema)
    return out.select(
        "query_id", "neighbor_id", "mmr_rank", F.round("score", 5).alias("score")
    )


# ------------------------------------------- product quantization (PQ)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_sub: int = 8,
    n_codes: int = 8,
    rerank: int | None = None,
) -> DataFrame:
    """Product-quantization ADC top-k — the memory-compression ANN
    variant completing the family (brute sim1 / LSH sim2 / IVF sim3 /
    int8 sim4): each vector is stored as ``n_sub`` one-byte codes
    (here 64 dims -> 8 codes, an 8x compression over float64), and
    queries score against DECODED vectors, never the originals.

    Codebooks are deterministic: the portable-mix centroid sample
    (:func:`sample_centroids`) sliced per subspace — so the DuckDB
    oracle reproduces them exactly; encoding is the L2 argmin via
    ``|c|^2 - 2 x·c`` with SEQUENTIAL left-to-right dot folds
    (tie-break on code id), and the ADC score is the sequential fold
    ``dot(q, decode(x))`` — bit-identical on both engines because
    every float operation has a pinned order.

    100 TB shape: codebooks (n_sub × n_codes × sub_dim doubles) and the
    query batch broadcast; encode+score is ONE Arrow map stage over the
    corpus (per-partition, no shuffle) emitting (query, neighbor,
    score); the only shuffle is the final per-query top-k window over
    |Q|·k-bounded... |Q|·N rows — at scale, cap with a per-partition
    pre-top-k exactly like cosine_topk.  The Python fold inside the
    batch is the oracle-exactness trade; swap faiss's ADC kernels when
    bit-parity with a SQL oracle is not required."""
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, IntegerType,
    )

    cents = sample_centroids(corpus, id_col, vec_col, n_codes)
    cent_rows = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["cvec"]]) for r in cents.collect()
    )
    q_rows = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in queries.select(
            F.col(id_col), F.col(vec_col).cast("array<double>")
        ).collect()
    ]

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def batches(it):
        import pandas as pd

        def fold_dot(a, b):
            s = 0.0
            for x, y in zip(a, b):
                s += x * y
            return s

        dim = len(cent_rows[0][1])
        sd = dim // n_sub
        # per-subspace codebook: list of (cid, subvector, |c|^2-fold)
        books = []
        for m in range(n_sub):
            entries = []
            for cid, cv in cent_rows:
                c = cv[m * sd:(m + 1) * sd]
                entries.append((cid, c, fold_dot(c, c)))
            books.append(entries)

        for pdf in it:
            qid_out, nid_out, sc_out = [], [], []
            for nid, vec in zip(pdf[pdf.columns[0]], pdf[pdf.columns[1]]):
                x = [float(v) for v in vec]
                xhat = []
                for m in range(n_sub):
                    xm = x[m * sd:(m + 1) * sd]
                    best = None
                    for cid, c, cc in books[m]:
                        d = cc - 2.0 * fold_dot(xm, c)
                        if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                            best = (d, cid, c)
                    xhat.extend(best[2])
                for qid, qv in q_rows:
                    if qid == int(nid):
                        continue
                    qid_out.append(qid)
                    nid_out.append(int(nid))
                    sc_out.append(fold_dot(qv, xhat))
            yield pd.DataFrame(
                {"query_id": qid_out, "neighbor_id": nid_out, "score": sc_out}
            )

    scored = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>")
    ).mapInPandas(batches, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    if rerank is not None:
        # the standard PQ recipe: ADC shortlists `rerank` candidates
        # per query, then the TRUE vectors rescore just those — exact
        # top-k quality at shortlist cost.  Untrained sampled codebooks
        # preserve cluster-level structure but tie within clusters;
        # the re-rank restores the fine ordering (pinned in
        # tests/test_ann_recall.py).
        short = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= rerank)
            .select("query_id", "neighbor_id")
        )
        cand = short.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("_nv"),
            ),
            "neighbor_id",
        )
        qmap = dict(q_rows)

        def rescore(it):
            import pandas as pd

            from parquet_common_spark.operators.dedup import _fold_cos

            for pdf in it:
                out_q, out_n, out_s = [], [], []
                for qid, nid, nv in zip(
                    pdf["query_id"], pdf["neighbor_id"], pdf["_nv"]
                ):
                    out_q.append(int(qid))
                    out_n.append(int(nid))
                    out_s.append(_fold_cos(qmap[int(qid)], [float(x) for x in nv]))
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
                )

        scored = cand.mapInPandas(rescore, schema=out_schema)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 5).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def radius_search(
    corpus: DataFrame,
    queries: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact RADIUS search: every (query, corpus) pair with
    ``round(cos, 6) >= tau`` (self excluded) — the all-neighbors
    companion to brute_force_topk's top-k (dedup wants "everything this
    close", not "the k closest").

    Same scale shape as the arrow top-k engine: queries ride to every
    task (smallness contract), the corpus is ONE map-only numpy pass,
    and — unlike top-k — no global window at all: the radius predicate
    is decided locally per row, so the output needs no shuffle.  Output
    size is data-dependent (τ is the knob); cosines use the same
    left-to-right cumsum accumulation as the JVM fold / DuckDB
    list_dot_product, keeping the oracle hash-exact.

    Zero-norm vectors (query or corpus side) have no defined cosine;
    such pairs are EXCLUDED by an explicit norm>0 mask rather than left
    to NaN/inf comparison semantics, which differ between numpy
    (NaN >= τ is False) and DuckDB (NaN compares greater than every
    number) — defined behavior instead of engine-dependent."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    q_rows = queries.select(
        F.col(id_col).cast("long"), F.col(vec_col).cast("array<double>")
    ).collect()
    qids = [r[0] for r in q_rows]
    qvecs = [list(r[1]) for r in q_rows]
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        Q = np.asarray(qvecs, dtype=np.float64)
        qn = np.sqrt(np.cumsum(Q * Q, axis=1)[:, -1]) if len(qvecs) else np.empty(0)
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf.iloc[:, 0].to_numpy()
            C = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            cn = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
            rq, rn, rc = [], [], []
            for qi, qid in enumerate(qids):
                dots = np.cumsum(C * Q[qi][None, :], axis=1)[:, -1]
                denom = qn[qi] * cn
                ok = denom > 0.0  # zero-norm pairs excluded by contract
                cos = np.zeros_like(dots)
                np.divide(dots, denom, out=cos, where=ok)
                cos = np.round(cos, 6)
                mask = ok & (ids != qid) & (cos >= tau)
                rq.extend([qid] * int(mask.sum()))
                rn.extend(ids[mask].tolist())
                rc.extend(cos[mask].tolist())
            yield pd.DataFrame(
                {"query_id": rq, "neighbor_id": rn, "cos": rc}
            )

    src = corpus.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    return src.mapInPandas(batches, schema=out_schema)
