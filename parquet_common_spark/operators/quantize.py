"""Embedding quantization: symmetric per-vector int8 compression.

The 100 TB lever for similarity search: a float32 corpus is 4 bytes/dim;
symmetric int8 is 1 byte/dim + one scale per vector (4x less scan I/O and
4-8x cheaper dot products under SIMD).  Standard IVF/HNSW deployments
quantize the corpus and re-rank the top candidates at full precision;
`similarity.py`'s LSH/IVF candidate generators compose directly with a
quantized corpus.

Scheme (the common symmetric linear quantizer):
    scale  = max(|v|) / 127          (per vector; eps-floored)
    q_i    = floor(v_i / scale + .5) in [-127, 127]
    v_i    ≈ q_i * scale

Everything is a Column expression — quantization is map-only, and
COSINE IN QUANTIZED SPACE NEEDS NO SCALES (they cancel in the ratio), so
ranking reduces to integer dot products: exact, engine-independent
arithmetic, which is what makes the quantized search oracle-checkable
bit-for-bit (sim4) — no float-fold alignment needed anywhere.

Rounding is the portable ``floor(x + 0.5)`` half-up (Spark's round() is
HALF_UP, DuckDB's is banker's — identical floor available in both).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_EPS = 1e-30  # zero-vector guard; scale of an all-zero vector is eps/127


def vec_scale(vec: Column) -> Column:
    """Per-vector symmetric scale: max(|v|)/127, eps-floored."""
    return F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x))), F.lit(_EPS)
    ) / F.lit(127.0)


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec", scale_col: str = "qscale"
) -> DataFrame:
    """Add int8 codes (as array<long> — exact in any engine; cast to
    array<tinyint> at write time for 1-byte storage) and the per-vector
    scale.  Map-only."""
    v = F.col(vec_col).cast("array<double>")
    s = vec_scale(v)
    q = F.transform(v, lambda x: F.floor(x / s + F.lit(0.5)).cast("long"))
    return df.withColumn(scale_col, s).withColumn(out_col, q)


def dequantize(qvec: Column, scale: Column) -> Column:
    return F.transform(qvec, lambda x: x.cast("double") * scale)


def _idot(a: Column, b: Column) -> Column:
    """Integer dot product — exact, order-independent."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def quantized_cosine(a: Column, b: Column) -> Column:
    """cos over int8 codes; the per-vector scales cancel, so this is
    integer dots + two square roots — bit-identical across engines."""
    return _idot(a, b) / (F.sqrt(_idot(a, a).cast("double")) * F.sqrt(_idot(b, b).cast("double")))


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k in int8 space: quantize both sides (map-only),
    broadcast the queries, rank by quantized cosine.  Same plan shape as
    the float brute force (corpus scanned once, no shuffle of the
    corpus); at scale, feed the LSH/IVF candidate generators with the
    quantized corpus and re-rank survivors at full precision."""
    qc = quantize_int8(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("_cq")
    )
    qq = quantize_int8(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("_qq")
    )
    scored = (
        F.broadcast(qq)
        .crossJoin(qc)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("qcos", quantized_cosine(F.col("_qq"), F.col("_cq")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("qcos", 5).alias("qcos"),
            F.col("rank").cast("int"),
        )
    )
