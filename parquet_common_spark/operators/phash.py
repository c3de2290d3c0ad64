"""Perceptual-hash image deduplication (pHash).

The pixel-space counterpart of the embedding near-dup operator: two
images that LOOK the same (same photo re-encoded at a different JPEG
quality, format-converted PNG<->JPEG, lightly noised) hash to nearby
64-frame DCT signatures even though their bytes share nothing.  The
classic pHash recipe:

  decode -> grayscale -> 32x32 area resize -> 2D DCT-II -> keep the
  top-left 8x8 low-frequency block -> drop the DC term -> threshold
  the 63 coefficients at their median -> 63-bit signature.

Decoding uses the repo's own stdlib codecs (functions/mediacodec.py —
PNG all depths + baseline/progressive JPEG), so the operator is real
end to end; payloads that fail to decode quarantine as NULL hashes
rather than failing the job (same stance as decode_media).

Pair search reuses the SimHash pigeonhole discipline: the signature is
split into (max_hamming+1) disjoint bit segments; a pair within the
radius must agree exactly on >=1 segment, so candidates come from a
segment-key equi-join — no cross join at any scale, recall exactly 1.0
(pigeonhole is deterministic, unlike probabilistic LSH).

100 TB shape: hashing is one Arrow map stage over payload bytes
(embarrassingly parallel); the only shuffles carry (id, 64-bit key)
pairs and the bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PHASH_BITS = 63


def _phash_bytes(payload: bytes) -> int | None:
    """63-bit perceptual hash of an encoded image, None if undecodable."""
    import numpy as np

    from parquet_common_spark.functions import mediacodec as MC

    try:
        kind = MC.sniff_media(payload)
        if kind == "png":
            w, h, px = MC.decode_png(payload)
        elif kind == "jpeg":
            from parquet_common_spark.functions.jpegcodec import decode_jpeg

            w, h, px = decode_jpeg(payload)
        else:
            return None
    except Exception:
        return None
    px = np.asarray(px, dtype=np.float64)
    if px.ndim == 2:
        gray = px
    else:
        gray = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    # 32x32 area resize: average over equal index bins (reduceat)
    import numpy as np  # noqa: F811

    def bins(n):
        return (np.arange(32, dtype=np.int64) * n) // 32

    h0, w0 = gray.shape
    rows = np.add.reduceat(gray, bins(h0), axis=0)
    rcnt = np.diff(np.append(bins(h0), h0))[:, None]
    cols = np.add.reduceat(rows / rcnt, bins(w0), axis=1)
    ccnt = np.diff(np.append(bins(w0), w0))[None, :]
    small = cols / ccnt
    # 2D DCT-II, orthonormal
    k = np.arange(32)
    D = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 64.0)
    D[0] *= np.sqrt(1.0 / 32.0)
    D[1:] *= np.sqrt(2.0 / 32.0)
    coef = D @ small @ D.T
    block = coef[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = 0
    for i, c in enumerate(block):
        if c > med:
            bits |= 1 << i
    return bits


def image_phash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(_id, _ph) perceptual hashes; NULL for undecodable payloads."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("_id", LongType()), StructField("_ph", LongType())])

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, phs = [], []
            for i, p in zip(pdf[pdf.columns[0]], pdf[pdf.columns[1]]):
                ids.append(int(i))
                phs.append(_phash_bytes(bytes(p)) if p is not None else None)
            yield pd.DataFrame({"_id": ids, "_ph": phs}).astype({"_ph": "Int64"})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(batches, schema=schema)


def phash_pairs(
    df: DataFrame, id_col: str, payload_col: str, max_hamming: int = 6
) -> DataFrame:
    """Image pairs within ``max_hamming`` bits of pHash distance —
    exact result via the pigeonhole segment join (recall 1.0)."""
    s = image_phash(df, id_col, payload_col).where(F.col("_ph").isNotNull()).persist()
    n_seg = max_hamming + 1
    base, extra = divmod(PHASH_BITS, n_seg)
    segs, off = [], 0
    for j in range(n_seg):
        w = base + (1 if j < extra else 0)
        segs.append((off, w))
        off += w
    # (segment index, segment bits) as TWO join keys: a 63-bit hash
    # leaves no headroom to tag the segment into one signed long
    bands = s.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_ph"), o).bitwiseAND(F.lit((1 << w) - 1))
                    for o, w in segs
                ]
            )
        ).alias("_segj", "_segv"),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["_segj", "_segv"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(s.select(F.col("_id").alias("id_a"), F.col("_ph").alias("ph_a")), "id_a")
        .join(s.select(F.col("_id").alias("id_b"), F.col("_ph").alias("ph_b")), "id_b")
        .withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )
