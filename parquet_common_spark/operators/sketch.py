"""Count-min sketch as a plain Spark aggregation — deterministic and
oracle-replayable, unlike the JVM's seed-opaque CountMinSketch.

The sketch state is a (row, column) -> count table with ``D`` hash rows
of ``W`` columns: row r hashes a token to column ``(phash(token) * A_r
+ B_r) % P % W`` (the same affine-over-poly-hash family the minhash
signatures use — plain BIGINT arithmetic any engine reproduces
exactly), and ``estimate(token) = min_r table[r][h_r(token)]``.  The
classic guarantees hold: the estimate NEVER undercounts, and
overcounts by at most the collision mass in its lightest row.

100 TB shape: building the table is ONE map-side-combined groupBy whose
output is bounded by D*W rows (the sketch size, not the data) — the
canonical mergeable-sketch pattern where partial sketches combine by
cell-wise addition, here expressed as partial aggregation so Spark does
the merge for free.  Probing broadcasts the tiny table.  Reference
surface: complements a1 (HLL distinct) and a2 (GK quantiles) with the
frequency sketch of the approximate-aggregation family
(`/root/reference` delegates all sketches upstream; SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parquet_common_spark.operators.text import HASH_P, char_poly_hash, tokens

CMS_D = 4       # hash rows
CMS_W = 256     # columns per row
CMS_A = [37 + 101 * r for r in range(CMS_D)]  # minhash affine family
CMS_B = [91 + 57 * r for r in range(CMS_D)]


def cms_column(token_hash, r: int):
    """Column index of ``token_hash`` in sketch row ``r``."""
    return ((token_hash * F.lit(CMS_A[r]) + F.lit(CMS_B[r])) % F.lit(HASH_P)) % F.lit(
        CMS_W
    )


def count_min_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the CMS table over the whitespace tokens of ``text_col``:
    one row per occupied (r, c) cell with its count.  ONE shuffle,
    map-side combined, output bounded by D*W cells."""
    th = df.select(F.explode(tokens(F.col(text_col))).alias("_tok")).select(
        char_poly_hash(F.col("_tok")).alias("_th")
    )
    cells = th.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), cms_column(F.col("_th"), r).alias("c")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("_cell")
    )
    return cells.groupBy(
        F.col("_cell.r").alias("r"), F.col("_cell.c").alias("c")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimates(
    probes: DataFrame, table: DataFrame, token_col: str = "token"
) -> DataFrame:
    """Estimate each probe token's frequency from the sketch table:
    ``min_r table[r][h_r(token)]`` — D broadcast lookups of the tiny
    table, then a least() fold.  Adds ``est_cnt``."""
    out = probes.withColumn("_th", char_poly_hash(F.col(token_col)))
    t = F.broadcast(table)
    for r in range(CMS_D):
        out = out.join(
            t.where(F.col("r") == r).select(
                F.col("c").alias(f"_c{r}"), F.col("cnt").alias(f"_e{r}")
            ),
            on=cms_column(F.col("_th"), r) == F.col(f"_c{r}"),
            how="left",
        )
    est = F.least(*[F.coalesce(F.col(f"_e{r}"), F.lit(0)) for r in range(CMS_D)])
    keep = [c for c in probes.columns]
    return out.select(*keep, est.alias("est_cnt"))


# ---------------------------------------------------------- Bloom filter

BLOOM_K = 3        # hash functions
BLOOM_M = 8192     # bit positions
BLOOM_A = [29 + 67 * r for r in range(BLOOM_K)]   # same affine family
BLOOM_B = [17 + 83 * r for r in range(BLOOM_K)]


def bloom_position(key_hash, r: int, m: int = BLOOM_M):
    """Bit position of ``key_hash`` under hash function ``r``."""
    return (
        (key_hash * F.lit(BLOOM_A[r]) + F.lit(BLOOM_B[r])) % F.lit(HASH_P)
    ) % F.lit(m)


def bloom_bits(df: DataFrame, key_col: str, m: int = BLOOM_M) -> DataFrame:
    """Build the Bloom membership set over a key column: one row per
    SET bit position (``pos``) — bounded by BLOOM_M rows regardless of
    input size.  Numeric keys hash directly through the affine family;
    pre-hash strings with ``char_poly_hash`` first.  ONE map-side-
    combined distinct whose output is sketch-sized, the third classic
    mergeable sketch next to HLL (a1) and count-min (a3): partial bit
    sets union cell-wise, which IS Spark's distinct merge."""
    kh = df.select(F.col(key_col).cast("long").alias("_kh"))
    return (
        kh.select(
            F.explode(
                F.array(
                    *[bloom_position(F.col("_kh"), r, m) for r in range(BLOOM_K)]
                )
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame, bits: DataFrame, key_col: str, m: int = BLOOM_M
) -> DataFrame:
    """Probe each key against the bit set: ``maybe`` is true iff ALL
    BLOOM_K positions are set — never a false negative, false positives
    bounded by (1-e^{-kn/m})^k.  The bit set is broadcast (<= BLOOM_M
    rows by construction — the smallness-by-contract broadcast class);
    the probe side explodes k positions, joins, and counts matches —
    map-only against the broadcast, one groupBy(key) of fan-in k.
    This is the join-prefilter shape: at 100 TB, probe the fact table
    against a dimension's Bloom bits BEFORE the real join and skip the
    shuffle for definitely-absent rows."""
    pos = probes.select(
        F.col(key_col),
        F.col(key_col).cast("long").alias("_kh"),
    ).select(
        key_col,
        F.explode(
            F.array(*[bloom_position(F.col("_kh"), r, m) for r in range(BLOOM_K)])
        ).alias("pos"),
    )
    hits = (
        pos.join(F.broadcast(bits), "pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return probes.join(hits, key_col, "left").select(
        probes["*"],
        (F.coalesce(F.col("_n"), F.lit(0)) == BLOOM_K).alias("maybe"),
    )
