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
