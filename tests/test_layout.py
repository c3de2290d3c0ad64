"""Z-order clustering: identical results, strictly better footer-stat
pruning on the secondary column than a linear sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from parquet_common_spark.operators.layout import cluster_zorder


def _files_overlapping(dirname: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(n_files_overlapping_range, n_files_total) from parquet footers."""
    total = hit = 0
    for f in glob.glob(f"{dirname}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        total += 1
        if mx >= lo and mn <= hi:
            hit += 1
    return hit, total


def test_zorder_prunes_secondary_column(spark, tmp_path):
    # two decorrelated uniform dimensions from independent hash mixes
    df = spark.range(60_000).select(
        (F.xxhash64(F.col("id")) % 10_000).alias("x"),
        (F.xxhash64(F.col("id"), F.lit(1)) % 10_000).alias("y"),
    ).select(F.abs(F.col("x")).alias("x"), F.abs(F.col("y")).alias("y"))

    lin = str(tmp_path / "linear")
    zod = str(tmp_path / "zorder")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lin)
    cluster_zorder(df, ["x", "y"], bits=10, num_files=16).write.parquet(zod)

    lo, hi = 1_000, 1_400  # ~4% of the y domain
    hit_lin, tot_lin = _files_overlapping(lin, "y", lo, hi)
    hit_z, tot_z = _files_overlapping(zod, "y", lo, hi)
    assert tot_lin >= 8 and tot_z >= 8
    # linear-by-x has y uniform in every file: no pruning at all
    assert hit_lin == tot_lin
    # z-order must prune at least half the files on the SECONDARY column
    assert hit_z <= tot_z // 2, (hit_z, tot_z)

    # layout never changes results
    a = sorted(
        map(tuple, spark.read.parquet(lin).where(F.col("y").between(lo, hi)).collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(zod).where(F.col("y").between(lo, hi)).collect())
    )
    assert a == b and len(a) > 0

    # and the leading column still prunes too (z-order is not a trade-away)
    hx_z, _ = _files_overlapping(zod, "x", lo, hi)
    assert hx_z <= tot_z // 2


def test_cluster_zorder_all_null_and_empty_degrade_gracefully(spark):
    """ADVICE r7: an all-NULL clustered column (None min/max bounds) or
    an empty frame must degrade to no-op clustering, not TypeError; and
    per-row NULLs must never produce a NULL Z key."""
    from pyspark.sql import functions as F

    from parquet_common_spark.operators.layout import cluster_zorder

    df = spark.range(100).select(
        F.col("id").alias("a"),
        F.lit(None).cast("double").alias("b"),
    )
    out = cluster_zorder(df, ["a", "b"], bits=8, num_files=4)
    assert out.count() == 100 and "_z" not in out.columns

    empty = df.where(F.lit(False))
    assert cluster_zorder(empty, ["a", "b"], bits=8, num_files=2).count() == 0

    # sparse NULLs in an otherwise populated column: all rows survive
    sparse = spark.range(50).select(
        F.col("id").alias("a"),
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id")).alias("b"),
    )
    assert cluster_zorder(sparse, ["a", "b"], bits=8, num_files=2).count() == 50
