"""A/B: bucketed-table select layout vs directory layout (r13 item 3).

Regenerates the F2 bucketed fixture with the one-file-per-bucket write,
verifies the layout, then interleaves the two heavy select workloads
over both layouts (noop sink, alternated, min/median-of-N).

Usage: python tools/ab_bucketed.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from parquet_common_spark.session import get_spark
    from parquet_common_spark.benchmarks import select_bench as SB
    from parquet_common_spark import ParquetQueryable

    spark = get_spark("ab-bucketed")
    spark.sparkContext.setLogLevel("ERROR")

    # force regeneration with the new writer
    prefix = SB.BUCKETED_PREFIX
    for suffix in ("_series", "_samples"):
        t = f"{prefix}{suffix}"
        if spark.catalog.tableExists(t):
            spark.sql(f"DROP TABLE {t}")
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for suffix in ("_series", "_samples"):
        shutil.rmtree(os.path.join(wh, f"{prefix}{suffix}"), ignore_errors=True)

    t0 = time.perf_counter()
    SB.generate_bucketed_dataset(spark, prefix)
    print(f"regen took {time.perf_counter() - t0:.1f}s")
    n_series_files = len(
        [f for f in os.listdir(os.path.join(wh, f"{prefix}_series")) if f.endswith(".parquet")]
    )
    sdir = os.path.join(wh, f"{prefix}_samples", "s_time_bucket=0")
    n_sample_files = len([f for f in os.listdir(sdir) if f.endswith(".parquet")])
    print(f"files: series={n_series_files} samples(bucket0)={n_sample_files}")

    SB.generate_dataset(spark)  # directory fixture (cached)
    qb = ParquetQueryable.from_tables(spark, [prefix])
    qd = ParquetQueryable.from_paths(spark, [SB.BENCH_DIR])
    by_name = dict(SB.WORKLOADS)

    import re

    for name in SB.BUCKETED_WORKLOADS:
        ms = by_name[name]
        selb = qb.select(0, 120, ms)
        seld = qd.select(0, 120, ms)
        cb, cd = selb.count(), seld.count()
        print(f"{name}: rows bucketed={cb} directory={cd} match={cb == cd}")
        pb = selb._jdf.queryExecution().executedPlan().toString()
        print(
            f"  bucketed plan: Exchange={len(re.findall('Exchange', pb))} "
            f"Sort={len(re.findall(r'[*]?[(]?[0-9]*[)]? ?Sort ', pb))} SMJ={'SortMergeJoin' in pb}"
        )
        # warm both
        SB._force(selb)
        SB._force(seld)
        tb, td = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            SB._force(selb)
            tb.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            SB._force(seld)
            td.append(round(time.perf_counter() - t0, 3))
        print(f"  bucketed  {tb} min={min(tb)}")
        print(f"  directory {td} min={min(td)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
