"""Interleaved A/B: anchored-rlike vs startswith-OR compilation of the
NegativeRegex matcher shape (r13 matcher rewrite), over the primary
select layout.

Usage: python tools/ab_negregex.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import parquet_common_spark.matchers as M
    from parquet_common_spark import ParquetQueryable
    from parquet_common_spark.benchmarks import select_bench as SB
    from parquet_common_spark.session import get_spark

    spark = get_spark("ab-negregex")
    spark.sparkContext.setLogLevel("ERROR")
    q = ParquetQueryable.from_tables(
        spark, [SB.generate_bucketed_dataset(spark, SB.BUCKETED_PREFIX)]
    )
    by_name = dict(SB.WORKLOADS)

    real = M._as_prefix_alternation
    for wl in ("NegativeRegexSingleMetric", "NegativeRegexMultipleMetrics"):
        ms = by_name[wl]
        M._as_prefix_alternation = lambda p: None  # old compilation
        old_sel = q.select(0, 120, ms)
        M._as_prefix_alternation = real  # new compilation
        new_sel = q.select(0, 120, ms)
        a = sorted(map(tuple, old_sel.collect()))
        b = sorted(map(tuple, new_sel.collect()))
        print(f"{wl}: rows equal={a == b} n={len(a)}")
        if a != b:
            return 1
        SB._force(old_sel)
        SB._force(new_sel)
        to, tn = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            SB._force(old_sel)
            to.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            SB._force(new_sel)
            tn.append(round(time.perf_counter() - t0, 3))
        print(f"  old(rlike)      {to} min={min(to)}")
        print(f"  new(startswith) {tn} min={min(tn)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
