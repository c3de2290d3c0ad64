"""Capture .explain("formatted") for the 11 select workloads into
plans/<round>/ ($PCS_PLANS_ROUND, default r13).

Tags:
  before — directory layout + pre-r13 matcher compilation (rlike for
           prefix alternations), i.e. the r12 shape
  after  — bucketed one-file-per-bucket layout + r13 matcher rewrites

Usage: python tools/capture_select_plans.py {before|after}
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    import parquet_common_spark.matchers as M
    from parquet_common_spark import ParquetQueryable
    from parquet_common_spark.benchmarks import select_bench as SB
    from parquet_common_spark.session import get_spark

    spark = get_spark("capture-select-plans")
    spark.sparkContext.setLogLevel("ERROR")
    if tag == "before":
        M._as_prefix_alternation = lambda p: None
        q = ParquetQueryable.from_paths(spark, [SB.generate_dataset(spark)])
    else:
        q = ParquetQueryable.from_tables(
            spark, [SB.generate_bucketed_dataset(spark, SB.BUCKETED_PREFIX)]
        )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PCS_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, matchers in SB.WORKLOADS:
        sel = q.select(0, 120, matchers)
        plan = sel._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"select_{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
