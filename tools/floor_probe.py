"""Probe the Python/Arrow stage floor: identity map stages at 1/8/32
tasks vs the same job with no Python stage, min/median of N reps.
Run on a settled host; noop sink per guide §1.4."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from parquet_common_spark.session import get_spark

spark = get_spark("floor-probe")
spark.sparkContext.setLogLevel("ERROR")

import pandas as pd  # noqa


def timeit(label, fn, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:44s} min {ts[0]:.3f}  med {ts[len(ts)//2]:.3f}  all {[round(x,3) for x in ts]}")


def ident_pandas(it):
    for b in it:
        yield b


def ident_arrow(it):
    for b in it:
        yield b


# warm the pool exactly like bench.py does
spark.range(32).repartition(32).mapInPandas(ident_pandas, "id long").count()

for n in (1, 8, 32):
    base = spark.range(100_000).repartition(n)
    sink = lambda df: df.write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(f"jvm-only {n}")
    timeit(f"jvm-only           {n:2d} tasks", lambda: sink(base.selectExpr("id * 2 as id")))
    spark.sparkContext.setJobDescription(f"mapInPandas {n}")
    timeit(f"identity mapInPandas {n:2d} tasks", lambda: sink(base.mapInPandas(ident_pandas, "id long")))
    spark.sparkContext.setJobDescription(f"mapInArrow {n}")
    timeit(f"identity mapInArrow  {n:2d} tasks", lambda: sink(base.mapInArrow(ident_arrow, "id long")))

spark.stop()
