"""Interleaved A/B: final ``orderBy`` vs single-partition contractual sort
on queries whose aggregated output is tiny by contract (e1 5 rows, q1 4,
q5 5, q9 ~175).

The final ``Sort <- Exchange(rangepartitioning)`` on a handful of rows
costs a boundary-sampling pass plus a shuffle stage per query (guide
§2.4 "an orderBy used only to make output deterministic").  The variant
replaces it with ``coalesce(1).sortWithinPartitions(...)`` — one merge
task over the agg's shuffle output, CONTRACTUAL total order (a single
sorted partition), no sampling job, one exchange fewer.

Usage: python tools/ab_sort_tail.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from parquet_common_spark.session import get_spark
    from parquet_common_spark.plans.common import REGISTRY

    spark = get_spark("ab_sort_tail")
    spark.sparkContext.setLogLevel("ERROR")
    E.queries()

    # hand-built variants (the final sort keys copied from the source)
    from parquet_common_spark.plans.common import load, dsum

    def e1_v(spark, sf_dir):
        t = load(spark, sf_dir, "events")
        return (
            t["events"]
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                dsum(F.col("value"), 2).alias("total_value"),
                F.round(dsum(F.col("value"), 2) / F.count(F.lit(1)), 6).alias("avg_value"),
            )
            .coalesce(1)
            .sortWithinPartitions("event_type")
        )

    from parquet_common_spark.plans.common import spread

    def q1_v(spark, sf_dir):
        t = load(spark, sf_dir, "lineitem")
        return (
            spread(t["lineitem"], None, "l_orderkey")
            .where(F.col("l_shipdate") <= "2000-12-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("sum_disc_price"),
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                F.round(dsum(F.col("l_extendedprice"), 2) / F.count(F.lit(1)), 6).alias("avg_price"),
                F.round(dsum(F.col("l_discount"), 2) / F.count(F.lit(1)), 6).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .coalesce(1)
            .sortWithinPartitions("l_returnflag", "l_linestatus")
        )

    def q5_v(spark, sf_dir):
        t = load(spark, sf_dir)
        return (
            t["customer"]
            .join(
                t["orders"].where(
                    (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
                ),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
            .join(
                F.broadcast(t["supplier"]),
                (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
            )
            .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(t["region"]).where(F.col("r_name") == "ASIA"), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
            .coalesce(1)
            .sortWithinPartitions(F.desc("revenue"), "n_name")
        )

    def q9_v(spark, sf_dir):
        t = load(spark, sf_dir)
        return (
            spread(t["lineitem"], None, "l_orderkey")
            .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
            .agg(
                dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.1 * F.col("p_retailprice") * F.col("l_quantity"),
                    4,
                ).alias("profit")
            )
            .coalesce(1)
            .sortWithinPartitions("nation", "o_year")
        )

    variants = {
        "e1_event_type_stats": e1_v,
        "q1_pricing_summary": q1_v,
        "q5_local_supplier_volume": q5_v,
        "q9_product_profit": q9_v,
    }

    # ---- equality gate: rows AND order must match the declared query
    for name, vfn in variants.items():
        a = REGISTRY[name].fn(spark, SF_DIR).collect()
        b = vfn(spark, SF_DIR).collect()
        assert a == b, f"{name}: variant rows differ"
        print(f"{name}: equality OK ({len(a)} rows, order identical)")

    # ---- interleaved timing
    times: dict[str, dict[str, list[float]]] = {
        n: {"base": [], "variant": []} for n in variants
    }
    for rep in range(REPS):
        for name, vfn in variants.items():
            for label, fn in (("base", REGISTRY[name].fn), ("variant", vfn)):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                times[name][label].append(round(time.perf_counter() - t0, 3))

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2

    for name, r in times.items():
        b, v = r["base"], r["variant"]
        print(
            f"{name:28s} base min={min(b):.3f} med={med(b):.3f} {b} | "
            f"variant min={min(v):.3f} med={med(v):.3f} {v}"
        )


if __name__ == "__main__":
    main()
