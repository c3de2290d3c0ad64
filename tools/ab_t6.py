"""Interleaved A/B: quadratic vs run-length top_bigram on t6 (r13).

Builds the t6 pipeline twice — once with the old O(|distinct|*|grams|)
count-per-distinct-gram expression (inlined here), once with the
committed O(n log n) sorted-run form — checks collect() equality
including order, then alternates noop-forced runs.

Usage: python tools/ab_t6.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def old_top_bigram(grams):
    counted = F.transform(
        F.array_distinct(grams),
        lambda g: F.struct(
            F.size(F.filter(grams, lambda x: x == g)).alias("c"), g.alias("g")
        ),
    )
    return F.get(F.sort_array(counted, asc=False), 0)


def t6_variant(spark, sf_dir, top_fn):
    from parquet_common_spark.operators import text as T
    from parquet_common_spark.plans.common import load, presorted

    _REP_DUP_MAX, _REP_TOP2_MAX = 0.60, 0.20
    docs = load(spark, sf_dir, "documents")["documents"]
    staged = (
        presorted(docs.select("doc_id", "text"), "doc_id")
        .withColumn("_toks", T.tokens(T.normalize_text(F.col("text"))))
        .withColumn("_grams", T.word_bigrams(F.col("_toks")))
        .withColumn("_top", top_fn(F.col("_grams")))
    )
    dupf = F.round(T.duplicate_token_fraction(F.col("_toks")), 6)
    topf = F.round(
        T.top_bigram_char_fraction(F.col("_grams"), F.col("_toks"), F.col("_top")), 6
    )
    return (
        staged.select(
            "doc_id",
            dupf.alias("dup_token_frac"),
            F.col("_top")["g"].alias("top_bigram"),
            F.col("_top")["c"].cast("long").alias("top_bigram_count"),
            topf.alias("top_bigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("dup_token_frac") <= _REP_DUP_MAX)
            & (F.col("top_bigram_frac") <= _REP_TOP2_MAX),
        )
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    from parquet_common_spark.operators import text as T
    from parquet_common_spark.session import get_spark

    spark = get_spark("ab-t6")
    spark.sparkContext.setLogLevel("ERROR")

    old_df = t6_variant(spark, sf_dir, old_top_bigram)
    new_df = t6_variant(spark, sf_dir, T.top_bigram)
    a, b = old_df.collect(), new_df.collect()
    print("rows equal incl order:", a == b, len(a))
    if a != b:
        return 1

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(new_df)
    force(old_df)  # warm both
    to, tn = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(old_df)
        to.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        force(new_df)
        tn.append(round(time.perf_counter() - t0, 3))
    to_s, tn_s = sorted(to), sorted(tn)
    print(f"old {to} min={to_s[0]} med={to_s[len(to_s)//2]}")
    print(f"new {tn} min={tn_s[0]} med={tn_s[len(tn_s)//2]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
