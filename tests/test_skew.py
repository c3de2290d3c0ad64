"""Skew stress: AQE skew-join splitting and map-side partial
aggregation are the two mechanisms that keep a pathological hot key
(one user owning 50% of events) from serializing a 100 TB job onto one
task.  Both are session defaults (session.py pins
spark.sql.adaptive.skewJoin.enabled); these tests lower only the SIZE
thresholds so the optimizer triggers at test scale — the mechanism,
not the thresholds, is what's being pinned.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F


@contextmanager
def _conf(spark, overrides):
    old = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# thresholds scaled down so a ~10 MB test corpus exhibits what a
# multi-TB shuffle would at the defaults (256 MB partitions)
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
}


def _hot_events(spark, n=400_000):
    """Events where user 0 owns 50% of all rows (every even id) and the
    rest spread over 1000 users — the e-family / d2-band hot-key shape."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 1000 + 1)
        .cast("long")
        .alias("user_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )


def test_aqe_skew_join_splits_hot_key(spark):
    """A shuffle join whose key distribution is 50%-on-one-key must NOT
    put half the fact table in one task: AQE's OptimizeSkewedJoin
    splits the hot partition into advisory-sized slices (each joined
    against a replicated copy of the dim side), observable in the final
    adaptive plan as SortMergeJoin(skew=true) over an
    'AQEShuffleRead skewed' — per-task input is then bounded by the
    advisory size regardless of key skew.  Results stay exact."""
    ev = _hot_events(spark)
    users = spark.range(1001).select(
        F.col("id").alias("user_id"), F.concat(F.lit("u"), F.col("id")).alias("name")
    )
    with _conf(spark, _SKEW_CONFS):
        joined = ev.join(users, "user_id")
        rows = joined.count()
        assert rows == 400_000  # inner join: every event has its user
        # collect() on THIS DataFrame finalizes its adaptive plan (a
        # write/count would execute a separate wrapped plan)
        j2 = ev.join(users, "user_id").select("user_id")
        hot = sum(1 for r in j2.collect() if r["user_id"] == 0)
        assert hot == 200_000
        plan = j2._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    # the skewed side's shuffle read shows the split ("skewed", possibly
    # "coalesced and skewed" after partition coalescing)
    assert any(
        "AQEShuffleRead" in ln and "skewed" in ln for ln in plan.splitlines()
    ), plan[:2000]


def test_hot_key_aggregation_is_partially_aggregated(spark):
    """The e-family groupBys survive the same hot key through map-side
    combine, not AQE (a skewed AGGREGATION partition cannot be split —
    its reduce input must co-locate): partial HashAggregate runs
    before the exchange, so the shuffle carries one row per
    (task, key), never the hot key's raw rows.  Pin the partial
    aggregate's position below the exchange and the exact counts."""
    ev = _hot_events(spark)
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    out = {r["user_id"]: r["n"] for r in agg.collect()}
    assert out[0] == 200_000
    assert sum(out.values()) == 400_000
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # partial-aggregation shape: HashAggregate(keys)(partial) -> Exchange
    # -> HashAggregate(final); the partial node must appear BELOW (after
    # in toString order) the exchange node it feeds
    lower = plan.lower()
    first_exchange = lower.index("exchange hashpartitioning")
    assert "hashaggregate" in lower[first_exchange:], plan[:2000]


def test_band_join_hot_bucket_bounded_by_cap_and_swept_for_cartesians(spark):
    """d2's LSH band join under a boilerplate flood: a degenerate band
    bucket (every doc identical) is the join-side skew the gram/band
    family handles STRUCTURALLY (band_cap chaining, hot-hash
    frequency caps) rather than by AQE alone — candidate volume is
    O(n*cap), never O(n^2), and the executed plan stays free of
    cartesian products even in the degenerate case."""
    from parquet_common_spark.operators import dedup as D

    n = 300
    rows = [(i, "the same boilerplate sentence repeated in every doc") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs_df = D.minhash_lsh_pairs(df, "doc_id", "text", tau=0.25, band_cap=4)
    pairs = pairs_df.collect()
    assert 0 < len(pairs) <= n * 4
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
