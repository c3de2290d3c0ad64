"""Analytic-layer spot checks at sf0.001 (full oracle sweep lives in
tools/check_correctness.py; these keep pytest self-contained)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registry(spark):
    import __spark_entry__ as E

    E.queries()
    from parquet_common_spark.plans.common import REGISTRY

    return REGISTRY


def _compare(spark, duck, registry, name, sf_dir):
    q = registry[name]
    srows = sorted(tuple(r) for r in q.fn(spark, sf_dir).collect())
    orows = sorted(tuple(r) for r in duck.execute(q.oracle).fetchall())
    assert len(srows) == len(orows), f"{name}: {len(srows)} != {len(orows)}"


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q6_forecast_revenue", "e1_event_type_stats", "d1_exact_dedup"])
def test_rowcounts_match_oracle(spark, duck, registry, name, sf_dir):
    _compare(spark, duck, registry, name, sf_dir)


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40


def test_approx_distinct_bound(spark, registry, sf_dir):
    rows = registry["a1_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows, "a1 returned no groups"
    for r in rows:
        assert r["within_bound"], (
            f"approx_count_distinct outside 3x-rsd bound for {r['event_type']} "
            f"(exact={r['exact_users']})"
        )


def test_forward_asof_boundary_semantics(spark):
    """e9's window formulation vs hand-computed as-of rules: a purchase
    at the SAME timestamp as the click never matches (strictly-after),
    a purchase exactly at the 1h tolerance matches, 1µs past it does
    not, and an out-of-tolerance first purchase masks nothing (it IS
    the minimum, so the result is correctly NULL)."""
    from pyspark.sql import Window, functions as F

    H = 3_600_000_000  # µs
    rows = [
        # (event_id, user_id, us, event_type)
        (1, 1, 1_000_000, "click"),
        (2, 1, 1_000_000, "purchase"),      # same ts -> excluded
        (3, 1, 1_000_000 + H, "purchase"),  # exactly 1h -> included
        (4, 2, 5_000_000, "click"),
        (5, 2, 5_000_000 + H + 1, "purchase"),  # 1h + 1µs -> NULL
        (6, 3, 9_000_000, "click"),             # no purchase at all -> NULL
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).select(
        "event_id", "user_id", "us", "event_type",
        F.when(F.col("event_type") == "purchase", F.col("us")).alias("pus"),
    )
    tag = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", tag, "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = ev.withColumn("_np", F.first("pus", ignorenulls=True).over(w))
    out = {
        r["event_id"]: r["next"]
        for r in nxt.where(F.col("event_type") == "click")
        .select(
            "event_id",
            F.when(F.col("_np") - F.col("us") <= F.lit(H), F.col("_np")).alias("next"),
        )
        .collect()
    }
    assert out[1] == 1_000_000 + H   # same-ts purchase skipped, 1h one taken
    assert out[4] is None            # just past tolerance
    assert out[6] is None            # no purchase


def test_range_frame_includes_order_value_ties(spark):
    """w8's RANGE frame rule: peers (equal order values) are included in
    the frame even when they come later in row order — unlike a ROWS
    frame."""
    from pyspark.sql import Window, functions as F

    df = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 2.0), (3, 100, 4.0)], "id long, d long, v double"
    )
    wr = Window.orderBy("d").rangeBetween(-90, 0)
    out = {r["id"]: r["s"] for r in df.select("id", F.sum("v").over(wr).alias("s")).collect()}
    # both d=10 rows see BOTH peers (3.0); d=100's 90-back lower bound
    # lands exactly on d=10 and RANGE bounds are INCLUSIVE, so it sums
    # everything (7.0)
    assert out[1] == 3.0 and out[2] == 3.0
    assert out[3] == 7.0
