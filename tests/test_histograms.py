"""Histogram sample model + histogram_quantile vs a reference Python
implementation of PromQL's interpolation rules."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parquet_common_spark import Matcher, ParquetQueryable
from parquet_common_spark.functions.histograms import (
    histogram_quantile,
    quantile_over_select,
    to_hist_shard,
)

INF = float("inf")


def py_histogram_quantile(q, bounds, counts):
    total = counts[-1]
    if total <= 0:
        return None
    target = q * total
    idx = sum(1 for c in counts if c < target)  # 0-based bucket index
    if idx >= len(bounds) - 1 and bounds[-1] == INF and idx == len(bounds) - 1:
        return bounds[-2]
    lo = 0.0 if idx == 0 else bounds[idx - 1]
    hi = bounds[idx]
    lo_cum = 0.0 if idx == 0 else counts[idx - 1]
    hi_cum = counts[idx]
    if hi_cum == lo_cum:
        return hi
    return lo + (hi - lo) * (target - lo_cum) / (hi_cum - lo_cum)


CASES = [
    # bounds, cumulative counts, q
    ([0.1, 0.5, 1.0, INF], [10, 30, 60, 100], 0.5),
    ([0.1, 0.5, 1.0, INF], [10, 30, 60, 100], 0.9),
    ([0.1, 0.5, 1.0, INF], [10, 30, 60, 100], 0.99),  # lands in +Inf bucket
    ([0.1, 0.5, 1.0, INF], [10, 30, 60, 100], 0.05),  # first bucket, interp from 0
    ([1.0, 2.0, INF], [0, 0, 5], 0.5),                 # all mass in +Inf
    ([1.0, 2.0, INF], [5, 5, 5], 0.5),                 # all mass in first bucket
]


@pytest.mark.parametrize("bounds,counts,q", CASES)
def test_quantile_matches_reference_impl(spark, bounds, counts, q):
    df = spark.createDataFrame(
        [(bounds, counts)], "h_bounds array<double>, h_counts array<long>"
    )
    got = df.select(
        histogram_quantile(q, F.col("h_bounds"), F.col("h_counts")).alias("phi")
    ).collect()[0]["phi"]
    want = py_histogram_quantile(q, bounds, counts)
    assert got == pytest.approx(want, rel=1e-12)


def test_empty_histogram_is_null(spark):
    df = spark.createDataFrame(
        [([1.0, INF], [0, 0])], "h_bounds array<double>, h_counts array<long>"
    )
    got = df.select(
        histogram_quantile(0.5, F.col("h_bounds"), F.col("h_counts")).alias("phi")
    ).collect()[0]["phi"]
    assert got is None


def test_hist_shard_select_roundtrip(spark):
    rows = []
    for i, svc in enumerate(["api", "web"]):
        for s in range(4):
            cum = [10 * (s + 1), 25 * (s + 1), 40 * (s + 1)]
            rows.append(
                (
                    {"__name__": "request_duration", "svc": svc},
                    s * 1000,
                    cum[-1],
                    float(cum[-1]) * 0.3,
                    [0.25, 1.0, INF],
                    cum,
                )
            )
    df = spark.createDataFrame(
        rows,
        "labels map<string,string>, ts long, h_count long, h_sum double,"
        " h_bounds array<double>, h_counts array<long>",
    )
    shard = to_hist_shard(df)
    q = ParquetQueryable([shard])
    sel = q.select(0, 10**9, [Matcher("svc", "=", "api")])
    assert sel.count() == 4
    assert "h_counts" in sel.columns
    out = quantile_over_select(sel, 0.5).collect()
    for r in out:
        want = py_histogram_quantile(0.5, [0.25, 1.0, INF], list(r["h_counts"]))
        assert r["phi_0_5"] == pytest.approx(want, rel=1e-12)
