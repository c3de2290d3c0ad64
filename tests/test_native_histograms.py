"""Native exponential histograms: bucket mapping, build round-trip,
quantile vs a pure-Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parquet_common_spark.functions.native_histograms import (
    bucket_index,
    build_histograms,
    native_histogram_quantile,
)


def test_bucket_index_bounds():
    for schema in (-1, 0, 3):
        gamma = 2.0 ** (2.0 ** -schema)
        for v in (0.01, 0.5, 1.0, 1.5, 7.3, 1000.0):
            k = bucket_index(v, schema)
            assert gamma ** (k - 1) < v * (1 + 1e-9) and v <= gamma**k * (1 + 1e-9)


def py_quantile(q, schema, zero, idxs, counts):
    gamma = 2.0 ** (2.0 ** -schema)
    total = zero + sum(counts)
    if total <= 0:
        return None
    target = q * total
    if target <= zero:
        return 0.0
    rank = target - zero
    cum = 0.0
    for k, c in zip(idxs, counts):
        if cum + c >= rank:
            lo, hi = gamma ** (k - 1), gamma**k
            return lo + (hi - lo) * (rank - cum) / c
        cum += c
    return gamma ** idxs[-1]


@pytest.fixture(scope="module")
def hists(spark):
    import random

    rnd = random.Random(7)
    rows = []
    for svc in ("api", "web"):
        for _ in range(500):
            v = rnd.lognormvariate(0 if svc == "api" else 1, 1)
            rows.append((svc, v))
    rows += [("api", 0.0)] * 25  # zero-bucket mass
    df = spark.createDataFrame(rows, "svc string, latency double")
    return rows, build_histograms(df, ["svc"], "latency", schema=2)


def test_build_counts(hists):
    rows, h = hists
    got = {r["svc"]: r for r in h.collect()}
    assert got["api"]["nh_count"] == 525 and got["api"]["nh_zero_count"] == 25
    assert got["web"]["nh_count"] == 500 and got["web"]["nh_zero_count"] == 0
    for r in got.values():
        assert sum(r["nh_pos_counts"]) + r["nh_zero_count"] == r["nh_count"]
        assert list(r["nh_pos_idx"]) == sorted(r["nh_pos_idx"])
        # every observation lands inside its bucket bounds
        assert r["nh_sum"] == pytest.approx(
            sum(v for s, v in rows if s == r["svc"]), rel=1e-12
        )


@pytest.mark.parametrize("q", [0.01, 0.25, 0.5, 0.9, 0.99])
def test_quantile_matches_python(hists, q):
    rows, h = hists
    out = h.select(
        "svc",
        native_histogram_quantile(
            q, F.col("nh_schema"), F.col("nh_zero_count"), F.col("nh_pos_idx"), F.col("nh_pos_counts")
        ).alias("phi"),
    ).collect()
    for r in out:
        want = py_quantile(
            q,
            2,
            next(x["nh_zero_count"] for x in h.collect() if x["svc"] == r["svc"]),
            *[
                (list(x["nh_pos_idx"]), list(x["nh_pos_counts"]))
                for x in h.collect()
                if x["svc"] == r["svc"]
            ][0],
        )
        assert r["phi"] == pytest.approx(want, rel=1e-12)


def test_quantile_brackets_true_quantile(hists):
    # the bucketed quantile must land within one bucket width of the
    # empirical quantile (resolution guarantee of exponential buckets)
    rows, h = hists
    gamma = 2.0 ** (2.0 ** -2)
    api = sorted(v for s, v in rows if s == "api" and v > 0)
    emp = api[int(0.9 * 525) - 25]  # rough empirical p90 over positive values
    got = h.where(F.col("svc") == "api").select(
        native_histogram_quantile(
            0.9, F.col("nh_schema"), F.col("nh_zero_count"), F.col("nh_pos_idx"), F.col("nh_pos_counts")
        ).alias("phi")
    ).collect()[0]["phi"]
    assert emp / gamma <= got <= emp * gamma * gamma


def test_negative_values_rejected(spark):
    df = spark.createDataFrame([("a", -1.0)], "k string, v double")
    with pytest.raises(Exception):
        build_histograms(df, ["k"], "v").collect()
