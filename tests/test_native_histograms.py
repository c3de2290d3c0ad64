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


def py_quantile(q, schema, zero, idxs, counts, nidxs=(), ncounts=()):
    gamma = 2.0 ** (2.0 ** -schema)
    neg_total = sum(ncounts)
    total = neg_total + zero + sum(counts)
    if total <= 0:
        return None
    target = q * total
    if target <= neg_total:
        cum = 0.0
        for k, c in sorted(zip(nidxs, ncounts), reverse=True):
            if cum + c >= target:
                lo, hi = -(gamma**k), -(gamma ** (k - 1))
                return lo + (hi - lo) * (target - cum) / c
            cum += c
    if target <= neg_total + zero:
        return 0.0
    rank = target - neg_total - zero
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


@pytest.mark.parametrize("q", [0.05, 0.25, 0.5, 0.75, 0.95])
def test_negative_range_quantiles(spark, q):
    # mixed-sign observations: negative buckets mirror positive ones and
    # the quantile walk runs most-negative → zero → positive
    import random

    rnd = random.Random(11)
    vals = (
        [-rnd.lognormvariate(0.5, 1) for _ in range(300)]
        + [0.0] * 40
        + [rnd.lognormvariate(0, 1) for _ in range(260)]
    )
    df = spark.createDataFrame([("m", v) for v in vals], "k string, v double")
    h = build_histograms(df, ["k"], "v", schema=2)
    r = h.collect()[0]
    assert r["nh_count"] == 600 and r["nh_zero_count"] == 40
    assert sum(r["nh_neg_counts"]) == 300 and sum(r["nh_pos_counts"]) == 260
    assert list(r["nh_neg_idx"]) == sorted(r["nh_neg_idx"])
    got = h.select(
        native_histogram_quantile(
            q,
            F.col("nh_schema"),
            F.col("nh_zero_count"),
            F.col("nh_pos_idx"),
            F.col("nh_pos_counts"),
            F.col("nh_neg_idx"),
            F.col("nh_neg_counts"),
        ).alias("phi")
    ).collect()[0]["phi"]
    want = py_quantile(
        q,
        2,
        r["nh_zero_count"],
        list(r["nh_pos_idx"]),
        list(r["nh_pos_counts"]),
        list(r["nh_neg_idx"]),
        list(r["nh_neg_counts"]),
    )
    assert got == pytest.approx(want, rel=1e-12)
    # bucketed quantile brackets the empirical one within bucket resolution
    gamma = 2.0 ** (2.0 ** -2)
    emp = sorted(vals)[max(0, int(q * 600) - 1)]
    if emp < 0:
        assert emp * gamma * gamma <= got <= emp / gamma
    elif emp == 0.0:
        assert got == 0.0


@pytest.mark.parametrize("q", [0.1, 0.5, 0.9])
def test_exponential_interpolation(hists, q):
    # upstream >=2.50 semantics: fraction applied on the log axis —
    # value = lower * gamma^f; brackets the same bucket as linear
    rows, h = hists
    r = {x["svc"]: x for x in h.collect()}["api"]
    got = h.where(F.col("svc") == "api").select(
        native_histogram_quantile(
            q,
            F.col("nh_schema"),
            F.col("nh_zero_count"),
            F.col("nh_pos_idx"),
            F.col("nh_pos_counts"),
            interpolation="exponential",
        ).alias("phi")
    ).collect()[0]["phi"]
    gamma = 2.0 ** (2.0 ** -2)
    zero, idxs, counts = r["nh_zero_count"], list(r["nh_pos_idx"]), list(r["nh_pos_counts"])
    total = zero + sum(counts)
    target = q * total
    if target <= zero:
        assert got == 0.0
        return
    rank, cum = target - zero, 0.0
    for k, c in zip(idxs, counts):
        if cum + c >= rank:
            lo = gamma ** (k - 1)
            want = lo * gamma ** ((rank - cum) / c)
            assert got == pytest.approx(want, rel=1e-12)
            # exponential interp stays within the bucket bounds
            assert lo <= got <= gamma ** k * (1 + 1e-12)
            return
        cum += c


def test_build_engines_agree(spark):
    import random

    rnd = random.Random(11)
    rows = [("g%d" % (i % 3), rnd.uniform(-100, 100)) for i in range(600)]
    rows += [("g0", 0.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    cols = [
        "nh_schema", "nh_zero_count", "nh_count",
        "nh_pos_idx", "nh_pos_counts", "nh_neg_idx", "nh_neg_counts",
    ]
    a = {r["g"]: r for r in build_histograms(df, ["g"], "v", schema=2, engine="native").collect()}
    b = {r["g"]: r for r in build_histograms(df, ["g"], "v", schema=2, engine="pandas").collect()}
    assert a.keys() == b.keys()
    for g in a:
        for c in cols:
            assert a[g][c] == b[g][c], (g, c)
        assert a[g]["nh_sum"] == pytest.approx(b[g]["nh_sum"], rel=1e-9)


def test_histogram_fraction_edges(spark):
    from pyspark.sql import functions as F

    from parquet_common_spark.functions import native_histograms as NH

    # one histogram: neg bucket k=1 (span [-γ, -1]) c=2, zero c=3,
    # pos bucket k=2 (span (γ, γ²]) c=5  -> count 10, schema 0 (γ=2)
    df = spark.createDataFrame(
        [(0, 3, 10, [2], [5], [1], [2])],
        "nh_schema int, nh_zero_count long, nh_count long,"
        " nh_pos_idx array<int>, nh_pos_counts array<long>,"
        " nh_neg_idx array<int>, nh_neg_counts array<long>",
    )

    def frac(lo, up):
        return NH.histogram_fraction(
            lo, up, F.col("nh_schema"), F.col("nh_zero_count"), F.col("nh_count"),
            F.col("nh_pos_idx"), F.col("nh_pos_counts"),
            F.col("nh_neg_idx"), F.col("nh_neg_counts"),
        )

    r = df.select(
        frac(-1e9, 1e9).alias("all"),
        frac(0.0, 1e9).alias("nonneg"),
        frac(-1e9, -1.0).alias("neg_all"),
        frac(2.0, 4.0).alias("pos_bucket"),  # γ=2: pos bucket spans (2, 4]
        frac(2.0, 3.0).alias("pos_half"),    # linear: half the bucket
        frac(1e9, 1e9).alias("empty_range"),
    ).collect()[0]
    assert r["all"] == 1.0
    assert r["nonneg"] == pytest.approx(0.8)      # (3 + 5) / 10
    assert r["neg_all"] == pytest.approx(0.2)     # the 2 negative obs
    assert r["pos_bucket"] == pytest.approx(0.5)  # whole pos bucket
    assert r["pos_half"] == pytest.approx(0.25)   # half of 5 / 10
    assert r["empty_range"] == 0.0
    # empty histogram -> NULL
    empty = spark.createDataFrame(
        [(0, 0, 0, [], [], [], [])],
        "nh_schema int, nh_zero_count long, nh_count long,"
        " nh_pos_idx array<int>, nh_pos_counts array<long>,"
        " nh_neg_idx array<int>, nh_neg_counts array<long>",
    )
    assert empty.select(frac(-1e9, 1e9).alias("f")).collect()[0]["f"] is None
