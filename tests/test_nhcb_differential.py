"""Randomized differential for custom-bucket (NHCB) histograms: the
Column-expression quantile/fraction/stdvar walks against an independent
pure-Python model of the classic-equivalent linear-interpolation rules
(upstream promql/quantile.go custom-bucket branches).  All generated
cases ride in ONE DataFrame per surface, so the test costs three Spark
jobs, not 3×N."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _model_quantile(q, cv, idx, counts):
    total = float(sum(counts))
    if total <= 0:
        return None
    rank = q * total
    cum = 0.0
    pos = len(idx) - 1
    for i, c in enumerate(counts):
        cum += c
        if cum >= rank:
            pos = i
            break
    k = idx[pos]
    lower = cv[k - 1] if k > 0 else float("-inf")
    upper = cv[k] if k < len(cv) else float("inf")
    if math.isinf(upper):
        return lower
    if math.isinf(lower):
        lower = 0.0 if upper > 0 else upper
    cum_prev = cum - counts[pos]
    frac = (rank - cum_prev) / counts[pos]
    return lower + (upper - lower) * frac


def _model_rank_below(x, cv, idx, counts):
    out = 0.0
    for k, c in zip(idx, counts):
        lower = cv[k - 1] if k > 0 else float("-inf")
        upper = cv[k] if k < len(cv) else float("inf")
        if math.isinf(lower):
            lower = 0.0 if upper > 0 else x  # full once past upper
        width = upper - lower
        if x >= upper:
            out += c
        elif x <= lower or width <= 0 or math.isinf(width):
            pass
        else:
            out += c * (x - lower) / width
    return out


def _model_fraction(lo, hi, cv, idx, counts):
    total = float(sum(counts))
    if total <= 0:
        return None
    f = (
        _model_rank_below(hi, cv, idx, counts)
        - _model_rank_below(lo, cv, idx, counts)
    ) / total
    return min(max(f, 0.0), 1.0)


def _gen_cases(n, seed):
    r = random.Random(seed)
    cases = []
    for i in range(n):
        m = r.randint(1, 6)
        cv = sorted(
            round(r.uniform(-50, 200), 2) for _ in range(m)
        )
        while len(set(cv)) != len(cv):
            cv = sorted(round(r.uniform(-50, 200), 2) for _ in range(m))
        occupied = sorted(r.sample(range(m + 1), r.randint(1, m + 1)))
        counts = [r.randint(1, 40) for _ in occupied]
        q = r.choice([0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])
        lo = round(r.uniform(-60, 100), 2)
        hi = lo + round(r.uniform(0, 150), 2)
        cases.append((i, cv, occupied, counts, q, lo, hi))
    return cases


@pytest.fixture(scope="module")
def frame(spark):
    cases = _gen_cases(60, seed=20260815)
    df = spark.createDataFrame(
        [
            (i, cv, idx, counts, q, lo, hi)
            for i, cv, idx, counts, q, lo, hi in cases
        ],
        "id int, cv array<double>, idx array<int>, counts array<long>,"
        " q double, lo double, hi double",
    )
    return cases, df


def test_nhcb_quantile_differential(frame):
    from parquet_common_spark.functions.native_histograms import (
        custom_histogram_quantile,
    )

    cases, df = frame
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id",
            custom_histogram_quantile(
                F.col("q"), F.col("cv"), F.col("idx"), F.col("counts")
            ).alias("v"),
        ).collect()
    }
    for i, cv, idx, counts, q, lo, hi in cases:
        want = _model_quantile(q, cv, idx, counts)
        have = got[i]
        assert have == pytest.approx(want, rel=1e-12, abs=1e-12), (
            f"case {i}: quantile({q}) over cv={cv} idx={idx} "
            f"counts={counts}: {have} != {want}"
        )


def test_nhcb_fraction_differential(frame):
    from parquet_common_spark.functions.native_histograms import (
        custom_histogram_fraction,
    )

    cases, df = frame
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id",
            custom_histogram_fraction(
                F.col("lo"),
                F.col("hi"),
                F.col("cv"),
                F.aggregate(
                    F.col("counts"), F.lit(0).cast("long"), lambda a, x: a + x
                ),
                F.col("idx"),
                F.col("counts"),
            ).alias("v"),
        ).collect()
    }
    for i, cv, idx, counts, q, lo, hi in cases:
        want = _model_fraction(lo, hi, cv, idx, counts)
        have = got[i]
        assert have == pytest.approx(want, rel=1e-12, abs=1e-12), (
            f"case {i}: fraction({lo},{hi}) over cv={cv} idx={idx} "
            f"counts={counts}: {have} != {want}"
        )


def test_nhcb_quantile_matches_classic(spark):
    """NHCB histogram_quantile must agree with the CLASSIC le-bucket
    quantile on equivalent data — the upstream invariant the
    custom-bucket design is built around (promql/quantile.go shares the
    bucket walk).  Random cases, both engines as Column expressions."""
    from parquet_common_spark.functions.histograms import histogram_quantile
    from parquet_common_spark.functions.native_histograms import (
        custom_histogram_quantile,
    )

    r = random.Random(7)
    rows = []
    for i in range(40):
        m = r.randint(1, 5)
        cv = sorted(round(r.uniform(0.5, 100), 2) for _ in range(m))
        while len(set(cv)) != len(cv):
            cv = sorted(round(r.uniform(0.5, 100), 2) for _ in range(m))
        # classic layout needs every bucket incl. +Inf, cumulative
        counts = [r.randint(0, 30) for _ in range(m + 1)]
        if sum(counts) == 0:
            counts[0] = 1
        q = r.choice([0.1, 0.5, 0.9])
        rows.append((i, cv, counts, q))
    df = spark.createDataFrame(
        rows, "id int, cv array<double>, counts array<long>, q double"
    )
    # classic: bounds cv + [+Inf], CUMULATIVE counts
    bounds = F.concat(F.col("cv"), F.array(F.lit(float("inf"))))
    cum = F.aggregate(
        F.col("counts"),
        F.array().cast("array<double>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0))
                + x.cast("double")
            ),
        ),
    )
    # NHCB: sparse (idx, count) pairs for the non-empty buckets
    pairs = F.filter(
        F.transform(
            F.col("counts"),
            lambda c, j: F.struct(j.alias("k"), c.alias("c")),
        ),
        lambda s: s["c"] > 0,
    )
    out = df.select(
        "id",
        histogram_quantile(F.col("q"), bounds, cum).alias("classic"),
        custom_histogram_quantile(
            F.col("q"),
            F.col("cv"),
            F.transform(pairs, lambda s: s["k"]),
            F.transform(pairs, lambda s: s["c"]),
        ).alias("nhcb"),
    ).collect()
    for row in out:
        assert row["nhcb"] == pytest.approx(row["classic"], rel=1e-12), (
            f"id {row['id']}: nhcb {row['nhcb']} != classic {row['classic']}"
        )
