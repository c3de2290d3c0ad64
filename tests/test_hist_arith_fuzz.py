"""Extended randomized differential for native-histogram ARITHMETIC and
NHCB boundary semantics (VERDICT r7 ask #7): the r6 additions with the
least fuzz coverage, now at the r7 probe volume (250 examples per
property) and through BOTH storage paths (in-memory load blocks AND the
convert()-backed parquet shard the acceptance harness uses).

Reuses the pure-Python upstream models from
``test_hist_mixed_schema_differential`` (ReduceResolution merge /
bucket-wise subtract) and ``test_nhcb_differential`` (custom-bucket
linear-interpolation quantile/fraction, upstream promql/quantile.go).
Volume discipline: all 250 cases of a property ride in ONE load and are
evaluated with one Spark job per expression, so the test costs
O(#expressions), not O(#cases).
"""

from __future__ import annotations

import math
import random

import pytest

import test_hist_mixed_schema_differential as H
import test_nhcb_differential as N

N_CASES = 250


@pytest.fixture(scope="module", params=[False, True], ids=["memory", "parquet"])
def engine(spark, request):
    from parquet_common_spark.promqltest import PromQLEngine

    return PromQLEngine(spark, parquet_backed=request.param)


def _fresh(engine):
    # each test loads its own series universe; engine.load replaces state
    return engine


# ------------------------------------------------ h±h, h×÷scalar fuzz


def test_hist_arithmetic_fuzz(engine):
    """250 random mixed-schema pairs per storage path: full merged
    histogram (schema, count, sum, zero, every sparse bucket) of
    h+h / h-h / h*3 / h/2 / h*fv / h/fv matches the model."""
    rnd = random.Random(0xA8F2)
    cases = {}
    lines = []
    for g in range(N_CASES):
        h1 = H._rand_hist(rnd, rnd.choice((-1, 0, 1, 2, 3)), with_neg=True)
        h2 = H._rand_hist(rnd, rnd.choice((-1, 0, 1, 2, 3)), with_neg=True)
        v = float(rnd.randint(1, 7))
        cases[str(g)] = (h1, h2, v)
        lines.append(f'    ha{{g="{g}"}} {H._literal(h1)}')
        lines.append(f'    hb{{g="{g}"}} {H._literal(h2)}')
        lines.append(f'    fv{{g="{g}"}} {v!r}')
    H._load(engine, "load 1m\n" + "\n".join(lines) + "\n")

    def by_g(expr):
        return {ls["g"]: vals[0] for ls, vals in engine.eval_hist(expr, [0])}

    def scaled(h, f):
        return {
            "schema": h["schema"],
            "count": h["count"] * f,
            "sum": h["sum"] * f,
            "zero": h["zero"] * f,
            "pos": {k: c * f for k, c in h["pos"].items()},
            "neg": {k: c * f for k, c in h["neg"].items()},
        }

    add = by_g("ha + hb")
    sub = by_g("ha - hb")
    mul3 = by_g("ha * 3")
    div2 = by_g("ha / 2")
    mulv = by_g("ha * fv")
    divv = by_g("ha / fv")
    for g, (h1, h2, v) in cases.items():
        H._assert_hist_close(H._hist_of_row(add[g]), H._merge([h1, h2]), (g, "+"))
        H._assert_hist_close(H._hist_of_row(sub[g]), H._sub(h1, h2), (g, "-"))
        H._assert_hist_close(H._hist_of_row(mul3[g]), scaled(h1, 3.0), (g, "*3"))
        H._assert_hist_close(H._hist_of_row(div2[g]), scaled(h1, 0.5), (g, "/2"))
        H._assert_hist_close(H._hist_of_row(mulv[g]), scaled(h1, v), (g, "*v"))
        H._assert_hist_close(
            H._hist_of_row(divv[g]), scaled(h1, 1.0 / v), (g, "/v")
        )


# ---------------------------------------------- NHCB boundary probes


def _nhcb_literal(cv, counts, sum_):
    cvs = " ".join(repr(v) for v in cv)
    bks = " ".join(repr(float(c)) for c in counts)
    count = float(sum(counts))
    return (
        "{{" + f"schema:-53 custom_values:[{cvs}] buckets:[{bks}] "
        f"offset:0 count:{count!r} sum:{sum_!r}" + "}}"
    )


def _gen_nhcb(n, seed):
    """n fillings over 5 SHARED custom-value sets; totals chosen from
    {4, 8, 10, 20} so the fixed q probe grid lands EXACTLY on cumulative
    rank boundaries for many cases (the interpolation-degenerate edge)."""
    r = random.Random(seed)
    cvsets = []
    for _ in range(5):
        m = r.randint(2, 5)
        cv = sorted(round(r.uniform(-20.0, 100.0), 2) for _ in range(m))
        while len(set(cv)) != len(cv):
            cv = sorted(round(r.uniform(-20.0, 100.0), 2) for _ in range(m))
        cvsets.append(cv)
    cases = []
    for i in range(n):
        cv = cvsets[i % 5]
        nb = len(cv) + 1
        total = r.choice((4, 8, 10, 20))
        # random composition of `total` over nb buckets (zeros allowed)
        cuts = sorted(r.randint(0, total) for _ in range(nb - 1))
        counts = [b - a for a, b in zip([0] + cuts, cuts + [total])]
        cases.append((i, cv, counts, round(r.uniform(-50, 500), 3)))
    return cvsets, cases


def test_nhcb_boundary_probes(engine):
    """250 NHCB histograms per storage path, probed where the linear
    interpolation degenerates: histogram_quantile at q values that land
    exactly on cumulative-rank boundaries, histogram_fraction with
    bounds exactly AT the custom values (and ±Inf).  Model: upstream
    custom-bucket branches (test_nhcb_differential)."""
    cvsets, cases = _gen_nhcb(N_CASES, seed=0x9C31)
    lines = [
        f'    nh{{g="{i}"}} {_nhcb_literal(cv, counts, s)}'
        for i, cv, counts, s in cases
    ]
    H._load(engine, "load 1m\n" + "\n".join(lines) + "\n")

    def by_g(expr):
        return H._collect_map(engine, expr, 0)

    def close(a, b):
        if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
            return (a is None or math.isnan(a)) and (
                b is None or (isinstance(b, float) and math.isnan(b))
            )
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))

    # quantiles: fixed grid hitting exact ranks for totals 4/8/10/20
    for q in (0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0):
        got = by_g(f"histogram_quantile({q}, nh)")
        for i, cv, counts, _ in cases:
            idx = list(range(len(counts)))
            want = N._model_quantile(q, cv, idx, counts)
            assert close(got[str(i)], want), ("q", q, i, cv, counts, got[str(i)], want)

    # fractions with bounds exactly at custom values: every cv of every
    # shared set is probed against EVERY series (exact-boundary for the
    # sharing fifth, plain differential for the rest)
    bounds = sorted({v for cv in cvsets for v in cv})
    probe_pairs = [("-Inf", b) for b in bounds[:10]] + [
        (bounds[j], bounds[j + 2]) for j in range(0, min(len(bounds) - 2, 8), 2)
    ] + [("-Inf", "+Inf")]
    for lo, hi in probe_pairs:
        got = by_g(f"histogram_fraction({lo}, {hi}, nh)")
        flo = float(lo.replace("Inf", "inf")) if isinstance(lo, str) else float(lo)
        fhi = float(hi.replace("Inf", "inf")) if isinstance(hi, str) else float(hi)
        for i, cv, counts, _ in cases:
            idx = list(range(len(counts)))
            want = N._model_fraction(flo, fhi, cv, idx, counts)
            assert close(got[str(i)], want), (
                "frac", lo, hi, i, cv, counts, got[str(i)], want,
            )
