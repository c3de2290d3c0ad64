"""Randomized differential for native-histogram sum()/increase() with
MIXED bucketing schemas, against a pure-Python model of the upstream
semantics (model/histogram ReduceResolution + functions.go
histogramRate: downscale to the coarsest involved schema, counter-reset
compensation, boundary extrapolation without the zero clamp).

Merged bucket contents are observed through the public surface only:
``histogram_fraction`` probed at exact bucket boundaries of the target
schema reads each bucket's mass exactly (no interpolation), so the
engine's sparse merge is compared bucket-by-bucket without touching
internals.  All generated cases share one load and are evaluated with
ONE collect per probe via ``sum by (g)``.
"""

from __future__ import annotations

import math
import random

import pytest


# ------------------------------------------------------------- model


def _downscale(pairs: dict[int, float], dschema: int) -> dict[int, float]:
    """ReduceResolution index map: idx k at schema s lands at
    ceil(k / 2^(s-t)) at coarser schema t (dschema = s - t >= 0)."""
    out: dict[int, float] = {}
    for k, c in pairs.items():
        kk = math.ceil(k / (2**dschema))
        out[kk] = out.get(kk, 0.0) + c
    return {k: c for k, c in out.items() if c != 0}


def _merge(members: list[dict]) -> dict:
    smin = min(m["schema"] for m in members)
    pos: dict[int, float] = {}
    neg: dict[int, float] = {}
    for m in members:
        for tgt, src in ((pos, "pos"), (neg, "neg")):
            for k, c in _downscale(m[src], m["schema"] - smin).items():
                tgt[k] = tgt.get(k, 0.0) + c
    return {
        "schema": smin,
        "count": sum(m["count"] for m in members),
        "sum": sum(m["sum"] for m in members),
        "zero": sum(m["zero"] for m in members),
        "pos": {k: c for k, c in pos.items() if c != 0},
        "neg": {k: c for k, c in neg.items() if c != 0},
    }


def _sub(a: dict, b: dict) -> dict:
    """a - b (bucket-wise), downscaled to the pair's coarser schema."""
    nb = dict(b)
    nb = {
        **nb,
        "count": -b["count"],
        "sum": -b["sum"],
        "zero": -b["zero"],
        "pos": {k: -c for k, c in b["pos"].items()},
        "neg": {k: -c for k, c in b["neg"].items()},
    }
    return _merge([a, nb])


def _rand_hist(rnd: random.Random, schema: int, with_neg: bool) -> dict:
    pos = {
        k: float(rnd.randint(1, 9))
        for k in rnd.sample(range(0, 7), rnd.randint(1, 3))
    }
    neg = (
        {k: float(rnd.randint(1, 9)) for k in rnd.sample(range(0, 5), 1)}
        if with_neg and rnd.random() < 0.5
        else {}
    )
    zero = float(rnd.randint(0, 4))
    return {
        "schema": schema,
        "count": sum(pos.values()) + sum(neg.values()) + zero,
        "sum": round(rnd.uniform(-50, 50), 6),
        "zero": zero,
        "pos": pos,
        "neg": neg,
    }


def _literal(h: dict) -> str:
    def span(d: dict[int, float]) -> tuple[str, int]:
        if not d:
            return "[]", 0
        lo, hi = min(d), max(d)
        return (
            "[" + " ".join(repr(d.get(k, 0.0)) for k in range(lo, hi + 1)) + "]",
            lo,
        )

    pb, po = span(h["pos"])
    nb, no = span(h["neg"])
    parts = [
        f"schema:{h['schema']}",
        f"sum:{h['sum']!r}",
        f"count:{h['count']!r}",
        f"z_bucket:{h['zero']!r}",
        "z_bucket_w:0.001",
        f"buckets:{pb}",
        f"offset:{po}",
        f"n_buckets:{nb}",
        f"n_offset:{no}",
    ]
    return "{{" + " ".join(parts) + "}}"


def _collect_map(eng, expr: str, t_ms: int) -> dict[str, float]:
    return {
        r["l_g"]: r["value"]
        for r in eng.eval_instant_df(expr, t_ms).collect()
    }


def _close(a: float, b: float) -> bool:
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))


PROBES = list(range(-1, 8))  # schema-0 buckets (2^(k-1), 2^k]


@pytest.fixture(scope="module")
def engine(spark):
    from parquet_common_spark.promqltest import PromQLEngine

    return PromQLEngine(spark)


def _load(eng, text: str):
    from parquet_common_spark.promqltest import parse_script
    from parquet_common_spark.promqltest.scriptparse import LoadCmd

    for cmd in parse_script(text).commands:
        if isinstance(cmd, LoadCmd):
            eng.load(cmd)


def test_mixed_schema_sum_differential(engine):
    """sum by (g) over groups of random mixed-schema histograms: count,
    sum, zero mass, and EVERY schema-0 bucket's mass match the model."""
    rnd = random.Random(20260814)
    cases: dict[str, list[dict]] = {}
    lines = []
    for g in range(12):
        # at least one schema-0 member pins the group's smin at 0, so
        # the power-of-2 probe grid is exact for the merged result
        schemas = [0] + [rnd.choice((0, 1, 2)) for _ in range(rnd.randint(1, 3))]
        members = [_rand_hist(rnd, s, with_neg=True) for s in schemas]
        cases[str(g)] = members
        for i, h in enumerate(members):
            lines.append(f'    ms{{g="{g}", i="{i}"}} {_literal(h)}')
    _load(engine, "load 1m\n" + "\n".join(lines) + "\n")

    want = {g: _merge(ms) for g, ms in cases.items()}
    got_count = _collect_map(engine, "histogram_count(sum by (g) (ms))", 0)
    got_sum = _collect_map(engine, "histogram_sum(sum by (g) (ms))", 0)
    for g, w in want.items():
        assert _close(got_count[g], w["count"]), (g, got_count[g], w["count"])
        assert _close(got_sum[g], w["sum"]), (g, got_sum[g], w["sum"])

    for k in PROBES:
        lo, hi = 2.0 ** (k - 1), 2.0**k
        for sign in (1, -1):
            a, b = (lo, hi) if sign > 0 else (-hi, -lo)
            frac = _collect_map(
                engine, f"histogram_fraction({a!r}, {b!r}, sum by (g) (ms))", 0
            )
            for g, w in want.items():
                mass = (w["pos"] if sign > 0 else w["neg"]).get(k, 0.0)
                assert _close(frac[g], mass / w["count"]), (
                    g, k, sign, frac[g], mass, w["count"],
                )
    zf = _collect_map(engine, "histogram_fraction(-0.001, 0.001, sum by (g) (ms))", 0)
    for g, w in want.items():
        assert _close(zf[g], w["zero"] / w["count"]), (g, zf[g], w)


def test_schema_change_rate_differential(engine):
    """increase()/rate() over cumulative histogram series whose schema
    COARSENS mid-window, with occasional counter resets: count, sum,
    and every differenced bucket match the model (reset compensation +
    minSchema downscale + boundary extrapolation, no zero clamp)."""
    rnd = random.Random(40)
    step_ms = 60_000
    t_eval = 6 * step_ms
    range_ms = 6 * step_ms  # window (0, 6m] — the t=0 sample is excluded
    series: dict[str, list[dict]] = {}
    lines = []
    for g in range(12):
        n = rnd.randint(3, 7)
        schema = rnd.choice((1, 2))
        cum = _rand_hist(rnd, schema, with_neg=False)
        cum["sum"] = abs(cum["sum"])
        samples = [dict(cum)]
        for _ in range(n - 1):
            if rnd.random() < 0.2:  # counter reset: fresh small state
                cum = _rand_hist(rnd, schema, with_neg=False)
                cum["sum"] = abs(cum["sum"]) / 100
                cum["count"] = min(cum["count"], samples[-1]["count"] - 1)
                cum["zero"] = 0.0
            else:
                if rnd.random() < 0.4 and schema > 0:
                    schema -= 1  # resolution reduction mid-series
                delta = _rand_hist(rnd, schema, with_neg=False)
                delta["sum"] = abs(delta["sum"])
                cum = _merge([cum, delta])
            samples.append(dict(cum))
        series[str(g)] = samples
        lines.append(
            f'    mr{{g="{g}"}} ' + " ".join(_literal(h) for h in samples)
        )
    _load(engine, "load 1m\n" + "\n".join(lines) + "\n")

    def model_increase(samples: list[dict]) -> dict | None:
        pts = [
            (i * step_ms, h)
            for i, h in enumerate(samples)
            if t_eval - range_ms < i * step_ms <= t_eval
        ]
        if len(pts) < 2:
            return None
        comp: list[dict] = []
        for (_, prev), (_, curr) in zip(pts, pts[1:]):
            if curr["count"] < prev["count"] or curr["zero"] < prev["zero"]:
                comp.append(prev)
        diff = _merge([_sub(pts[-1][1], pts[0][1])] + comp) if comp else _sub(
            pts[-1][1], pts[0][1]
        )
        first_ts, last_ts = pts[0][0], pts[-1][0]
        sampled = (last_ts - first_ts) / 1e3
        to_start = (first_ts - (t_eval - range_ms)) / 1e3
        to_end = (t_eval - last_ts) / 1e3
        avg = sampled / (len(pts) - 1)
        threshold = avg * 1.1
        to_start = avg / 2 if to_start >= threshold else to_start
        to_end = avg / 2 if to_end >= threshold else to_end
        factor = (sampled + to_start + to_end) / sampled
        return {
            "count": diff["count"] * factor,
            "sum": diff["sum"] * factor,
            "pos": diff["pos"],
            "total": diff["count"],  # unscaled, for fraction probes
        }

    want = {g: model_increase(s) for g, s in series.items()}
    assert all(w is not None for w in want.values())
    got_count = _collect_map(
        engine, f"histogram_count(increase(mr[{range_ms // 1000}s]))", t_eval
    )
    got_sum = _collect_map(
        engine, f"histogram_sum(increase(mr[{range_ms // 1000}s]))", t_eval
    )
    for g, w in want.items():
        assert _close(got_count[g], w["count"]), (g, got_count[g], w["count"])
        assert _close(got_sum[g], w["sum"]), (g, got_sum[g], w["sum"])

    # bucket probes on each case's OWN coarsest-schema grid (boundaries
    # are exact there, so fraction reads each differenced bucket's mass
    # with no interpolation); one collect per (schema, bucket) pair
    by_smin: dict[int, list[str]] = {}
    for g, s in series.items():
        smin = min(h["schema"] for h in s[1:])  # t=0 is outside the window
        by_smin.setdefault(smin, []).append(g)
    for smin, gs in by_smin.items():
        gamma = 2.0 ** (2.0**-smin)
        support = {k for g in gs for k in want[g]["pos"]}
        ks = sorted(support)[:9] + [max(support, default=0) + 2]  # + one empty
        for k in ks:
            lo, hi = gamma ** (k - 1), gamma**k
            frac = _collect_map(
                engine,
                f"histogram_fraction({lo!r}, {hi!r}, rate(mr[{range_ms // 1000}s]))",
                t_eval,
            )
            for g in gs:
                w = want[g]
                exp = (
                    w["pos"].get(k, 0.0) / w["total"]
                    if w["total"]
                    else float("nan")
                )
                assert _close(frac[g], exp), (g, smin, k, frac[g], exp)


def _hist_of_row(h: dict) -> dict:
    """engine eval_hist payload -> model shape."""
    return {
        "schema": int(h["schema"]),
        "count": h["count"],
        "sum": h["sum"],
        "zero": h["z_bucket"],
        "pos": dict(h["pos"]),
        "neg": dict(h["neg"]),
    }


def _assert_hist_close(got: dict, want: dict, ctx):
    assert int(got["schema"]) == want["schema"], (ctx, got, want)
    for f in ("count", "sum", "zero"):
        assert _close(got[f], want[f]), (ctx, f, got[f], want[f])
    for side in ("pos", "neg"):
        wp = {k: c for k, c in want[side].items() if c != 0}
        gp = {k: c for k, c in got[side].items() if c != 0}
        assert set(wp) == set(gp), (ctx, side, gp, wp)
        for k in wp:
            assert _close(gp[k], wp[k]), (ctx, side, k, gp[k], wp[k])


def test_hist_arithmetic_differential(engine):
    """h+h / h-h / h*scalar / h/scalar / h*float-vector over random
    mixed-schema pairs: the full merged histogram (eval_hist payload)
    matches the model."""
    rnd = random.Random(777)
    cases = {}
    lines = []
    for g in range(10):
        h1 = _rand_hist(rnd, rnd.choice((0, 1, 2)), with_neg=True)
        h2 = _rand_hist(rnd, rnd.choice((0, 1, 2)), with_neg=True)
        v = float(rnd.randint(1, 5))
        cases[str(g)] = (h1, h2, v)
        lines.append(f'    ha{{g="{g}"}} {_literal(h1)}')
        lines.append(f'    hb{{g="{g}"}} {_literal(h2)}')
        lines.append(f'    fv{{g="{g}"}} {v!r}')
    _load(engine, "load 1m\n" + "\n".join(lines) + "\n")

    def by_g(expr):
        return {
            ls["g"]: vals[0]
            for ls, vals in engine.eval_hist(expr, [0])
        }

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
        _assert_hist_close(_hist_of_row(add[g]), _merge([h1, h2]), (g, "+"))
        _assert_hist_close(_hist_of_row(sub[g]), _sub(h1, h2), (g, "-"))
        _assert_hist_close(_hist_of_row(mul3[g]), scaled(h1, 3.0), (g, "*3"))
        _assert_hist_close(_hist_of_row(div2[g]), scaled(h1, 0.5), (g, "/2"))
        _assert_hist_close(_hist_of_row(mulv[g]), scaled(h1, v), (g, "*v"))
        _assert_hist_close(_hist_of_row(divv[g]), scaled(h1, 1.0 / v), (g, "/v"))


def test_hist_over_time_differential(engine):
    """sum/avg/last_over_time over random mixed-schema series: the full
    merged histogram matches the window-merge model."""
    rnd = random.Random(888)
    step_ms = 60_000
    cases = {}
    lines = []
    for g in range(10):
        samples = [
            _rand_hist(rnd, rnd.choice((0, 1, 2)), with_neg=True)
            for _ in range(rnd.randint(2, 4))
        ]
        cases[str(g)] = samples
        lines.append(
            f'    ho{{g="{g}"}} ' + " ".join(_literal(h) for h in samples)
        )
    _load(engine, "load 1m\n" + "\n".join(lines) + "\n")
    t_eval = 3 * step_ms  # window (-2m, 3m] below covers samples 0..3

    def by_g(expr):
        return {
            ls["g"]: vals[t_eval]
            for ls, vals in engine.eval_hist(expr, [t_eval])
        }

    sot = by_g("sum_over_time(ho[5m])")
    aot = by_g("avg_over_time(ho[5m])")
    lot = by_g("last_over_time(ho[5m])")
    for g, samples in cases.items():
        w = _merge(samples)
        n = len(samples)
        avg = {
            "schema": w["schema"],
            "count": w["count"] / n,
            "sum": w["sum"] / n,
            "zero": w["zero"] / n,
            "pos": {k: c / n for k, c in w["pos"].items()},
            "neg": {k: c / n for k, c in w["neg"].items()},
        }
        last = dict(samples[-1])
        _assert_hist_close(_hist_of_row(sot[g]), w, (g, "sum_ot"))
        _assert_hist_close(_hist_of_row(aot[g]), avg, (g, "avg_ot"))
        _assert_hist_close(_hist_of_row(lot[g]), last, (g, "last_ot"))
