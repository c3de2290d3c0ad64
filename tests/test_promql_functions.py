"""PromQL temporal functions vs an independent pure-Python oracle.

Counter model: a counter accumulates deltas and occasionally RESETS to 0
(process restart), exactly PromQL's model.  With resets-to-zero the
adjusted increase equals the sum of positive deltas — checked both via
that characterization and via a direct Python reimplementation of the
cumulative-compensation rule.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_common_spark.functions.promql import (
    agg_over_time,
    counter_adjusted,
    extrapolated_increase_over_windows,
    extrapolated_rate_over_windows,
    increase_over_windows,
    rate_over_windows,
)


def gen_series():
    rows = []
    for sid in ("a", "b"):
        w = 0.0
        for s in range(60):
            if s > 0 and s % 17 == 0:
                w = 0.0  # counter reset
            else:
                w += (s * 7 + (0 if sid == "a" else 3)) % 10
            rows.append((sid, s * 1_000_000, w))
    return rows


def py_adjusted(values):
    comp = 0.0
    out = []
    prev = None
    for v in values:
        if prev is not None and prev > v:
            comp += prev
        out.append(v + comp)
        prev = v
    return out


@pytest.fixture(scope="module")
def counters(spark):
    return spark.createDataFrame(gen_series(), "series string, ts long, wrapped double")


def test_adjusted_matches_python_oracle(counters):
    got = sorted(
        (r["series"], r["ts"], r["_adj_value"])
        for r in counter_adjusted(counters, ["series"], "ts", "wrapped").collect()
    )
    rows = gen_series()
    for sid in ("a", "b"):
        vals = [v for s, _, v in rows if s == sid]
        want = py_adjusted(vals)
        have = [a for s, _, a in got if s == sid]
        assert have == pytest.approx(want)


def test_increase_equals_positive_delta_sum(counters):
    w_us = 10_000_000  # 10 samples per window
    got = {
        (r["series"], r["_win"]): r["increase"]
        for r in increase_over_windows(counters, ["series"], "ts", "wrapped", w_us).collect()
    }
    rows = gen_series()
    for sid in ("a", "b"):
        vals = [(ts, v) for s, ts, v in rows if s == sid]
        by_win: dict[int, list[float]] = {}
        for ts, v in vals:
            by_win.setdefault(ts // w_us, []).append(v)
        for win, vs in by_win.items():
            want = sum(max(0.0, b - a) for a, b in zip(vs, vs[1:]))
            assert got[(sid, win)] == pytest.approx(want), (sid, win)


def test_rate(counters):
    out = rate_over_windows(counters, ["series"], "ts", "wrapped", 10_000_000).collect()
    for r in out:
        assert r["n_samples"] == 10
        elapsed = (r["last_ts"] - r["first_ts"]) / 1e6
        assert r["rate"] == pytest.approx(r["increase"] / elapsed)


def test_single_sample_window_rate_null(spark):
    df = spark.createDataFrame([("a", 0, 5.0)], "series string, ts long, v double")
    out = rate_over_windows(df, ["series"], "ts", "v", 1_000_000).collect()
    assert out[0]["rate"] is None


def test_agg_over_time(counters):
    out = agg_over_time(counters, ["series"], "ts", "wrapped", 10_000_000).collect()
    assert all(r["count_over_time"] == 10 for r in out)
    for r in out:
        assert r["min_over_time"] <= r["avg_over_time"] <= r["max_over_time"]


# ---------------------------------------------------------------------------
# Extrapolated rate/increase: full upstream PromQL semantics, checked
# against a direct Python port of Prometheus's extrapolatedRate
# (promql/functions.go) over a promqltest-style corpus.  The reference
# runs the whole upstream promqltest suite through its storage
# (/root/reference/queryable/parquet_queryable_test.go:45-66); this is
# our equivalent oracle for the temporal layer.
# ---------------------------------------------------------------------------


def py_extrapolated(samples, range_start_s, range_end_s, is_counter, is_rate):
    """Python port of Prometheus extrapolatedRate.  samples: [(t_s, v)]."""
    if len(samples) < 2:
        return None
    result = samples[-1][1] - samples[0][1]
    if is_counter:
        last = 0.0
        for _, v in samples:
            if v < last:
                result += last
            last = v
    dur_start = samples[0][0] - range_start_s
    dur_end = range_end_s - samples[-1][0]
    sampled = samples[-1][0] - samples[0][0]
    if sampled <= 0:
        return None
    avg_dur = sampled / (len(samples) - 1)
    threshold = avg_dur * 1.1
    if dur_start >= threshold:
        dur_start = avg_dur / 2
    if is_counter and result > 0 and samples[0][1] >= 0:
        dur_zero = sampled * (samples[0][1] / result)
        if dur_zero < dur_start:
            dur_start = dur_zero
    if dur_end >= threshold:
        dur_end = avg_dur / 2
    factor = (sampled + dur_start + dur_end) / sampled
    if is_rate:
        factor /= range_end_s - range_start_s
    return result * factor


# promqltest-style corpus: (name, [(ts_us, value)]) — one window each,
# window = [0s, 60s).  Shapes: dense regular counter, samples far from
# the boundary, counter reset mid-window, near-zero start (zero-point
# clamp), gauge going down, tiny window population.
CORPUS = [
    ("dense_counter", [(i * 5_000_000, 10.0 * i) for i in range(12)]),
    ("offset_start", [((20 + i * 4) * 1_000_000, 3.0 * i) for i in range(9)]),
    ("reset_mid", [(i * 6_000_000, float(v)) for i, v in enumerate([0, 12, 24, 5, 17, 29, 41, 50, 62, 70])]),
    ("zero_clamp", [(i * 10_000_000, 0.5 + 400.0 * i) for i in range(6)]),
    ("sparse_pair", [(14_000_000, 7.0), (51_000_000, 21.0)]),
    ("single", [(30_000_000, 5.0)]),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(name, ts, v) for name, samples in CORPUS for ts, v in samples]
    return spark.createDataFrame(rows, "series string, ts long, v double")


@pytest.mark.parametrize("is_counter", [True, False])
def test_extrapolated_increase_matches_python_port(corpus_df, is_counter):
    got = {
        r["series"]: r["increase"]
        for r in extrapolated_increase_over_windows(
            corpus_df, ["series"], "ts", "v", 60_000_000, is_counter=is_counter
        ).collect()
    }
    for name, samples in CORPUS:
        want = py_extrapolated(
            [(t / 1e6, v) for t, v in samples], 0.0, 60.0, is_counter, False
        )
        if want is None:
            assert got[name] is None, name
        else:
            assert got[name] == pytest.approx(want, rel=1e-12), name


def test_extrapolated_rate_matches_python_port(corpus_df):
    got = {
        r["series"]: r["rate"]
        for r in extrapolated_rate_over_windows(
            corpus_df, ["series"], "ts", "v", 60_000_000
        ).collect()
    }
    for name, samples in CORPUS:
        want = py_extrapolated([(t / 1e6, v) for t, v in samples], 0.0, 60.0, True, True)
        if want is None:
            assert got[name] is None, name
        else:
            assert got[name] == pytest.approx(want, rel=1e-12), name


def test_dense_regular_counter_rate_is_exact_slope(corpus_df):
    """The classic promqltest property: a perfectly regular counter whose
    samples start at the window edge extrapolates to exactly slope *
    window — rate == per-second slope."""
    out = {
        r["series"]: r["rate"]
        for r in extrapolated_rate_over_windows(
            corpus_df, ["series"], "ts", "v", 60_000_000
        ).collect()
    }
    # dense_counter: +10 every 5s from t=0 to t=55; slope 2/s; samples
    # cover [0,55], toStart=0 (<threshold 5.5*1.1... threshold=5.5*... ):
    # avg_dur=5, threshold 5.5, toStart=0 stays, toEnd=5 >= 5.5? no,
    # 5 < 5.5 so extrapolates to the full window: (55+0+5)/55 * 110 / 60 = 2.0
    assert out["dense_counter"] == pytest.approx(2.0, rel=1e-12)


# ------------------------- resets / changes / instant / deriv family


@pytest.fixture(scope="module")
def gauge_df(spark):
    import random

    rnd = random.Random(5)
    rows = []
    for s in ("a", "b"):
        ts, v = 0, 0.0
        for _ in range(200):
            ts += rnd.randint(1, 3) * 1_000_000
            v = round(v + rnd.uniform(-2, 5), 2)
            if rnd.random() < 0.05:
                v = round(rnd.uniform(0, 1), 2)  # reset
            rows.append((s, ts, v))
    return rows, spark.createDataFrame(rows, "s string, ts long, v double")


def _groups(rows, w):
    from collections import defaultdict

    g = defaultdict(list)
    for s, ts, v in rows:
        g[(s, ts // w)].append((ts, v))
    for k in g:
        g[k].sort()
    return g


W_US = 60_000_000


def test_resets_changes(gauge_df):
    from parquet_common_spark.functions.promql import resets_changes_over_windows

    rows, df = gauge_df
    got = {
        (r["s"], r["_win"]): r
        for r in resets_changes_over_windows(df, ["s"], "ts", "v", W_US).collect()
    }
    for k, g in _groups(rows, W_US).items():
        vs = [v for _, v in g]
        assert got[k]["resets"] == sum(1 for a, b in zip(vs, vs[1:]) if b < a)
        assert got[k]["changes"] == sum(1 for a, b in zip(vs, vs[1:]) if b != a)


def test_idelta_irate(gauge_df):
    from parquet_common_spark.functions.promql import instant_over_windows

    rows, df = gauge_df
    got = {
        (r["s"], r["_win"]): r
        for r in instant_over_windows(df, ["s"], "ts", "v", W_US).collect()
    }
    for k, g in _groups(rows, W_US).items():
        if len(g) < 2:
            assert got[k]["idelta"] is None and got[k]["irate"] is None
            continue
        (pt, pv), (lt, lv) = g[-2], g[-1]
        assert got[k]["idelta"] == pytest.approx(lv - pv, abs=1e-12)
        if lt > pt:
            want = (lv if lv < pv else lv - pv) / ((lt - pt) / 1e6)
            assert got[k]["irate"] == pytest.approx(want, rel=1e-12)


def test_deriv_predict_linear(gauge_df):
    from parquet_common_spark.functions.promql import deriv_over_windows

    rows, df = gauge_df
    got = {
        (r["s"], r["_win"]): r
        for r in deriv_over_windows(
            df, ["s"], "ts", "v", W_US, predict_offset_s=300.0, value_scale=2
        ).collect()
    }
    for k, g in _groups(rows, W_US).items():
        n = len(g)
        t0 = k[1] * W_US
        tr = [t - t0 for t, _ in g]
        vs = [v for _, v in g]
        st, sv = sum(tr), sum(vs)
        stv = sum(t * v for t, v in zip(tr, vs))
        st2 = sum(t * t for t in tr)
        den = n * st2 - st * st
        if n < 2 or den == 0:
            assert got[k]["deriv"] is None
            continue
        slope = (n * stv - st * sv) / den
        assert got[k]["deriv"] == pytest.approx(slope * 1e6, rel=1e-9)
        intercept = (sv - slope * st) / n
        want = intercept + slope * (W_US + 300e6)
        assert got[k]["predict_linear"] == pytest.approx(want, rel=1e-9)


def test_extended_agg_over_time(gauge_df):
    import math

    rows, df = gauge_df
    got = {
        (r["s"], r["_win"]): r
        for r in agg_over_time(
            df, ["s"], "ts", "v", W_US, quantiles=(0.9,), value_scale=2
        ).collect()
    }
    for k, g in _groups(rows, W_US).items():
        vs = [v for _, v in g]
        mean = sum(vs) / len(vs)
        var = sum((x - mean) ** 2 for x in vs) / len(vs)
        assert got[k]["stdvar_over_time"] == pytest.approx(var, abs=1e-9)
        assert got[k]["stddev_over_time"] == pytest.approx(math.sqrt(var), abs=1e-9)
        assert got[k]["last_over_time"] == g[-1][1]
        assert got[k]["present_over_time"] == 1.0
        svs = sorted(vs)
        h = 0.9 * (len(svs) - 1)
        lo = svs[math.floor(h)]
        hi = svs[min(math.floor(h) + 1, len(svs) - 1)]
        assert got[k]["quantile_0_9_over_time"] == pytest.approx(
            lo + (h - math.floor(h)) * (hi - lo), abs=1e-9
        )


def test_suite_matches_a_la_carte(gauge_df):
    from parquet_common_spark.functions.promql import (
        agg_over_time,
        deriv_over_windows,
        instant_over_windows,
        promql_suite_over_windows,
        resets_changes_over_windows,
    )

    rows, df = gauge_df
    suite = {
        (r["s"], r["_win"]): r
        for r in promql_suite_over_windows(
            df, ["s"], "ts", "v", W_US, predict_offset_s=300.0,
            quantiles=(0.9,), value_scale=2,
        ).collect()
    }
    rc = {
        (r["s"], r["_win"]): r
        for r in resets_changes_over_windows(df, ["s"], "ts", "v", W_US).collect()
    }
    inst = {
        (r["s"], r["_win"]): r
        for r in instant_over_windows(df, ["s"], "ts", "v", W_US).collect()
    }
    der = {
        (r["s"], r["_win"]): r
        for r in deriv_over_windows(
            df, ["s"], "ts", "v", W_US, predict_offset_s=300.0, value_scale=2
        ).collect()
    }
    ag = {
        (r["s"], r["_win"]): r
        for r in agg_over_time(
            df, ["s"], "ts", "v", W_US, quantiles=(0.9,), value_scale=2
        ).collect()
    }
    for k, r in suite.items():
        assert r["resets"] == rc[k]["resets"] and r["changes"] == rc[k]["changes"]
        assert r["idelta"] == inst[k]["idelta"] and r["irate"] == inst[k]["irate"]
        assert r["deriv"] == der[k]["deriv"]
        assert r["predict_linear"] == der[k]["predict_linear"]
        assert r["stdvar_over_time"] == pytest.approx(ag[k]["stdvar_over_time"], abs=1e-12)
        assert r["last_over_time"] == ag[k]["last_over_time"]
        assert r["quantile_0_9_over_time"] == ag[k]["quantile_0_9_over_time"]


def test_double_exponential_smoothing_vs_model(spark):
    import random

    from parquet_common_spark.functions.promql import (
        double_exponential_smoothing_over_windows,
    )

    rng = random.Random(41)
    rows = [(1, i * 1000, i, rng.uniform(0, 100)) for i in range(50)]
    rows += [(2, i * 1000, i, float(i)) for i in range(2)]       # exactly 2 samples
    rows += [(3, 0, 0, 7.0)]                                     # 1 sample -> NULL
    df = spark.createDataFrame(rows, "series long, tus long, oid long, v double")
    out = double_exponential_smoothing_over_windows(
        df, ["series"], "tus", "v", 10**9, sf=0.3, tf=0.1, order_col="oid"
    )
    got = {r["series"]: r["smoothed"] for r in out.collect()}

    def model(vals, sf, tf):
        if len(vals) < 2:
            return None
        s_prev, s_prev2, trend = vals[0], 0.0, 0.0
        for i, v in enumerate(vals[1:], start=1):
            if i == 1:
                trend = v - s_prev
                s = sf * v + (1 - sf) * (s_prev + trend)
            else:
                trend = tf * (s_prev - s_prev2) + (1 - tf) * trend
                s = sf * v + (1 - sf) * (s_prev + trend)
            s_prev2, s_prev = s_prev, s
        return s_prev

    assert got[1] == pytest.approx(model([r[3] for r in rows if r[0] == 1], 0.3, 0.1), rel=1e-12)
    assert got[2] == pytest.approx(model([0.0, 1.0], 0.3, 0.1), rel=1e-12)
    assert got[3] is None


def test_window_ids_floor_for_negative_timestamps(spark):
    """Window bucketing must be floor semantics for pre-1970 timestamps:
    truncation-toward-zero would put ts=-1 into window 0 instead of -1,
    producing phantom absent windows (the chunk codec explicitly
    supports pre-1970 data, so the window layer must too)."""
    from parquet_common_spark.functions.promql import absent_over_time_windows

    df = spark.createDataFrame(
        [("s", -1, 1.0), ("s", -15, 2.0)], "series string, ts long, value double"
    )
    out = absent_over_time_windows(
        df, ["series"], "ts", window_us=10, range_start_us=-20, range_end_us=0
    ).collect()
    # samples at ts=-15 (window -2) and ts=-1 (window -1) cover the
    # whole [-20, 0) range: nothing is absent
    assert out == []
