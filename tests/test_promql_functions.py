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
