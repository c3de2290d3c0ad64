"""Randomized oracle-comparison tests for the matcher engine, mirroring
the reference's constraint-vs-brute-force strategy
(search/constraint_test.go:241) and its F1 fixture shape
(util/fixtures.go:23-77, scaled down).

The oracle is a pure-Python evaluator of PromQL matcher semantics over
the label dicts; the engine's select(skip_chunks=True) must agree on
every corpus entry and on hypothesis-generated random matchers.
"""

from __future__ import annotations

import random
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_common_spark import Matcher, ParquetQueryable
from parquet_common_spark import convert as C


def gen_series(seed: int = 42, n_metrics: int = 30, per_metric: int = 4) -> list[dict]:
    rnd = random.Random(seed)
    series = []
    for m in range(n_metrics):
        for u in range(per_metric):
            labels = {"__name__": f"metric_{m}", "unique": f"unique_{u}"}
            for j in range(3):
                labels[f"label_name_{j}"] = f"label_value_{j}"
            r = rnd.randrange(10)
            for k in range(r, r + 3):  # 3 of 12 sparse labels per series
                labels[f"random_name_{k}"] = f"random_value_{k}"
            if m % 3 == 0:  # newline-bearing values exercise (?s) anchoring
                labels["note"] = f"line1\nline2_{u}" if u % 2 == 0 else f"line1 line2_{u}"
            series.append(labels)
    return series


def oracle_match(labels: dict, m: Matcher) -> bool:
    v = labels.get(m.name, "")
    if m.op == "=":
        return v == m.value
    if m.op == "!=":
        return v != m.value
    # ^(?s:re)$ anchoring: dotall, exact full string (reference:
    # Prometheus FastRegexMatcher semantics)
    hit = re.fullmatch(m.value, v, re.DOTALL) is not None
    return hit if m.op == "=~" else not hit


@pytest.fixture(scope="module")
def engine(spark):
    series = gen_series()
    rows = [(labels, 0, 1.0) for labels in series]
    df = spark.createDataFrame(rows, "labels map<string,string>, ts long, value double")
    shard = C.to_shard(df)
    shard.series = shard.series.cache()
    return series, ParquetQueryable([shard])


def run_both(engine, matchers: list[Matcher]):
    series, q = engine
    got = q.select(0, 10, matchers, skip_chunks=True).collect()
    got_keys = sorted(
        tuple(sorted((k[2:], v) for k, v in r.asDict().items() if v is not None))
        for r in got
    )
    want_keys = sorted(
        tuple(sorted(labels.items()))
        for labels in series
        if all(oracle_match(labels, m) for m in matchers)
    )
    assert got_keys == want_keys, f"matchers={matchers}"


CORPUS = [
    [Matcher("__name__", "=", "metric_7")],
    [Matcher("__name__", "=", "metric_7"), Matcher("unique", "=", "unique_1")],
    [Matcher("__name__", "=~", "metric_[12]")],
    [Matcher("__name__", "=~", "metric_1|metric_22|metric_9")],
    [Matcher("__name__", "=~", "metric_1.*")],
    [Matcher("__name__", "!~", "metric_1.*")],
    [Matcher("__name__", "!=", "metric_3"), Matcher("unique", "!=", "unique_0")],
    [Matcher("random_name_5", "=", "random_value_5")],
    [Matcher("random_name_5", "=", "")],
    [Matcher("random_name_5", "!=", "")],
    [Matcher("random_name_5", "=~", ".*")],
    [Matcher("random_name_5", "=~", ".+")],
    [Matcher("random_name_5", "!~", ".+")],
    [Matcher("nonexistent", "=", "")],
    [Matcher("nonexistent", "!=", "x")],
    [Matcher("nonexistent", "=~", "a|b")],
    [Matcher("__name__", "=~", "metric_(1|2)"), Matcher("random_name_5", "!=", "")],
    [Matcher("label_name_1", "=", "label_value_1"), Matcher("label_name_2", "!~", "nope.*")],
    [Matcher("unique", "=~", "unique_[0-9]+"), Matcher("__name__", "!~", "metric_2.")],
    [Matcher("__name__", "=", "metric_1"), Matcher("__name__", "!=", "metric_1")],
    # (?s) anchoring over newline-bearing values
    [Matcher("note", "=~", "line1.line2_[0-9]")],
    [Matcher("note", "=~", "line1\nline2_0")],
    [Matcher("note", "!~", "line1.line2_.*")],
    [Matcher("note", "=~", "line1.*")],
    [Matcher("note", "=~", ".*line2_2")],
    # alternation-of-prefixes rewrite (r13) — incl. newline values and negation
    [Matcher("__name__", "=~", "(metric_1.*|metric_2.*)")],
    [Matcher("__name__", "!~", "(metric_1.*|metric_2.*)")],
    [Matcher("__name__", "=~", "metric_1.*|metric_29.*")],
    [Matcher("note", "!~", "(line1.*|nope.*)")],
    [Matcher("random_name_5", "!~", "(random_.*|other.*)")],
]


@pytest.mark.parametrize("matchers", CORPUS, ids=lambda ms: ",".join(f"{m.name}{m.op}{m.value}" for m in ms)[:60])
def test_corpus_vs_bruteforce(engine, matchers):
    run_both(engine, matchers)


_name = st.sampled_from(
    ["__name__", "unique", "random_name_5", "random_name_11", "label_name_0", "ghost"]
)
_op = st.sampled_from(["=", "!=", "=~", "!~"])
_value = st.sampled_from(
    [
        "", "metric_1", "unique_2", "random_value_5", "label_value_0",
        "metric_[0-9]", "metric_1.*", ".*", ".+", "unique_1|unique_3",
        "metric_(1|2|3)", "m.t.i._4", "random_.*_5",
    ]
)


@given(st.lists(st.builds(Matcher, _name, _op, _value), min_size=1, max_size=3))
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_matchers_vs_bruteforce(engine, matchers):
    run_both(engine, matchers)
