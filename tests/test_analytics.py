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
