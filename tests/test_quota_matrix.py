"""Replay of the reference's quota-failure scenario table through the
Python surface (reference: queryable/parquet_queryable_test.go:307-430,
fixture shape util/fixtures.go:38-78) — the same discipline as
test_constraint_golden.py's replay of the matcher TestFilter table.

The Go test builds GenerateTestData(TotalMetricNames x
MetricsPerMetricName series, each carrying __name__, unique,
label_name_0..4 and 3 random_name_k labels), converts it under TWO
option sets (default; custom sort + small row groups), then for each of
the three quota kinds runs the SAME matcher (unique="unique_0") over
the full time range with (a) a starvation budget -> a
resource-exhausted error naming the exhausted dimension, and (b) a
generous budget -> non-empty result, no error.  Scaled down here
(25x20 series, 6 samples) — the scenario structure, matcher, budget
pairs and assertions mirror the Go table one-to-one.
"""

from __future__ import annotations

import random

import pytest

from parquet_common_spark import Matcher, ParquetQueryable, Quota, ResourceExhausted
from parquet_common_spark import convert as C

TOTAL_METRIC_NAMES = 25      # reference: 1_000 (scaled)
METRICS_PER_NAME = 20        # reference: 20
NUMBER_OF_LABELS = 5         # reference: 5
RANDOM_LABELS = 3            # reference: 3
NUMBER_OF_SAMPLES = 6        # reference: 250 (scaled)


def _generate_test_data(spark):
    """util/fixtures.go:38-78 GenerateTestData, scaled."""
    rng = random.Random(1234)
    rows = []
    for i in range(TOTAL_METRIC_NAMES):
        for n in range(METRICS_PER_NAME):
            labels = {
                "__name__": f"metric_{i}",
                "unique": f"unique_{n}",
            }
            for j in range(NUMBER_OF_LABELS):
                labels[f"label_name_{j}"] = f"label_value_{j}"
            first_random = rng.randint(0, 9)
            for k in range(first_random, first_random + RANDOM_LABELS):
                labels[f"random_name_{k}"] = f"random_value_{k}"
            for s in range(NUMBER_OF_SAMPLES):
                rows.append((labels, s * 60_000, float(i)))
    return spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double"
    )


# The Go test's convert-option table (parquet_queryable_test.go:68-93):
# default options, and a custom set (WithRowGroupSize(500) + WithSortBy
# on __name__,label_name_1).  Page-buffer size has no analogue here.
_CONVERT_OPTS = {
    "default": dict(col_duration_ms=8 * 3600 * 1000),
    "sorted_small_rowgroups": dict(
        col_duration_ms=3600 * 1000,
        sort_labels=("__name__", "label_name_1"),
        row_group_size=500,
    ),
}


@pytest.fixture(scope="module", params=list(_CONVERT_OPTS))
def quota_shard(request, spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("quota_matrix") / request.param)
    df = _generate_test_data(spark)
    C.convert(df, out, **_CONVERT_OPTS[request.param])
    return out


_MATCHERS = [Matcher("unique", "=", "unique_0")]

# (scenario, starvation quota, generous quota, error regex).  Row
# budgets are the Go table's verbatim (10 / 1000); byte starvation is
# the Go table's 100.  The generous byte budget is 16 MB instead of the
# Go table's 1 MB because this engine meters bytes on PRUNED FILE SIZES
# (SURVEY §2.6 — pre-flight guard) where the reference meters the pages
# it actually touches — same scenario semantics (starved fails /
# generous passes), coarser meter.
_SCENARIOS = [
    # RowCountQuota (parquet_queryable_test.go:307-345)
    ("rows", Quota(max_rows=10), Quota(max_rows=1000), "too many"),
    # ChunkBytesQuota (parquet_queryable_test.go:347-386)
    ("chunk_bytes", Quota(max_chunk_bytes=100), Quota(max_chunk_bytes=16_000_000),
     "chunk bytes"),
    # DataBytesQuota (parquet_queryable_test.go:388-430)
    ("data_bytes", Quota(max_data_bytes=100), Quota(max_data_bytes=16_000_000),
     "data bytes"),
]


@pytest.mark.parametrize(
    "name,starved,generous,err_re", _SCENARIOS, ids=[s[0] for s in _SCENARIOS]
)
def test_quota_scenarios(spark, quota_shard, name, starved, generous, err_re):
    q = ParquetQueryable.from_paths(spark, [quota_shard])

    # starvation budget: the reference requires an error that (a) names
    # the exhausted dimension and (b) IsResourceExhausted — here the
    # dedicated exception type carries both.
    with pytest.raises(ResourceExhausted, match=err_re):
        q.select(0, 10**12, _MATCHERS, quota=starved)

    # generous budget: same query, non-empty result, no error.
    rows = q.select(0, 10**12, _MATCHERS, quota=generous).collect()
    assert rows, "generous quota must return series"
    assert all(r["l_unique"] == "unique_0" for r in rows)
    # unique_0 exists under every metric name: 25 series x 6 samples
    assert len(rows) == TOTAL_METRIC_NAMES * NUMBER_OF_SAMPLES


def test_quota_row_budget_counts_matched_series(spark, quota_shard):
    """The row quota meters MATCHED series (reference: 'would fetch too
    many rows' fires on the matched row count, not the corpus size): a
    budget of exactly the match count passes, one less fails."""
    q = ParquetQueryable.from_paths(spark, [quota_shard])
    n_match = TOTAL_METRIC_NAMES  # one unique_0 series per metric name
    q.select(0, 10**12, _MATCHERS, quota=Quota(max_rows=n_match)).collect()
    with pytest.raises(ResourceExhausted):
        q.select(0, 10**12, _MATCHERS, quota=Quota(max_rows=n_match - 1))
