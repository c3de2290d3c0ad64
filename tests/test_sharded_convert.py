"""Sharded conversion (reference: shardSeries, convert/convert.go:633-731):
contiguous sorted ranges, series/samples co-sharding, cross-shard query
equivalence."""

from __future__ import annotations

from parquet_common_spark import Matcher, ParquetQueryable, convert as C, schema as S
from tests.test_convert_queryable import make_long_df


def test_sharded_convert_roundtrip(spark, tmp_path):
    out = str(tmp_path / "sharded")
    df = make_long_df(spark, n_series=120, samples=4)
    dirs = C.convert_sharded(df, out, num_shards=3, sort_labels=("__name__", "bar"))
    assert len(dirs) == 3

    q = ParquetQueryable.from_paths(spark, dirs)
    # all series present exactly once across shards
    total = sum(s.series.count() for s in q.shards)
    assert total == 120
    # shards hold disjoint contiguous ranges of the sort key
    ranges = []
    for s in q.shards:
        bars = [r["l_bar"] for r in s.series.select("l_bar").collect()]
        assert bars, "empty shard"
        ranges.append((min(bars), max(bars)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping shard ranges {hi1} > {lo2}"

    # co-sharding: every shard's samples join its own series completely
    for s in q.shards:
        n_samples = s.samples.count()
        joined = s.samples.join(s.series, S.SERIES_HASH_COLUMN).count()
        assert joined == n_samples

    # query across shards == query over the unsharded layout
    single = str(tmp_path / "single")
    C.convert(df, single, sort_labels=("__name__", "bar"))
    q1 = ParquetQueryable.from_paths(spark, [single])
    m = [Matcher("env", "=", "dev")]
    a = sorted(map(tuple, q.select(0, 10**12, m).collect()))
    b = sorted(map(tuple, q1.select(0, 10**12, m).collect()))
    assert a == b
