"""Fidelity chunk codec: framing round-trip, chunk cutting, time pruning
(reference semantics: schema/encoder.go:105-113, 200-222, 274-325)."""

from __future__ import annotations

import pytest

from parquet_common_spark import schema as S
from parquet_common_spark.functions import chunks as CK


def test_uvarint_roundtrip():
    for n in [0, 1, 127, 128, 300, 2**20, 2**40, 2**62]:
        buf = CK._uvarint(n)
        got, pos = CK._read_uvarint(buf, 0)
        assert got == n and pos == len(buf)


def test_uvarint_negative_terminates_and_wraps():
    # pre-1970 timestamp: must NOT hang; wraps via uint64 like the Go
    # encoder (schema/encoder.go) and sign-restores on decode
    buf = CK._uvarint(-5)
    got, _ = CK._read_uvarint(buf, 0)
    assert got == (1 << 64) - 5
    assert CK._to_i64(got) == -5


def test_pack_unpack_roundtrip():
    samples = [(i * 1000, float(i) * 1.5) for i in range(300)]
    buf = CK.pack_chunks(samples, samples_per_chunk=120)
    assert CK.unpack_chunks(buf) == samples


def test_pack_unpack_pre_1970_timestamps():
    # negative ts (pre-epoch): framing mint/maxt and the first delta are
    # negative — full round-trip incl. chunk-level time pruning
    samples = [(-500_000 + i * 1000, float(i)) for i in range(250)]
    buf = CK.pack_chunks(samples, samples_per_chunk=100)
    assert CK.unpack_chunks(buf) == samples
    got = CK.unpack_chunks(buf, mint=-400_000, maxt=-300_000)
    assert got == [(t, v) for t, v in samples if -400_000 <= t <= -300_000]


def test_chunk_cutting():
    # 300 samples at 120/chunk -> 3 chunks (reference re-cut semantics)
    samples = [(i, float(i)) for i in range(300)]
    buf = CK.pack_chunks(samples, samples_per_chunk=120)
    n_chunks = 0
    pos = 0
    while pos < len(buf):
        _, pos = CK._read_uvarint(buf, pos)   # enc
        _, pos = CK._read_uvarint(buf, pos)   # mint
        _, pos = CK._read_uvarint(buf, pos)   # maxt
        ln, pos = CK._read_uvarint(buf, pos)  # len
        pos += ln
        n_chunks += 1
    assert n_chunks == 3


def test_time_pruning():
    samples = [(i * 10, float(i)) for i in range(100)]
    buf = CK.pack_chunks(samples, samples_per_chunk=10)
    got = CK.unpack_chunks(buf, mint=250, maxt=500)
    assert got == [(t, v) for t, v in samples if 250 <= t <= 500]
    assert CK.unpack_chunks(buf, mint=10**9) == []


def test_dataframe_pack_roundtrip(spark):
    rows = [(h, (t // 100), t, float(h * 1000 + t)) for h in (1, 2) for t in range(0, 500, 7)]
    df = spark.createDataFrame(
        rows,
        f"{S.SERIES_HASH_COLUMN} long, {S.TIME_BUCKET_COLUMN} int, {S.TS_COLUMN} long, {S.VALUE_COLUMN} double",
    )
    packed = CK.samples_to_packed(df, samples_per_chunk=20)
    assert packed.count() == df.select(S.SERIES_HASH_COLUMN, S.TIME_BUCKET_COLUMN).distinct().count()
    back = CK.packed_to_samples(packed)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # time-pruned decode
    pruned = CK.packed_to_samples(packed, mint=100, maxt=200)
    expected = [r for r in rows if 100 <= r[2] <= 200]
    assert sorted(map(tuple, pruned.collect())) == sorted(expected)


def test_series_filter_callback(spark):
    from pyspark.sql import functions as F

    from parquet_common_spark import Matcher, ParquetQueryable
    from parquet_common_spark import convert as C

    df = spark.createDataFrame(
        [({"__name__": "m", "pod": f"p{i}"}, 0, float(i)) for i in range(6)],
        "labels map<string,string>, ts long, value double",
    )
    q = ParquetQueryable([C.to_shard(df)])
    out = q.select(
        0, 10, [Matcher("__name__", "=", "m")],
        series_filter=lambda s: F.col("l_pod").isin("p1", "p3"),
    )
    assert sorted(r["l_pod"] for r in out.collect()) == ["p1", "p3"]


def test_convert_max_series(spark, tmp_path):
    from parquet_common_spark import ParquetQueryable
    from parquet_common_spark import convert as C

    df = spark.createDataFrame(
        [({"__name__": "m", "i": str(i)}, 0, 1.0) for i in range(20)],
        "labels map<string,string>, ts long, value double",
    )
    out = str(tmp_path / "capped")
    C.convert(df, out, max_series=5)
    sh = ParquetQueryable.from_paths(spark, [out]).shards[0]
    assert sh.series.count() == 5
    assert sh.samples.count() == 5
