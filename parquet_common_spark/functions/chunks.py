"""Fidelity chunk codec: the reference's packed-chunk binary form.

The canonical analytic form in this engine is exploded samples
(SURVEY.md §1.4) — joins/aggregations/windows all operate on rows.  This
module provides the OPTIONAL byte-level fidelity form for interop with the
reference's chunks files: each cell is a concatenation of framed chunks

    uvarint(encoding) uvarint(minT) uvarint(maxT) uvarint(len) || chunk_bytes

(reference: schema/encoder.go:200-222 ``Encode``, decode with time-range
filtering at encoder.go:274-325), with chunks re-cut every
``samples_per_chunk`` samples (encoder.go:105-113; default 120 =
tsdb.DefaultSamplesPerChunk, convert/convert.go:54).

Inside a chunk we store (delta-varint ts, raw float64 bits) pairs — the
reference delegates its XOR/Gorilla compression to
``prometheus/tsdb/chunkenc`` (an external library from this repo's point
of view), so byte-level parity of chunk *interiors* is explicitly out of
scope; the FRAMING and cut/filter semantics are faithful.  Encoding id 1
mirrors ``EncXOR``'s slot (schema/encoder.go:75).

Both directions are Arrow-batched pandas UDFs (grouped map) — binary
packing is the one job Column expressions can't express; everything stays
columnar until the per-series pack/unpack.
"""

from __future__ import annotations

import struct

ENC_RAW = 1  # occupies the EncXOR slot; interior codec is ours (see module doc)


_M64 = (1 << 64) - 1


def _uvarint(n: int) -> bytes:
    # Negative ints wrap to their uint64 two's complement, matching the
    # reference's uint64(ts) casts (schema/encoder.go) — without the mask
    # a negative input shifts right forever and hangs the executor task.
    n &= _M64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _to_i64(n: int) -> int:
    """Reinterpret a decoded uint64 as int64 (pre-1970 timestamps)."""
    return n - (1 << 64) if n >= (1 << 63) else n


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def encode_chunk(samples: list[tuple[int, float]]) -> bytes:
    """One chunk body: uvarint sample count, uvarint ts deltas (first ts
    absolute), raw little-endian float64 values."""
    out = bytearray(_uvarint(len(samples)))
    prev = 0
    for ts, _ in samples:
        out += _uvarint(ts - prev)
        prev = ts
    for _, v in samples:
        out += struct.pack("<d", v)
    return bytes(out)


def decode_chunk(buf: bytes) -> list[tuple[int, float]]:
    n, pos = _read_uvarint(buf, 0)
    ts = []
    cur = 0
    for _ in range(n):
        d, pos = _read_uvarint(buf, pos)
        cur = (cur + d) & _M64  # mod-2^64 delta chain, sign-restored below
        ts.append(_to_i64(cur))
    vals = struct.unpack_from(f"<{n}d", buf, pos)
    return list(zip(ts, vals))


def pack_chunks(samples: list[tuple[int, float]], samples_per_chunk: int = 120) -> bytes:
    """Sorted (ts, value) samples -> framed concatenation of chunks
    (the content of one s_data cell)."""
    samples = sorted(samples)
    out = bytearray()
    for i in range(0, len(samples), samples_per_chunk):
        part = samples[i : i + samples_per_chunk]
        body = encode_chunk(part)
        out += _uvarint(ENC_RAW)
        out += _uvarint(part[0][0])
        out += _uvarint(part[-1][0])
        out += _uvarint(len(body))
        out += body
    return bytes(out)


def unpack_chunks(buf: bytes, mint: int | None = None, maxt: int | None = None) -> list[tuple[int, float]]:
    """Framed cell -> samples, skipping chunks entirely outside
    [mint, maxt] (reference: encoder.go:311-321 chunk time filter)."""
    out: list[tuple[int, float]] = []
    pos = 0
    while pos < len(buf):
        enc, pos = _read_uvarint(buf, pos)
        cmin, pos = _read_uvarint(buf, pos)
        cmax, pos = _read_uvarint(buf, pos)
        cmin, cmax = _to_i64(cmin), _to_i64(cmax)
        ln, pos = _read_uvarint(buf, pos)
        body = buf[pos : pos + ln]
        pos += ln
        if enc != ENC_RAW:
            raise NotImplementedError(f"unknown chunk encoding {enc}")
        if (maxt is not None and cmin > maxt) or (mint is not None and cmax < mint):
            continue  # prune whole chunk
        out.extend(decode_chunk(body))
    if mint is not None:
        out = [s for s in out if s[0] >= mint]
    if maxt is not None:
        out = [s for s in out if s[0] <= maxt]
    return out


# --------------------------------------------------------- DataFrame level


def samples_to_packed(samples_df, samples_per_chunk: int = 120):
    """Exploded samples (series_hash, time_bucket, ts, value) -> one row
    per (series_hash, time_bucket) with a packed binary cell — the
    reference's chunks-file row shape, keyed explicitly instead of
    positionally."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from parquet_common_spark import schema as S

    out_schema = StructType(
        [
            StructField(S.SERIES_HASH_COLUMN, LongType()),
            StructField(S.TIME_BUCKET_COLUMN, IntegerType()),
            StructField("chunks", BinaryType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        rows = []
        for (h, b), g in pdf.groupby([S.SERIES_HASH_COLUMN, S.TIME_BUCKET_COLUMN]):
            pairs = list(zip(g[S.TS_COLUMN].astype(int), g[S.VALUE_COLUMN].astype(float)))
            rows.append((int(h), int(b), pack_chunks(pairs, samples_per_chunk)))
        return pd.DataFrame(rows, columns=[S.SERIES_HASH_COLUMN, S.TIME_BUCKET_COLUMN, "chunks"])

    return samples_df.groupBy(S.SERIES_HASH_COLUMN, S.TIME_BUCKET_COLUMN).applyInPandas(
        pack, schema=out_schema
    )


def packed_to_samples(packed_df, mint: int | None = None, maxt: int | None = None):
    """Inverse of samples_to_packed, with chunk-level time pruning."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from parquet_common_spark import schema as S

    out_schema = StructType(
        [
            StructField(S.SERIES_HASH_COLUMN, LongType()),
            StructField(S.TIME_BUCKET_COLUMN, IntegerType()),
            StructField(S.TS_COLUMN, LongType()),
            StructField(S.VALUE_COLUMN, DoubleType()),
        ]
    )

    def unpack(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for h, b, buf in zip(
                pdf[S.SERIES_HASH_COLUMN], pdf[S.TIME_BUCKET_COLUMN], pdf["chunks"]
            ):
                for ts, v in unpack_chunks(bytes(buf), mint, maxt):
                    rows.append((int(h), int(b), ts, v))
            yield pd.DataFrame(
                rows,
                columns=[S.SERIES_HASH_COLUMN, S.TIME_BUCKET_COLUMN, S.TS_COLUMN, S.VALUE_COLUMN],
            )

    return packed_df.mapInPandas(unpack, schema=out_schema)
