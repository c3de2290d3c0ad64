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

Inside a chunk we implement the Gorilla XOR encoding itself — the same
wire layout as ``prometheus/tsdb/chunkenc``'s XOR chunk (the library the
reference delegates to, schema/encoder.go:75 ``EncXOR``), which is the
public format from Facebook's Gorilla paper (Pelkonen et al., VLDB'15):

    2-byte big-endian sample count
    sample 0:   zigzag-varint ts, raw 64-bit float value
    sample 1:   uvarint ts delta, XOR-compressed value
    sample 2+:  delta-of-delta ts in prefix-coded bit windows
                ('0' | '10'+14b | '110'+17b | '1110'+20b | '1111'+64b),
                XOR-compressed value (control bits: same-window reuse vs
                new 5-bit leading + 6-bit significant-length window)

Bits are packed MSB-first.  A 6-bit significant-length of 0 means 64
(the format's documented overflow convention).  Encoding id 1 is
``EncXOR``.

Both directions are Arrow-batched pandas UDFs (grouped map) — binary
packing is the one job Column expressions can't express; everything stays
columnar until the per-series pack/unpack.
"""

from __future__ import annotations

import struct

ENC_XOR = 1  # EncXOR (schema/encoder.go:75)


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


class _BitWriter:
    """MSB-first bit stream (the bstream layout of Gorilla-style chunks)."""

    __slots__ = ("buf", "free")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.free = 0  # unused low bits in the last byte

    def write_bit(self, bit: int) -> None:
        if self.free == 0:
            self.buf.append(0)
            self.free = 8
        if bit:
            self.buf[-1] |= 1 << (self.free - 1)
        self.free -= 1

    def write_bits(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1
        while nbits > 0:
            if self.free == 0:
                self.buf.append(0)
                self.free = 8
            take = min(self.free, nbits)
            chunk = (value >> (nbits - take)) & ((1 << take) - 1)
            self.buf[-1] |= chunk << (self.free - take)
            self.free -= take
            nbits -= take


class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        b = (self.buf[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def read_bits(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            byte_i, bit_i = self.pos >> 3, self.pos & 7
            take = min(8 - bit_i, nbits)
            chunk = (self.buf[byte_i] >> (8 - bit_i - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            nbits -= take
        return out


def _zigzag(n: int) -> int:
    """Go binary.PutVarint's signed mapping (first-sample timestamp)."""
    u = (n << 1) & _M64
    return (~u) & _M64 if n < 0 else u


def _unzigzag(u: int) -> int:
    return -((u + 1) >> 1) if u & 1 else u >> 1


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


# delta-of-delta prefix windows: (control bits, control width, payload bits)
_DOD_WINDOWS = ((0b10, 2, 14), (0b110, 3, 17), (0b1110, 4, 20))


def encode_chunk(samples: list[tuple[int, float]]) -> bytes:
    """One XOR chunk body (Gorilla layout, see module doc)."""
    w = _BitWriter()
    w.write_bits(len(samples), 16)  # 2-byte big-endian count header
    prev_ts = prev_delta = 0
    prev_bits = 0
    leading, trailing = 0xFF, 0  # 0xFF = no window established yet
    for i, (ts, v) in enumerate(samples):
        vbits = struct.unpack("<Q", struct.pack("<d", v))[0]
        if i == 0:
            zz = _zigzag(ts)
            while True:  # varint over the zigzag value
                b = zz & 0x7F
                zz >>= 7
                w.write_bits((b | 0x80) if zz else b, 8)
                if not zz:
                    break
            w.write_bits(vbits, 64)
        elif i == 1:
            delta = ts - prev_ts
            d = delta & _M64
            while True:
                b = d & 0x7F
                d >>= 7
                w.write_bits((b | 0x80) if d else b, 8)
                if not d:
                    break
            prev_delta = delta
            leading, trailing = _write_vdelta(w, vbits, prev_bits, leading, trailing)
        else:
            delta = ts - prev_ts
            dod = delta - prev_delta
            if dod == 0:
                w.write_bit(0)
            else:
                for ctrl, cw, nbits in _DOD_WINDOWS:
                    if -((1 << (nbits - 1)) - 1) <= dod <= (1 << (nbits - 1)):
                        w.write_bits(ctrl, cw)
                        w.write_bits(dod, nbits)
                        break
                else:
                    w.write_bits(0b1111, 4)
                    w.write_bits(dod, 64)
            prev_delta = delta
            leading, trailing = _write_vdelta(w, vbits, prev_bits, leading, trailing)
        prev_ts, prev_bits = ts, vbits
    return bytes(w.buf)


def _write_vdelta(
    w: _BitWriter, vbits: int, prev_bits: int, leading: int, trailing: int
) -> tuple[int, int]:
    xor = vbits ^ prev_bits
    if xor == 0:
        w.write_bit(0)
        return leading, trailing
    w.write_bit(1)
    lz, tz = min(_clz64(xor), 31), _ctz64(xor)
    if leading != 0xFF and lz >= leading and tz >= trailing:
        w.write_bit(0)  # reuse the established window
        w.write_bits(xor >> trailing, 64 - leading - trailing)
        return leading, trailing
    w.write_bit(1)  # new window
    w.write_bits(lz, 5)
    sigbits = 64 - lz - tz
    w.write_bits(sigbits, 6)  # 64 wraps to 0 — reader restores it
    w.write_bits(xor >> tz, sigbits)
    return lz, tz


def decode_chunk(buf: bytes) -> list[tuple[int, float]]:
    r = _BitReader(buf)
    n = r.read_bits(16)
    out: list[tuple[int, float]] = []
    ts = delta = 0
    vbits = 0
    leading = trailing = 0
    for i in range(n):
        if i == 0:
            zz = shift = 0
            while True:
                b = r.read_bits(8)
                zz |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            ts = _unzigzag(zz)
            vbits = r.read_bits(64)
        elif i == 1:
            d = shift = 0
            while True:
                b = r.read_bits(8)
                d |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            delta = _to_i64(d)
            ts += delta
            vbits, leading, trailing = _read_vdelta(r, vbits, leading, trailing)
        else:
            nbits = 0
            if r.read_bit():
                for _, _, width in _DOD_WINDOWS:
                    nbits = width
                    if not r.read_bit():
                        break
                else:
                    nbits = 64
            if nbits:
                dod = r.read_bits(nbits)
                if nbits != 64 and dod > (1 << (nbits - 1)):
                    dod -= 1 << nbits  # sign-extend the bit window
                elif nbits == 64:
                    dod = _to_i64(dod)
                delta += dod
            ts += delta
            vbits, leading, trailing = _read_vdelta(r, vbits, leading, trailing)
        out.append((ts, struct.unpack("<d", struct.pack("<Q", vbits))[0]))
    return out


def _read_vdelta(r: _BitReader, prev_bits: int, leading: int, trailing: int) -> tuple[int, int, int]:
    if not r.read_bit():
        return prev_bits, leading, trailing
    if r.read_bit():
        leading = r.read_bits(5)
        sigbits = r.read_bits(6) or 64  # 0 means 64 (format convention)
        trailing = 64 - leading - sigbits
    sigbits = 64 - leading - trailing
    xor = r.read_bits(sigbits) << trailing
    return prev_bits ^ xor, leading, trailing


def pack_chunks(samples: list[tuple[int, float]], samples_per_chunk: int = 120) -> bytes:
    """Sorted (ts, value) samples -> framed concatenation of chunks
    (the content of one s_data cell)."""
    samples = sorted(samples)
    out = bytearray()
    for i in range(0, len(samples), samples_per_chunk):
        part = samples[i : i + samples_per_chunk]
        body = encode_chunk(part)
        out += _uvarint(ENC_XOR)
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
        if enc != ENC_XOR:
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
