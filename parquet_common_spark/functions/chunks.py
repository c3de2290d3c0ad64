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
from typing import NamedTuple

ENC_XOR = 1  # EncXOR (schema/encoder.go:75)
ENC_HISTOGRAM = 2  # EncHistogram (chunkenc id 2)
ENC_FLOAT_HISTOGRAM = 3  # EncFloatHistogram (chunkenc id 3)


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
    if len(samples) > 0xFFFF:
        raise ValueError(
            f"chunk sample count {len(samples)} exceeds the 16-bit header limit (65535)"
        )
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
        if enc in (ENC_HISTOGRAM, ENC_FLOAT_HISTOGRAM):
            raise TypeError(
                "histogram cell passed to unpack_chunks — use unpack_histogram_chunks"
            )
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


# ----------------------------------------------- native histogram chunks

# The reference's EncHistogram/EncFloatHistogram slots
# (schema/encoder.go:75-84 cutNewChunk, framing at encoder.go:200-222 —
# identical framing to XOR cells, ids 2/3).  The reference delegates the
# intra-chunk bytes to prometheus/tsdb/chunkenc; we implement our own
# documented bit layout over the SAME sample model (ts, schema,
# zero-threshold/count, count, sum, sparse span-run buckets for the
# positive and negative ranges).  Fidelity contract: pack -> unpack is
# the identity on the full native-histogram sample model; framing,
# encoding ids, chunk re-cut, and chunk-level time pruning match the
# reference's behavior.  Byte-compat with chunkenc's internal histogram
# stream is explicitly out of scope (it is a Go-library detail, not part
# of the reference's parquet contract — any chunkenc version may rewrite
# it).
#
# Per-chunk layout (MSB-first bitstream, like the XOR chunk):
#     2-byte big-endian sample count
#     raw 64-bit zero_threshold (constant within a chunk, as in chunkenc
#         — a threshold change must cut a new chunk)
#     uvarint custom-value count, then per value raw 64 bits — the
#         NHCB (schema -53) bucket bounds, constant within a chunk like
#         the zero threshold (chunkenc cuts a new chunk when the custom
#         bounds change); 0 for exponential-schema chunks
#     per sample:
#         ts       : zigzag varint (sample 0 absolute, sample 1 delta,
#                    sample 2+ delta-of-delta)
#         schema   : zigzag varint
#         count,
#         zero_count: int chunks — zigzag varint delta vs prev sample
#                     (sample 0 absolute); float chunks — XOR-compressed
#                     vs prev sample (own leading/trailing window state)
#         sum      : sample 0 raw 64 bits, then XOR-compressed
#         pos/neg buckets, each range:
#             uvarint span count; per span: zigzag varint offset (first
#                 absolute bucket index, then gap from previous run end),
#                 uvarint run length  — Prometheus's Span run-length model
#             per bucket value: int chunks — zigzag varint delta vs the
#                 previous bucket IN THE SAME sample (first absolute);
#                 float chunks — raw 64 bits (simple, lossless; the int
#                 path is the hot one)


class HistogramSample(NamedTuple):
    ts: int
    schema: int
    zero_threshold: float
    zero_count: float  # int for ENC_HISTOGRAM
    count: float  # int for ENC_HISTOGRAM
    sum: float
    pos_idx: tuple  # sorted sparse bucket indexes, positive range
    pos_counts: tuple
    neg_idx: tuple
    neg_counts: tuple
    # NHCB (schema -53) bucket upper bounds; () for exponential schemas
    custom_values: tuple = ()


def _idx_to_spans(idx) -> list[tuple[int, int]]:
    """Sorted sparse indexes -> (offset, length) runs.  First offset is
    the absolute starting index; later offsets are gaps from the previous
    run's end (Prometheus Span semantics)."""
    spans: list[tuple[int, int]] = []
    prev_end = None
    run_start = run_len = 0
    for k in idx:
        if prev_end is not None and k == prev_end:
            run_len += 1
        else:
            if prev_end is not None:
                spans.append((run_start, run_len))
            run_start = k if not spans else k - prev_end
            run_len = 1
        prev_end = k + 1
    if prev_end is not None:
        spans.append((run_start, run_len))
    return spans


def _spans_to_idx(spans) -> list[int]:
    out: list[int] = []
    pos = 0
    for i, (off, ln) in enumerate(spans):
        pos = off if i == 0 else pos + off
        out.extend(range(pos, pos + ln))
        pos += ln
    return out


def _w_uvarint(w: _BitWriter, n: int) -> None:
    n &= _M64
    while True:
        b = n & 0x7F
        n >>= 7
        w.write_bits((b | 0x80) if n else b, 8)
        if not n:
            return


def _w_svarint(w: _BitWriter, n: int) -> None:
    _w_uvarint(w, _zigzag(n))


def _r_uvarint(r: _BitReader) -> int:
    n = shift = 0
    while True:
        b = r.read_bits(8)
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n
        shift += 7


def _r_svarint(r: _BitReader) -> int:
    return _unzigzag(_r_uvarint(r))


def _f2bits(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", float(v)))[0]


def _bits2f(b: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", b))[0]


def encode_histogram_chunk(samples: list[HistogramSample], float_counts: bool) -> bytes:
    """One histogram chunk body (layout in the section comment above)."""
    if len(samples) > 0xFFFF:
        raise ValueError(
            f"chunk sample count {len(samples)} exceeds the 16-bit header limit (65535)"
        )
    w = _BitWriter()
    w.write_bits(len(samples), 16)
    if samples:
        zt = samples[0].zero_threshold
        if any(s.zero_threshold != zt for s in samples):
            raise ValueError("zero_threshold must be constant within a chunk")
        w.write_bits(_f2bits(zt), 64)
        cv = tuple(samples[0].custom_values)
        if any(tuple(s.custom_values) != cv for s in samples):
            raise ValueError("custom_values must be constant within a chunk")
        for s in samples:
            if (s.schema == -53) != bool(cv):
                raise ValueError(
                    "schema -53 requires custom_values and vice versa"
                )
        _w_uvarint(w, len(cv))
        for v in cv:
            w.write_bits(_f2bits(float(v)), 64)
    prev_ts = prev_delta = 0
    prev_count = prev_zero = 0
    # per-field XOR window state (float chunks): (prev_bits, leading, trailing)
    st = {"sum": [0, 0xFF, 0], "count": [0, 0xFF, 0], "zero": [0, 0xFF, 0]}

    def xor_field(name: str, value: float, first: bool) -> None:
        bits = _f2bits(value)
        if first:
            w.write_bits(bits, 64)
            st[name][0] = bits
            return
        pb, lead, trail = st[name]
        lead, trail = _write_vdelta(w, bits, pb, lead, trail)
        st[name] = [bits, lead, trail]

    for i, s in enumerate(samples):
        if i == 0:
            _w_svarint(w, s.ts)
        elif i == 1:
            prev_delta = s.ts - prev_ts
            _w_svarint(w, prev_delta)
        else:
            delta = s.ts - prev_ts
            _w_svarint(w, delta - prev_delta)
            prev_delta = delta
        prev_ts = s.ts
        _w_svarint(w, s.schema)
        if float_counts:
            xor_field("count", s.count, i == 0)
            xor_field("zero", s.zero_count, i == 0)
        else:
            _w_svarint(w, int(s.count) - prev_count)
            _w_svarint(w, int(s.zero_count) - prev_zero)
            prev_count, prev_zero = int(s.count), int(s.zero_count)
        xor_field("sum", s.sum, i == 0)
        for idx, counts in ((s.pos_idx, s.pos_counts), (s.neg_idx, s.neg_counts)):
            spans = _idx_to_spans(idx)
            _w_uvarint(w, len(spans))
            for off, ln in spans:
                _w_svarint(w, off)
                _w_uvarint(w, ln)
            prev_b = 0
            for j, c in enumerate(counts):
                if float_counts:
                    w.write_bits(_f2bits(c), 64)
                else:
                    _w_svarint(w, int(c) - (prev_b if j else 0))
                    prev_b = int(c)
    return bytes(w.buf)


def decode_histogram_chunk(buf: bytes, float_counts: bool) -> list[HistogramSample]:
    r = _BitReader(buf)
    n = r.read_bits(16)
    if n == 0:
        return []
    zt = _bits2f(r.read_bits(64))
    cv = tuple(_bits2f(r.read_bits(64)) for _ in range(_r_uvarint(r)))
    out: list[HistogramSample] = []
    ts = delta = 0
    count = zero = 0
    st = {"sum": [0, 0, 0], "count": [0, 0, 0], "zero": [0, 0, 0]}

    def xor_field(name: str, first: bool) -> float:
        if first:
            bits = r.read_bits(64)
            st[name][0] = bits
            return _bits2f(bits)
        pb, lead, trail = st[name]
        bits, lead, trail = _read_vdelta(r, pb, lead, trail)
        st[name] = [bits, lead, trail]
        return _bits2f(bits)

    for i in range(n):
        if i == 0:
            ts = _r_svarint(r)
        elif i == 1:
            delta = _r_svarint(r)
            ts += delta
        else:
            delta += _r_svarint(r)
            ts += delta
        schema = _r_svarint(r)
        if float_counts:
            count = xor_field("count", i == 0)
            zero = xor_field("zero", i == 0)
        else:
            count += _r_svarint(r)
            zero += _r_svarint(r)
        ssum = xor_field("sum", i == 0)
        ranges = []
        for _ in range(2):
            n_spans = _r_uvarint(r)
            spans = []
            for _ in range(n_spans):
                off = _r_svarint(r)
                ln = _r_uvarint(r)
                spans.append((off, ln))
            idx = _spans_to_idx(spans)
            counts = []
            prev_b = 0
            for j in range(len(idx)):
                if float_counts:
                    counts.append(_bits2f(r.read_bits(64)))
                else:
                    prev_b = _r_svarint(r) + (prev_b if j else 0)
                    counts.append(prev_b)
            ranges.append((tuple(idx), tuple(counts)))
        out.append(
            HistogramSample(
                ts, schema, zt, zero, count, ssum,
                ranges[0][0], ranges[0][1], ranges[1][0], ranges[1][1],
                cv,
            )
        )
    return out


def pack_histogram_chunks(
    samples: list[HistogramSample],
    samples_per_chunk: int = 120,
    float_counts: bool = False,
) -> bytes:
    """Sorted histogram samples -> framed cell (same framing as
    pack_chunks; encoding id 2 or 3)."""
    samples = sorted(samples, key=lambda s: s.ts)
    enc = ENC_FLOAT_HISTOGRAM if float_counts else ENC_HISTOGRAM
    out = bytearray()
    for i in range(0, len(samples), samples_per_chunk):
        part = samples[i : i + samples_per_chunk]
        body = encode_histogram_chunk(part, float_counts)
        out += _uvarint(enc)
        out += _uvarint(part[0].ts)
        out += _uvarint(part[-1].ts)
        out += _uvarint(len(body))
        out += body
    return bytes(out)


def unpack_histogram_chunks(
    buf: bytes, mint: int | None = None, maxt: int | None = None
) -> list[HistogramSample]:
    """Framed histogram cell -> samples, with the reference's chunk-level
    time pruning (encoder.go:311-321) then sample-level trim."""
    out: list[HistogramSample] = []
    pos = 0
    while pos < len(buf):
        enc, pos = _read_uvarint(buf, pos)
        cmin, pos = _read_uvarint(buf, pos)
        cmax, pos = _read_uvarint(buf, pos)
        cmin, cmax = _to_i64(cmin), _to_i64(cmax)
        ln, pos = _read_uvarint(buf, pos)
        body = buf[pos : pos + ln]
        pos += ln
        if enc not in (ENC_HISTOGRAM, ENC_FLOAT_HISTOGRAM):
            raise NotImplementedError(f"unknown histogram chunk encoding {enc}")
        if (maxt is not None and cmin > maxt) or (mint is not None and cmax < mint):
            continue
        out.extend(decode_histogram_chunk(body, enc == ENC_FLOAT_HISTOGRAM))
    if mint is not None:
        out = [s for s in out if s.ts >= mint]
    if maxt is not None:
        out = [s for s in out if s.ts <= maxt]
    return out


def pack_mixed_chunks(
    float_samples: list[tuple[int, float]] | None = None,
    histogram_samples: list[HistogramSample] | None = None,
    samples_per_chunk: int = 120,
    float_counts: bool = False,
) -> bytes:
    """One cell holding BOTH float and histogram chunks — the reference's
    encoder emits XOR, histogram and float-histogram chunks of the same
    series into the SAME data-column cell (encoder.go:202-219 iterates
    all three encodings when serializing), which happens whenever a
    series switches sample type.  Frames simply concatenate."""
    out = b""
    if float_samples:
        out += pack_chunks(float_samples, samples_per_chunk)
    if histogram_samples:
        out += pack_histogram_chunks(histogram_samples, samples_per_chunk, float_counts)
    return out


def unpack_mixed_chunks(
    buf: bytes, mint: int | None = None, maxt: int | None = None
) -> tuple[list[tuple[int, float]], list[HistogramSample]]:
    """Decode a cell of mixed encodings, dispatching per frame
    (the decoder's Pool.Get-by-encoding, encoder.go:274-325) with the
    same chunk-level pruning and sample-level trim."""
    floats: list[tuple[int, float]] = []
    hists: list[HistogramSample] = []
    pos = 0
    while pos < len(buf):
        enc, pos = _read_uvarint(buf, pos)
        cmin, pos = _read_uvarint(buf, pos)
        cmax, pos = _read_uvarint(buf, pos)
        cmin, cmax = _to_i64(cmin), _to_i64(cmax)
        ln, pos = _read_uvarint(buf, pos)
        body = buf[pos : pos + ln]
        pos += ln
        if (maxt is not None and cmin > maxt) or (mint is not None and cmax < mint):
            continue
        if enc == ENC_XOR:
            floats.extend(decode_chunk(body))
        elif enc in (ENC_HISTOGRAM, ENC_FLOAT_HISTOGRAM):
            hists.extend(decode_histogram_chunk(body, enc == ENC_FLOAT_HISTOGRAM))
        else:
            raise NotImplementedError(f"unknown chunk encoding {enc}")
    if mint is not None:
        floats = [s for s in floats if s[0] >= mint]
        hists = [s for s in hists if s.ts >= mint]
    if maxt is not None:
        floats = [s for s in floats if s[0] <= maxt]
        hists = [s for s in hists if s.ts <= maxt]
    return floats, hists


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


_NH_SAMPLE_FIELDS = (
    "nh_schema", "nh_zero_count", "nh_count", "nh_sum",
    "nh_pos_idx", "nh_pos_counts", "nh_neg_idx", "nh_neg_counts",
)


def histograms_to_packed(
    nh_df,
    samples_per_chunk: int = 120,
    zero_threshold: float = 1e-9,
):
    """Exploded native-histogram samples (series_hash, time_bucket, ts,
    nh_* per functions/native_histograms.NATIVE_FIELDS) -> one row per
    (series_hash, time_bucket) with a framed EncHistogram cell — the
    chunks-file row shape of the reference's histogram slot."""
    from pyspark.sql.types import BinaryType, IntegerType, LongType, StructField, StructType

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
            samples = [
                HistogramSample(
                    int(r[S.TS_COLUMN]), int(r["nh_schema"]), zero_threshold,
                    int(r["nh_zero_count"]), int(r["nh_count"]), float(r["nh_sum"]),
                    tuple(int(k) for k in r["nh_pos_idx"]),
                    tuple(int(c) for c in r["nh_pos_counts"]),
                    tuple(int(k) for k in r["nh_neg_idx"]),
                    tuple(int(c) for c in r["nh_neg_counts"]),
                )
                for _, r in g.iterrows()
            ]
            rows.append((int(h), int(b), pack_histogram_chunks(samples, samples_per_chunk)))
        return pd.DataFrame(rows, columns=[S.SERIES_HASH_COLUMN, S.TIME_BUCKET_COLUMN, "chunks"])

    return nh_df.groupBy(S.SERIES_HASH_COLUMN, S.TIME_BUCKET_COLUMN).applyInPandas(
        pack, schema=out_schema
    )


def packed_to_histograms(packed_df, mint: int | None = None, maxt: int | None = None):
    """Inverse of histograms_to_packed, with chunk-level time pruning."""
    from pyspark.sql.types import (
        ArrayType,
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
            StructField("nh_schema", IntegerType()),
            StructField("nh_zero_count", LongType()),
            StructField("nh_count", LongType()),
            StructField("nh_sum", DoubleType()),
            StructField("nh_pos_idx", ArrayType(IntegerType())),
            StructField("nh_pos_counts", ArrayType(LongType())),
            StructField("nh_neg_idx", ArrayType(IntegerType())),
            StructField("nh_neg_counts", ArrayType(LongType())),
        ]
    )
    cols = [S.SERIES_HASH_COLUMN, S.TIME_BUCKET_COLUMN, S.TS_COLUMN, *_NH_SAMPLE_FIELDS]

    def unpack(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for h, b, buf in zip(
                pdf[S.SERIES_HASH_COLUMN], pdf[S.TIME_BUCKET_COLUMN], pdf["chunks"]
            ):
                for s in unpack_histogram_chunks(bytes(buf), mint, maxt):
                    rows.append(
                        (
                            int(h), int(b), s.ts, s.schema, int(s.zero_count),
                            int(s.count), s.sum, list(s.pos_idx), list(s.pos_counts),
                            list(s.neg_idx), list(s.neg_counts),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return packed_df.mapInPandas(unpack, schema=out_schema)
