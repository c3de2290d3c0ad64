"""TIFF 6.0 codec (baseline: strips, PackBits, LZW, predictor 2).

The scanned-document archive format next to lossless JPEG (SOF3) and
GIF: faxes, book scans and institutional archives arrive as TIFF, so
a training-data ingest path needs at least the baseline envelope.
Implemented from the public TIFF 6.0 specification (Adobe, 1992):

* both byte orders (``II``/``MM``), single- and multi-strip images,
* 8-bit grayscale and RGB, PlanarConfiguration 1 (chunky),
* Compression 1 (none), 5 (LZW) and 32773 (PackBits),
* TIFF-variant LZW: MSB-first bit packing, 9..12-bit codes and the
  spec's EARLY-CHANGE width bump (one code earlier than GIF's — the
  classic interop trap, handled explicitly on both sides),
* Predictor 2 (horizontal differencing) for LZW strips.

Like gifcodec/mediacodec this is a PURE deterministic codec; the
encoder exists so tests and the mm9 registry entry round-trip REAL
bitstreams (all supported modes are lossless, so pixel checksums have
closed-form DuckDB oracles).  Unsupported features (tiles, 1/4/16-bit
depths, CCITT fax codes, planar=2) raise ValueError('TIFF: ...') —
envelope guards, same posture as the JPEG mode dispatch.

Scale shape: per-payload functions driven from Arrow ``mapInPandas``
batches — embarrassingly parallel, no shuffle (mediacodec posture).
"""

from __future__ import annotations

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ------------------------------------------------------------ PackBits


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("TIFF: PackBits stream truncated")
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("TIFF: PackBits stream truncated")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("TIFF: PackBits stream truncated")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op per spec
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal: extend until a run of >=3 starts (2-byte runs aren't
        # worth breaking a literal for) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------- TIFF LZW
#
# MSB-first packing; clear=256, EOI=257, first dynamic code 258; width
# starts at 9 and bumps EARLY: when the next code to be assigned is
# (1<<width)-1 (spec: "because the LZW compressor adds the code to the
# table before writing the next one" — TIFF 6.0 p.61), unlike GIF's
# bump at 1<<width.


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    clear, eoi = 256, 257
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    next_code = 258
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: int | None = None
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF: LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            next_code = 258
            width = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF: bad first LZW code")
            out += table[code]
            prev = code
            continue
        if code < next_code and code < len(table):
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("TIFF: LZW code out of range")
        out += entry
        if next_code < 4096:
            table.append(table[prev] + entry[:1])
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:  # early change
                width += 1
        prev = code
    if len(out) < expected:
        raise ValueError("TIFF: LZW stream truncated")
    return bytes(out[:expected])


def tiff_lzw_encode(data: bytes) -> bytes:
    clear, eoi = 256, 257
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    emit(clear)
    prefix = b""
    for i in range(len(data)):
        k = data[i : i + 1]
        cand = prefix + k
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code < 4094:  # leave room: spec reserves 4095 pre-clear
            table[cand] = next_code
            next_code += 1
            # decoder early-bumps when ITS next == (1<<width)-1; it lags
            # the encoder by exactly one entry at read time, so the
            # encoder bumps at (1<<width) — one earlier than GIF's
            # (1<<width)+1, which is precisely the "early change"
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
        prefix = k
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decode


def _read_ifd(data: bytes, bo: str) -> dict[int, list[int]]:
    off = int.from_bytes(data[4:8], bo)
    if off + 2 > len(data):
        raise ValueError("TIFF: IFD offset out of range")
    n = int.from_bytes(data[off : off + 2], bo)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            raise ValueError("TIFF: IFD entry truncated")
        tag = int.from_bytes(data[e : e + 2], bo)
        typ = int.from_bytes(data[e + 2 : e + 4], bo)
        cnt = int.from_bytes(data[e + 4 : e + 8], bo)
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            voff = int.from_bytes(data[e + 8 : e + 12], bo)
            if voff + size > len(data):
                raise ValueError("TIFF: tag value out of range")
            raw = data[voff : voff + size]
        step = _TYPE_SIZES[typ]
        if typ == 5:  # RATIONAL: keep numerator only (unused tags here)
            vals = [int.from_bytes(raw[j : j + 4], bo) for j in range(0, size, 8)]
        else:
            vals = [int.from_bytes(raw[j : j + step], bo) for j in range(0, size, step)]
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline TIFF into ``(width, height, pixels)`` with
    pixels ``(h, w, samples)`` uint8."""
    if len(data) < 8:
        raise ValueError("TIFF: header truncated")
    if data[:2] == b"II" and data[2:4] == b"\x2a\x00":
        bo = "little"
    elif data[:2] == b"MM" and data[2:4] == b"\x00\x2a":
        bo = "big"
    else:
        raise ValueError("TIFF: bad signature")
    tags = _read_ifd(data, bo)
    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_HEIGHT][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF: required tag missing ({e})") from None
    spp = tags.get(_TAG_SAMPLES, [1])[0]
    bits = tags.get(_TAG_BITS, [8] * spp)
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    planar = tags.get(_TAG_PLANAR, [1])[0]
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    if any(b != 8 for b in bits):
        raise ValueError("TIFF: only 8-bit samples supported")
    if planar != 1:
        raise ValueError("TIFF: only chunky planar configuration supported")
    if comp not in (1, 5, 32773):
        raise ValueError(f"TIFF: unsupported compression {comp}")
    if predictor not in (1, 2):
        raise ValueError(f"TIFF: unsupported predictor {predictor}")
    if len(offsets) != len(counts):
        raise ValueError("TIFF: strip offset/count mismatch")
    row_bytes = w * spp
    rows = []
    row_start = 0
    for si, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(data):
            raise ValueError("TIFF: strip out of range")
        nrows = min(rows_per_strip, h - row_start)
        expected = nrows * row_bytes
        raw = data[o : o + c]
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("TIFF: strip truncated")
            plain = raw[:expected]
        elif comp == 5:
            plain = tiff_lzw_decode(raw, expected)
        else:
            plain = packbits_decode(raw, expected)
        strip = np.frombuffer(plain, dtype=np.uint8).reshape(nrows, w, spp)
        if predictor == 2:
            strip = (np.cumsum(strip.astype(np.int64), axis=1) & 0xFF).astype(
                np.uint8
            )
        rows.append(strip)
        row_start += nrows
    if row_start != h:
        raise ValueError("TIFF: strips do not cover image height")
    return w, h, np.concatenate(rows, axis=0)


def tiff_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, samples_per_pixel) from the IFD only."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("TIFF: bad signature")
    bo = "little" if data[:2] == b"II" else "big"
    tags = _read_ifd(data, bo)
    return (
        tags.get(_TAG_WIDTH, [0])[0],
        tags.get(_TAG_HEIGHT, [0])[0],
        tags.get(_TAG_SAMPLES, [1])[0],
    )


# ------------------------------------------------------------- encode


def encode_tiff(
    pixels: np.ndarray,
    *,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    byte_order: str = "little",
) -> bytes:
    """Encode ``(h, w)`` or ``(h, w, samples)`` uint8 as baseline TIFF
    (test-oracle encoder: strips, optional PackBits/LZW, predictor 2
    with LZW)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if compression not in (1, 5, 32773):
        raise ValueError(f"TIFF: unsupported compression {compression}")
    if predictor == 2 and compression == 1:
        raise ValueError("TIFF: predictor requires a compressed layout")
    bo = byte_order
    rps = rows_per_strip or h
    strips = []
    for r0 in range(0, h, rps):
        strip = px[r0 : r0 + rps]
        if predictor == 2:
            d = strip.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            strip = (d & 0xFF).astype(np.uint8)
        raw = strip.tobytes()
        if compression == 5:
            strips.append(tiff_lzw_encode(raw))
        elif compression == 32773:
            strips.append(packbits_encode(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, bo)

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, bo)

    entries = []  # (tag, type, count, value_bytes_or_int)
    photometric = 1 if spp == 1 else 2
    # layout: header(8) + IFD + external values + strip data
    tag_list = [
        (_TAG_WIDTH, 3, 1, w),
        (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, spp, [8] * spp),
        (_TAG_COMPRESSION, 3, 1, compression),
        (_TAG_PHOTOMETRIC, 3, 1, photometric),
        (_TAG_STRIP_OFFSETS, 4, n_strips, None),  # filled below
        (_TAG_SAMPLES, 3, 1, spp),
        (_TAG_ROWS_PER_STRIP, 3, 1, rps),
        (_TAG_STRIP_COUNTS, 4, n_strips, [len(s) for s in strips]),
        (_TAG_PLANAR, 3, 1, 1),
    ]
    if predictor == 2:
        tag_list.append((_TAG_PREDICTOR, 3, 1, 2))
    tag_list.sort(key=lambda t: t[0])
    ifd_off = 8
    ifd_size = 2 + 12 * len(tag_list) + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()

    def value_field(typ: int, cnt: int, vals) -> bytes:
        step = _TYPE_SIZES[typ]
        if isinstance(vals, int):
            vals = [vals]
        raw = b"".join(int(v).to_bytes(step, bo) for v in vals)
        if len(raw) <= 4:
            return raw + b"\x00" * (4 - len(raw))
        nonlocal_off = ext_off + len(ext)
        ext.extend(raw)
        return u32(nonlocal_off)

    # strip data lands after the external value area; compute offsets in
    # two passes (first pass sizes ext for every non-offset tag)
    tmp_ext_len = 0
    for tag, typ, cnt, vals in tag_list:
        if tag == _TAG_STRIP_OFFSETS:
            size = 4 * cnt
        else:
            size = _TYPE_SIZES[typ] * cnt
        if size > 4:
            tmp_ext_len += size
    data_off = ext_off + tmp_ext_len
    offs = []
    acc = data_off
    for s in strips:
        offs.append(acc)
        acc += len(s)

    body = bytearray()
    body += u16(len(tag_list))
    for tag, typ, cnt, vals in tag_list:
        if tag == _TAG_STRIP_OFFSETS:
            vals = offs
        body += u16(tag) + u16(typ) + u32(cnt)
        body += value_field(typ, cnt, vals)
    body += u32(0)  # next IFD

    hdr = (b"II" + b"\x2a\x00" if bo == "little" else b"MM" + b"\x00\x2a") + u32(8)
    out = bytearray(hdr)
    out += body
    out += ext
    assert len(out) == data_off, (len(out), data_off)
    for s in strips:
        out += s
    return bytes(out)
