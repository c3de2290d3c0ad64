"""BMP (Windows DIB) codec — pure numpy, spec-transcribed.

Implements the BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte) container
from the public Windows GDI documentation: the format every scanner,
screenshot tool, and legacy archive emits, and the remaining mainstream
still-image container after PNG/JPEG/GIF/TIFF (all already in the
envelope — functions/{pngcodec via mediacodec,jpegcodec,gifcodec,
tiffcodec}).

Decode envelope:
  * 1/4/8-bit palette images, BI_RGB (uncompressed)
  * 4-bit BI_RLE4 and 8-bit BI_RLE8 run-length encodings, including
    absolute mode, end-of-line (0,0), end-of-bitmap (0,1) and delta
    (0,2,dx,dy) escapes — pixels skipped by EOL/delta keep palette
    index 0 (the spec leaves them undefined; index 0 is the common
    rasterizer behavior and is what the encoder round-trips)
  * 16-bit BI_RGB (X1R5G5B5), 24-bit and 32-bit BI_RGB (BGR/BGRX)
  * bottom-up (positive biHeight) and top-down (negative) row orders

Encode envelope: 24-bit BI_RGB, 8-bit palette BI_RGB / BI_RLE8, 4-bit
and 1-bit palette BI_RGB, either row order.  The RLE8 encoder emits
literal runs + EOL/EOB escapes (never delta), so every encoded stream
is decodable by any conforming reader.

Out of envelope (explicit guards, same posture as JPEG's rare modes):
BI_BITFIELDS/BI_JPEG/BI_PNG compressions and OS/2 BITMAPCOREHEADER.

Rows are padded to 4-byte boundaries throughout (the DIB stride rule).
All scanline work is vectorized; the only Python loops are over RLE
RUNS (bounded by the compressed byte count, not pixels).
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")
_INFO_HDR = struct.Struct("<IiiHHIIiiII")

BI_RGB, BI_RLE8, BI_RLE4 = 0, 1, 2


def _stride(width: int, bits: int) -> int:
    return ((width * bits + 31) // 32) * 4


def _err(msg: str) -> ValueError:
    return ValueError(f"BMP: {msg}")


def bmp_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, bits) from the headers alone — no pixel work."""
    if len(data) < _FILE_HDR.size + _INFO_HDR.size:
        raise _err("truncated header")
    if data[:2] != b"BM":
        raise _err("bad magic")
    _, width, height, _, bits, *_ = _INFO_HDR.unpack_from(data, _FILE_HDR.size)
    return width, abs(height), bits


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a BMP byte stream to an (H, W, 3) uint8 RGB array."""
    if len(data) < _FILE_HDR.size + _INFO_HDR.size:
        raise _err("truncated header")
    magic, _fsize, _r1, _r2, offset = _FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise _err("bad magic")
    (
        hsize,
        width,
        height,
        planes,
        bits,
        compression,
        _imgsize,
        _xppm,
        _yppm,
        clr_used,
        _clr_imp,
    ) = _INFO_HDR.unpack_from(data, _FILE_HDR.size)
    if hsize < 40:
        raise _err("OS/2 BITMAPCOREHEADER not supported")
    if planes != 1:
        raise _err(f"planes={planes}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise _err(f"bad dimensions {width}x{height}")
    if compression not in (BI_RGB, BI_RLE8, BI_RLE4):
        raise _err(f"compression {compression} not supported")

    # palette sits right after the (possibly extended) info header
    pal = None
    if bits <= 8:
        n_colors = clr_used or (1 << bits)
        ppos = _FILE_HDR.size + hsize
        raw = np.frombuffer(data, np.uint8, n_colors * 4, ppos).reshape(-1, 4)
        pal = raw[:, [2, 1, 0]].copy()  # BGRX -> RGB

    if compression == BI_RGB:
        idx_or_rgb = _decode_raster(data, offset, width, height, bits)
    else:
        if (compression == BI_RLE8) != (bits == 8):
            raise _err("RLE8 requires 8-bit")
        if compression == BI_RLE4 and bits != 4:
            raise _err("RLE4 requires 4-bit")
        idx_or_rgb = _decode_rle(
            data, offset, width, height, nibble=(compression == BI_RLE4)
        )
    if not top_down:
        idx_or_rgb = idx_or_rgb[::-1]
    if pal is not None:
        if int(idx_or_rgb.max(initial=0)) >= len(pal):
            raise _err("palette index out of range")
        return pal[idx_or_rgb]
    return np.ascontiguousarray(idx_or_rgb)


def _decode_raster(
    data: bytes, offset: int, width: int, height: int, bits: int
) -> np.ndarray:
    stride = _stride(width, bits)
    need = offset + stride * height
    if len(data) < need:
        raise _err("pixel data truncated")
    rows = np.frombuffer(data, np.uint8, stride * height, offset).reshape(
        height, stride
    )
    if bits == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        return px[:, :, ::-1]  # BGR -> RGB
    if bits == 32:
        px = rows[:, : width * 4].reshape(height, width, 4)
        return px[:, :, [2, 1, 0]]
    if bits == 16:
        v = rows[: , : width * 2].reshape(height, width, 2)
        v16 = v[:, :, 0].astype(np.uint16) | (v[:, :, 1].astype(np.uint16) << 8)
        r = ((v16 >> 10) & 31).astype(np.uint8)
        g = ((v16 >> 5) & 31).astype(np.uint8)
        b = (v16 & 31).astype(np.uint8)
        # 5-bit -> 8-bit expansion (replicate high bits)
        out = np.stack([r, g, b], axis=-1)
        return ((out << 3) | (out >> 2)).astype(np.uint8)
    if bits == 8:
        return rows[:, :width].copy()
    if bits == 4:
        hi = rows >> 4
        lo = rows & 0x0F
        inter = np.empty((height, stride * 2), np.uint8)
        inter[:, 0::2] = hi
        inter[:, 1::2] = lo
        return inter[:, :width].copy()
    if bits == 1:
        expanded = np.unpackbits(rows, axis=1)
        return expanded[:, :width].copy()
    raise _err(f"bit depth {bits} not supported")


def _decode_rle(
    data: bytes, offset: int, width: int, height: int, nibble: bool
) -> np.ndarray:
    """RLE8/RLE4 decode in TOP-DOWN index space (caller flips for
    bottom-up).  The DIB stream itself always runs bottom-up; we fill
    a bottom-up grid then return it unflipped so the caller's single
    flip handles both orders uniformly."""
    out = np.zeros((height, width), np.uint8)  # skipped pixels -> index 0
    pos, x, y = offset, 0, 0  # y counts bottom-up rows
    n = len(data)
    while True:
        if pos + 2 > n:
            raise _err("RLE stream truncated")
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count > 0:  # encoded run
            if y >= height:
                raise _err("RLE run outside bitmap")
            end = min(x + count, width)
            if nibble:
                pair = np.array([val >> 4, val & 0x0F], np.uint8)
                run = np.tile(pair, (count + 1) // 2)[: end - x]
            else:
                run = np.full(end - x, val, np.uint8)
            out[y, x:end] = run
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 2 > n:
                raise _err("RLE delta truncated")
            x = min(x + data[pos], width)
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val literal pixels, padded to even bytes
            cnt = val
            if nibble:
                nbytes = (cnt + 1) // 2
                chunk = np.frombuffer(data, np.uint8, nbytes, pos)
                lits = np.empty(nbytes * 2, np.uint8)
                lits[0::2] = chunk >> 4
                lits[1::2] = chunk & 0x0F
                lits = lits[:cnt]
                pos += (nbytes + 1) & ~1  # pad to WORD
            else:
                lits = np.frombuffer(data, np.uint8, cnt, pos)
                pos += (cnt + 1) & ~1
            if y >= height:
                raise _err("RLE absolute outside bitmap")
            end = min(x + cnt, width)
            out[y, x:end] = lits[: end - x]
            x = end
    # stream y runs over stored (bottom-up) rows; grid already stored
    # bottom-to-top, i.e. row 0 of `out` is the BOTTOM scanline.  The
    # caller flips for bottom-up files, so return as the raster order
    # _decode_raster uses (row 0 = first stored row).
    return out


def _rle8_encode_row(row: np.ndarray) -> bytes:
    """One scanline as RLE8 encoded runs (no absolute mode, no delta:
    maximally portable output), WITHOUT the EOL escape."""
    out = bytearray()
    i, w = 0, len(row)
    vals = row.tolist()
    while i < w:
        v = vals[i]
        j = i + 1
        while j < w and vals[j] == v and j - i < 255:
            j += 1
        out += bytes((j - i, v))
        i = j
    return bytes(out)


def encode_bmp(
    img: np.ndarray,
    bits: int = 24,
    palette: np.ndarray | None = None,
    rle: bool = False,
    top_down: bool = False,
) -> bytes:
    """Encode to BMP.  ``bits=24`` takes an (H, W, 3) RGB array;
    ``bits in (1, 4, 8)`` take an (H, W) index array + an (N, 3) RGB
    ``palette``.  ``rle`` selects BI_RLE8 (8-bit only).

    RLE bitmaps are bottom-up by spec (a negative biHeight is only
    valid for BI_RGB/BI_BITFIELDS), so ``rle=True`` stores the rows
    bottom-up regardless of ``top_down`` — the decoded image is
    identical either way; only the on-disk row order differs."""
    if bits == 24:
        if img.ndim != 3 or img.shape[2] != 3:
            raise _err("24-bit encode needs (H, W, 3)")
        if rle:
            raise _err("RLE is palette-only")
    elif bits in (1, 4, 8):
        if img.ndim != 2:
            raise _err("palette encode needs (H, W) indices")
        if palette is None:
            raise _err("palette required")
        if rle and bits != 8:
            raise _err("only RLE8 encode supported")
        if int(img.max(initial=0)) >= (1 << bits):
            raise _err("index exceeds bit depth")
    else:
        raise _err(f"encode bits={bits} unsupported")

    h, w = img.shape[:2]
    if rle:
        top_down = False  # RLE must be bottom-up per the DIB spec
    stored = img if top_down else img[::-1]
    pal_bytes = b""
    n_colors = 0
    if bits != 24:
        n_colors = len(palette)
        pal = np.zeros((n_colors, 4), np.uint8)
        pal[:, :3] = np.asarray(palette, np.uint8)[:, ::-1]  # RGB -> BGRX
        pal_bytes = pal.tobytes()

    if rle:
        body = bytearray()
        for r in range(h):
            body += _rle8_encode_row(stored[r])
            body += b"\x00\x00"  # EOL
        body = bytes(body[:-2]) + b"\x00\x01"  # final EOL -> EOB
        compression = BI_RLE8
    else:
        stride = _stride(w, bits)
        rows = np.zeros((h, stride), np.uint8)
        if bits == 24:
            rows[:, : w * 3] = stored[:, :, ::-1].reshape(h, w * 3)
        elif bits == 8:
            rows[:, :w] = stored
        elif bits == 4:
            padded = np.zeros((h, (w + 1) & ~1), np.uint8)
            padded[:, :w] = stored
            rows[:, : padded.shape[1] // 2] = (
                (padded[:, 0::2] << 4) | padded[:, 1::2]
            )
        else:  # 1-bit
            packed = np.packbits(stored, axis=1)
            rows[:, : packed.shape[1]] = packed
        body = rows.tobytes()
        compression = BI_RGB

    offset = _FILE_HDR.size + _INFO_HDR.size + len(pal_bytes)
    info = _INFO_HDR.pack(
        40,
        w,
        -h if top_down else h,
        1,
        bits,
        compression,
        len(body),
        2835,
        2835,
        n_colors,
        0,
    )
    fhdr = _FILE_HDR.pack(b"BM", offset + len(body), 0, 0, offset)
    return fhdr + info + pal_bytes + body
