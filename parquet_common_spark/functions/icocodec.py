"""ICO (Windows icon) container codec — pure numpy, spec-transcribed.

The remaining still-image CONTAINER after PNG/JPEG/GIF/TIFF/BMP: favicon
and asset archives are full of it, and its quirks are classic interop
traps.  An ICO is an ICONDIR + ICONDIRENTRY table; each entry's payload
is EITHER a complete PNG stream (Vista+ for 256px icons) OR a
BITMAPINFOHEADER DIB with three deliberate deviations from a .bmp file:

  * no BITMAPFILEHEADER;
  * ``biHeight`` is DOUBLED — the payload stacks the XOR (color) image
    and a 1-bit AND (transparency) mask, both bottom-up;
  * width/height bytes in the directory encode 256 as 0.

Decode envelope: PNG entries (delegated to the PNG codec), DIB entries
at 32-bit BGRA (alpha honored; the AND mask is still applied — a set
mask bit forces a transparent pixel, matching rasterizer behavior for
legacy icons with garbage alpha of 0 everywhere: if EVERY alpha byte is
0 the channel is treated as unused, per the documented Windows
heuristic), 24-bit BGR + mask, and 8/4/1-bit palette + mask.  Encode
envelope: 32-bit DIB entries (mask derived from alpha) and PNG entries.
Returns RGBA throughout.

Out of envelope (explicit ValueError guards): CUR cursor files
(type 2), BI_RLE-compressed DIB entries (never produced by encoders in
practice).
"""

from __future__ import annotations

import struct

import numpy as np

from parquet_common_spark.functions.bmpcodec import _INFO_HDR, _stride

_ICONDIR = struct.Struct("<HHH")
_ENTRY = struct.Struct("<BBBBHHII")
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _err(msg: str) -> ValueError:
    return ValueError(f"ICO: {msg}")


def ico_entries(data: bytes) -> list[dict]:
    """Parse the icon directory: one dict per image entry."""
    if len(data) < _ICONDIR.size:
        raise _err("truncated header")
    reserved, ftype, count = _ICONDIR.unpack_from(data, 0)
    if reserved != 0 or ftype not in (1, 2):
        raise _err("bad magic")
    if ftype == 2:
        raise _err("CUR cursor files not supported")
    out = []
    for i in range(count):
        off = _ICONDIR.size + i * _ENTRY.size
        if off + _ENTRY.size > len(data):
            raise _err("directory truncated")
        w, h, ncol, _res, planes, bits, size, img_off = _ENTRY.unpack_from(
            data, off
        )
        if img_off + size > len(data):
            raise _err("entry payload truncated")
        out.append(
            {
                "width": w or 256,
                "height": h or 256,
                "n_colors": ncol,
                "planes": planes,
                "bits": bits,
                "size": size,
                "offset": img_off,
                "is_png": data[img_off : img_off + 8] == _PNG_SIG,
            }
        )
    return out


def decode_ico(data: bytes, index: int = 0) -> np.ndarray:
    """Decode entry ``index`` to an (H, W, 4) uint8 RGBA array."""
    entries = ico_entries(data)
    if not 0 <= index < len(entries):
        raise _err(f"entry {index} out of range ({len(entries)} entries)")
    e = entries[index]
    payload = data[e["offset"] : e["offset"] + e["size"]]
    if e["is_png"]:
        from parquet_common_spark.functions import mediacodec as MC

        _w, _h, px = MC.decode_png(payload)
        if px.dtype == np.uint16:
            # 16-bit PNG entry: scale to 8-bit (>> 8), not truncate mod 256
            px = (px >> 8).astype(np.uint8)
        if px.ndim == 2:
            px = px[:, :, None]
        if px.shape[2] == 1:  # grey -> RGBA
            px = np.repeat(px, 3, axis=2)
        if px.shape[2] == 2:  # grey+alpha
            px = np.concatenate([np.repeat(px[:, :, :1], 3, axis=2), px[:, :, 1:]], axis=2)
        if px.shape[2] == 3:
            px = np.concatenate(
                [px, np.full(px.shape[:2] + (1,), 255, np.uint8)], axis=2
            )
        return px.astype(np.uint8)
    return _decode_dib_entry(payload)


def _decode_dib_entry(p: bytes) -> np.ndarray:
    if len(p) < _INFO_HDR.size:
        raise _err("DIB header truncated")
    (
        hsize,
        width,
        height2,
        planes,
        bits,
        compression,
        _imgsize,
        _x,
        _y,
        clr_used,
        _imp,
    ) = _INFO_HDR.unpack_from(p, 0)
    if compression != 0:
        raise _err(f"compressed DIB entries (BI_{compression}) not supported")
    if height2 % 2 != 0:
        raise _err("DIB height must be 2x (XOR + AND mask)")
    height = height2 // 2
    pos = hsize
    pal = None
    if bits <= 8:
        n_colors = clr_used or (1 << bits)
        raw = np.frombuffer(p, np.uint8, n_colors * 4, pos).reshape(-1, 4)
        pal = raw[:, [2, 1, 0]].copy()
        pos += n_colors * 4

    xor_stride = _stride(width, bits)
    xor_bytes = xor_stride * height
    if pos + xor_bytes > len(p):
        raise _err("XOR image truncated")
    rows = np.frombuffer(p, np.uint8, xor_bytes, pos).reshape(height, xor_stride)
    pos += xor_bytes

    alpha = None
    if bits == 32:
        px = rows[:, : width * 4].reshape(height, width, 4)
        rgb = px[:, :, [2, 1, 0]]
        alpha = px[:, :, 3]
        if not alpha.any():  # all-zero alpha => legacy unused channel
            alpha = None
    elif bits == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        rgb = px[:, :, ::-1]
    elif bits in (1, 4, 8):
        if bits == 8:
            idx = rows[:, :width]
        elif bits == 4:
            inter = np.empty((height, xor_stride * 2), np.uint8)
            inter[:, 0::2] = rows >> 4
            inter[:, 1::2] = rows & 0x0F
            idx = inter[:, :width]
        else:
            idx = np.unpackbits(rows, axis=1)[:, :width]
        if int(idx.max(initial=0)) >= len(pal):
            raise _err("palette index out of range")
        rgb = pal[idx]
    else:
        raise _err(f"DIB bit depth {bits} not supported")

    mask_stride = _stride(width, 1)
    mask_bytes = mask_stride * height
    if pos + mask_bytes > len(p):
        raise _err("AND mask truncated")
    mrows = np.frombuffer(p, np.uint8, mask_bytes, pos).reshape(
        height, mask_stride
    )
    mask = np.unpackbits(mrows, axis=1)[:, :width]  # 1 = transparent

    if alpha is None:
        alpha = np.where(mask == 1, 0, 255).astype(np.uint8)
    else:
        alpha = np.where(mask == 1, 0, alpha).astype(np.uint8)
    out = np.concatenate([rgb, alpha[:, :, None]], axis=2)
    return np.ascontiguousarray(out[::-1])  # bottom-up -> display order


def encode_ico(images: list[np.ndarray], as_png: list[bool] | None = None) -> bytes:
    """Encode (H, W, 4) RGBA arrays as a multi-entry ICO.  ``as_png[i]``
    selects a PNG payload for entry i (default: all DIB 32-bit)."""
    if not images:
        raise _err("no images")
    if as_png is None:
        as_png = [False] * len(images)
    payloads = []
    for img, png in zip(images, as_png):
        if img.ndim != 3 or img.shape[2] != 4:
            raise _err("encode needs (H, W, 4) RGBA")
        h, w = img.shape[:2]
        if w > 256 or h > 256:
            raise _err("entries larger than 256px not supported")
        if png:
            from parquet_common_spark.functions import mediacodec as MC

            payloads.append(MC.encode_png(img))
            continue
        stored = img[::-1]  # bottom-up
        xor_stride = _stride(w, 32)
        rows = np.zeros((h, xor_stride), np.uint8)
        bgra = stored[:, :, [2, 1, 0, 3]]
        rows[:, : w * 4] = bgra.reshape(h, w * 4)
        mask_bits = (stored[:, :, 3] == 0).astype(np.uint8)  # 1 = transparent
        mask_stride = _stride(w, 1)
        packed = np.packbits(mask_bits, axis=1)
        mrows = np.zeros((h, mask_stride), np.uint8)
        mrows[:, : packed.shape[1]] = packed
        info = _INFO_HDR.pack(
            40, w, h * 2, 1, 32, 0, rows.nbytes + mrows.nbytes, 2835, 2835, 0, 0
        )
        payloads.append(info + rows.tobytes() + mrows.tobytes())

    header = _ICONDIR.pack(0, 1, len(images))
    dir_size = _ICONDIR.size + _ENTRY.size * len(images)
    entries = b""
    offset = dir_size
    for img, payload in zip(images, payloads):
        h, w = img.shape[:2]
        entries += _ENTRY.pack(
            w % 256, h % 256, 0, 0, 1, 32, len(payload), offset
        )
        offset += len(payload)
    return header + entries + b"".join(payloads)
