"""GIF87a/GIF89a codec (LZW, interlace, multi-frame compositing).

Completes the lossless-image envelope next to PNG (mediacodec.py) and
lossless JPEG (jpeglossless.py): GIF is the remaining mainstream
lossless raster format a web-scraped image corpus actually contains
(icons, diagrams, animated memes).  Implemented from the public
GIF89a specification (CompuServe, 1990) and ITU/IETF-documented LZW:

* variable-width LZW (3..12 bit codes, CLEAR/EOI, deferred-clear
  tolerated on decode, table capped at 4096 entries),
* global + local color tables, interlaced row ordering (4-pass),
* Graphic Control Extensions: transparency index and disposal
  methods 0/1 (none), 2 (restore background), 3 (restore previous),
* multi-frame animation composited onto the logical screen.

Like the PNG/FLAC/JPEG modules this is a PURE deterministic codec
with no external dependency; the encoder exists so tests and the
mm8 registry entry can round-trip REAL bitstreams (GIF is lossless,
so decode(encode(px)) == px exactly and a pixel checksum has a
closed-form DuckDB oracle).  The per-symbol LZW inner loops are pure
Python; like FLAC's Rice loop before its C kernel, the swap point is
documented (a table-driven numpy batch decoder) if GIF ever lands on
a hot path — frames here are small metadata-scale assets, not the
training payload itself.

Scale shape: all entry points are per-payload functions invoked from
Arrow ``mapInPandas`` batches over a binary column — embarrassingly
parallel, no shuffle, no driver involvement (same posture as
mediacodec.decode_png / flaccodec.flac_samples).

Reference parity note: the reference repo has no media surface at all
(see README roadmap); this module is part of the training-data
pipeline extension the build plan mandates.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# --------------------------------------------------------------- LZW


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """Decode GIF-variant LZW to exactly ``n_pixels`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # table[i] = bytes of indices; base entries are single indices
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = clear + 2
    out = bytearray()
    acc = 0
    nbits = 0
    prev: int | None = None
    pos = 0
    n = len(data)
    while pos < n or nbits >= width:
        while nbits < width:
            if pos >= n:
                # truncated stream: tolerate if we already have all pixels
                if len(out) >= n_pixels:
                    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
                raise ValueError("GIF: LZW bitstream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            next_code = clear + 2
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:  # first code after (implicit) clear must be a literal
                raise ValueError("GIF: bad first LZW code")
            out += table[code]
            prev = code
            continue
        if code < next_code and code < len(table):
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]  # KwKwK
        else:
            raise ValueError("GIF: LZW code out of range")
        out += entry
        if next_code < 4096:
            table.append(table[prev] + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("GIF: LZW bitstream truncated")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """GIF-variant LZW encode of palette indices (matched to the
    canonical decoder above: width bump when the NEXT assignable code
    would not fit, clear emitted when the table fills at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    data = indices.astype(np.uint8).tobytes()
    prefix = b""
    for i in range(len(data)):
        k = data[i : i + 1]
        cand = prefix + k
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # decoder bumps when ITS next hits 1<<width; it lags the
            # encoder by one entry, so the encoder bumps at +1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([j]): j for j in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        prefix = k
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------ decode


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("GIF: color table truncated")
    tab = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3).copy()
    return tab, end


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF: sub-blocks truncated")
        size = data[pos]
        pos += 1
        if size == 0:
            break
        if pos + size > len(data):
            raise ValueError("GIF: sub-blocks truncated")
        chunks.append(data[pos : pos + size])
        pos += size
    return b"".join(chunks), pos


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def gif_frames(data: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode every frame of a GIF, composited onto the logical screen.

    Returns ``(frames, delays)`` where frames is ``(n, h, w, 3)`` uint8
    RGB and delays is the per-frame delay in centiseconds (0 when no
    Graphic Control Extension precedes the frame).  Disposal methods
    0/1 (leave), 2 (restore background) and 3 (restore previous) are
    honored; transparent pixels leave the underlying canvas visible.
    """
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("GIF: bad signature")
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    flags = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 0x07))

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    bg_rgb = canvas[0, 0].copy() if height and width else np.zeros(3, np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF: extension truncated")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                body, pos = _read_subblocks(data, pos)
                if len(body) >= 4:
                    packed = body[0]
                    disposal = (packed >> 2) & 0x07
                    delay = int.from_bytes(body[1:3], "little")
                    transparent = body[3] if packed & 0x01 else None
            else:  # comment / plain text / application: skip
                _body, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        # --- image descriptor
        if pos + 9 > len(data):
            raise ValueError("GIF: image descriptor truncated")
        left = int.from_bytes(data[pos : pos + 2], "little")
        top = int.from_bytes(data[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(data[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(data[pos + 6 : pos + 8], "little")
        iflags = data[pos + 8]
        pos += 9
        if left + fw > width or top + fh > height:
            raise ValueError("GIF: frame exceeds logical screen")
        lct = None
        if iflags & 0x80:
            lct, pos = _read_color_table(data, pos, 2 << (iflags & 0x07))
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF: frame has no color table")
        if pos >= len(data):
            raise ValueError("GIF: LZW header truncated")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError("GIF: bad LZW minimum code size")
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code_size, lzw, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF: pixel index outside color table")

        saved = canvas[top : top + fh, left : left + fw].copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        rgb = palette[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_rgb
        elif disposal == 3 and saved is not None:
            canvas[top : top + fh, left : left + fw] = saved
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return np.stack(frames), delays


def gif_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) without decoding pixel data... almost:
    frame COUNT requires walking the block structure (cheap — LZW
    payloads are skipped via their sub-block lengths, never decoded)."""
    if len(data) < 13 or data[:4] != b"GIF8":
        raise ValueError("GIF: bad signature")
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            _b, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        iflags = data[pos + 8]
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # LZW min code size
        _b, pos = _read_subblocks(data, pos)
        n_frames += 1
    return width, height, n_frames


# ------------------------------------------------------------ encode


def _write_subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    return idx[np.asarray(order, dtype=np.int64)]


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    *,
    delays: list[int] | None = None,
    interlace: bool = False,
    transparent_index: int | None = None,
    disposal: int = 1,
    bg_index: int = 0,
) -> bytes:
    """Encode ``(n, h, w)`` palette indices into a GIF89a bitstream.

    Every frame is full-canvas (the decoder supports sub-rect frames
    from foreign streams; the test encoder keeps the closed-form
    oracle simple).  ``palette`` is ``(k, 3)`` uint8 with k a power of
    two in 4..256.  Transparency/disposal/delay are per-file here —
    enough to exercise every decoder path under test.
    """
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    k = len(palette)
    if k & (k - 1) or not 4 <= k <= 256:
        raise ValueError("GIF: palette size must be a power of two in 4..256")
    if int(frames.max(initial=0)) >= k:
        raise ValueError("GIF: index outside palette")
    depth = max(2, k.bit_length() - 1)  # bits per index, >= 2 per spec
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out.append(0x80 | (depth - 1))  # GCT present, size 2**depth
    out.append(bg_index)
    out.append(0)  # pixel aspect ratio
    out += np.asarray(palette, dtype=np.uint8).tobytes()
    use_gce = delays is not None or transparent_index is not None or n > 1
    for f in range(n):
        if use_gce:
            packed = (disposal & 0x07) << 2
            if transparent_index is not None:
                packed |= 0x01
            delay = 0 if delays is None else int(delays[f])
            out += bytes([0x21, 0xF9, 0x04, packed])
            out += delay.to_bytes(2, "little")
            out.append(transparent_index if transparent_index is not None else 0)
            out.append(0)
        out.append(0x2C)
        out += (0).to_bytes(2, "little") * 2
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        idx = _interlace_rows(frames[f]) if interlace else frames[f]
        mcs = depth
        out.append(mcs)
        out += _write_subblocks(_lzw_encode(mcs, idx.reshape(-1)))
    out.append(0x3B)
    return bytes(out)
