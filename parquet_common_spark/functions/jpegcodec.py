"""JPEG (ITU T.81) codec — stdlib + numpy only.

Closes the "JPEG is geometry-only" slice of the multimodal layer: a
decoder covering BOTH baseline sequential (SOF0/1) and progressive
(SOF2 — spectral selection + successive approximation, EOB runs,
refinement correction bits, the T.81 G / libjpeg scan semantics) with
stream-defined Huffman tables, dequantize, batch numpy IDCT, chroma
upsampling and YCbCr->RGB; plus matching encoders used by the
round-trip tests (baseline: 4:4:4 or 4:2:0 with optional restart
markers; progressive: the libjpeg-shaped scan script).  The
progressive encoder transports the SAME quantized coefficients as the
baseline one, so decode(progressive) == decode(baseline) pixel-exactly
— the tests pin that identity, which any defect in the EOB-run /
correction-bit logic breaks.

Scale note: like decode_png, this is the per-payload kernel invoked
from Arrow `mapInPandas` batches (operators/multimodal.py) — the Spark
plumbing is map-only; the Python Huffman loop is the documented
swap-point for libjpeg-turbo/Pillow in a production image pipeline.

The IDCT/FDCT use the orthonormal 8x8 DCT-II matrix (A A^T = I), which
is exactly T.81 A.3.3's definition; tests pin orthogonality and the
O(N^4) direct formula independently of the codec.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np

# ---------------------------------------------------------- constants


def _zigzag() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in JPEG zigzag order, generated from the
    diagonal rule (d even: row decreasing; d odd: row increasing)."""
    out = []
    for d in range(15):
        rows = range(min(d, 7), max(0, d - 7) - 1, -1) if d % 2 == 0 else range(
            max(0, d - 7), min(d, 7) + 1
        )
        out.extend((r, d - r) for r in rows)
    return out


ZIGZAG = _zigzag()
ZIG_ROWS = np.array([r for r, _ in ZIGZAG])
ZIG_COLS = np.array([c for _, c in ZIGZAG])

# Annex K.1/K.2 quantization tables (luminance / chrominance)
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)


def dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: A[u, x] = 0.5 c(u) cos((2x+1)u pi/16),
    c(0) = 1/sqrt(2) — T.81's FDCT is coef = A @ block @ A.T and the
    IDCT is block = A.T @ coef @ A."""
    A = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return A


_DCT_A = dct_matrix()


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/Q below 50, else 200-2Q percent."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)


# ---------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy segment.

    A multi-byte integer accumulator so a whole bit-group is one shift
    and mask instead of a per-bit Python loop, and ``peek16`` exposes
    the next 16 bits (zero-padded past the end) for the table-driven
    Huffman decode.  Raising on exhaustion is preserved bit-exactly:
    a read only fails when it needs a bit beyond the real data."""

    def __init__(self, data: bytes):
        self.data = data
        self.end = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, n: int) -> None:
        data, pos, end = self.data, self.pos, self.end
        while self.nbits < n:
            if pos >= end:
                break
            self.acc = (self.acc << 8) | data[pos]
            pos += 1
            self.nbits += 8
        self.pos = pos

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
            if self.nbits < n:
                raise ValueError("JPEG: entropy data exhausted")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)



def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the `size`-bit magnitude code to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------- Huffman


class _HuffTable:
    """Canonical table from DHT (BITS counts + HUFFVAL symbols)."""

    def __init__(self, bits: list[int], values: list[int]):
        self.bits = bits
        self.values = values
        # mincode/maxcode per length (classic T.81 F.2.2.3 decode)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1
        # encode map symbol -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.enc[values[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        # peek-LUT decode (libjpeg-style): every left-justified
        # maxlen-bit pattern maps to (symbol << 5 | code length);
        # 0 marks an invalid prefix.  Sized to the table's actual
        # longest code so the build stays microseconds, decoded with
        # ONE list index per symbol instead of a per-bit Python loop.
        maxlen = max((i + 1 for i in range(16) if bits[i]), default=1)
        self.maxlen = maxlen
        lut = np.zeros(1 << maxlen, np.int32)
        code = 0
        k = 0
        for length in range(1, maxlen + 1):
            for _ in range(bits[length - 1]):
                lo = code << (maxlen - length)
                hi = (code + 1) << (maxlen - length)
                lut[lo:hi] = (values[k] << 5) | length
                code += 1
                k += 1
            code <<= 1
        self.lut_np = lut  # int32 form for the native (C) scan kernel
        self.lut = lut.tolist()

    def decode(self, br: _BitReader) -> int:
        maxlen = self.maxlen
        if br.nbits < maxlen:
            br._fill(maxlen)
            if br.nbits < maxlen:
                peek = (br.acc << (maxlen - br.nbits)) & ((1 << maxlen) - 1)
            else:
                peek = (br.acc >> (br.nbits - maxlen)) & ((1 << maxlen) - 1)
        else:
            peek = (br.acc >> (br.nbits - maxlen)) & ((1 << maxlen) - 1)
        entry = self.lut[peek]
        if entry == 0:
            raise ValueError("JPEG: invalid Huffman code")
        length = entry & 31
        if br.nbits < length:
            raise ValueError("JPEG: entropy data exhausted")
        br.nbits -= length
        br.acc &= (1 << br.nbits) - 1
        return entry >> 5


def _build_table(symbols: list[int]) -> _HuffTable:
    """A valid DHT-expressible table with every symbol at one length L,
    2^L > n so the all-ones code never occurs.  Suboptimal compression,
    fully standard decoding — the decoder exercises the same canonical
    path as any libjpeg stream."""
    syms = sorted(set(symbols)) or [0]
    n = len(syms)
    L = 1
    while (1 << L) <= n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    return _HuffTable(bits, syms)


# ---------------------------------------------------------- encoder


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) sample plane -> (n_blocks_y, n_blocks_x, 8, 8), edge-padded
    by replication to multiples of 8."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // 8, 8, pw // 8, 8).swapaxes(1, 2)


def _prepare_components(pixels: np.ndarray, quality: int, subsampling: str):
    """Shared encode front half: color transform, (optional) chroma
    subsampling, forward DCT, quantization.  Returns (grey, h, w, samp,
    qtables, comp_coefs) with comp_coefs[ci] a (by, bx, 64) zigzagged
    int array — the SAME coefficients whether transported baseline or
    progressive (the round-trip tests rely on this identity)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    grey = arr.ndim == 2 or arr.shape[2] == 1
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    h, w = arr.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if grey:
        planes = [arr.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # pad to even, 2x2 box mean
            def down(p):
                ph, pw = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
                q = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
                return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0

            planes = [y - 128.0, down(cb) - 128.0, down(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
    qtables = [_quality_scale(QUANT_LUMA, quality)]
    if not grey:
        qtables.append(_quality_scale(QUANT_CHROMA, quality))

    # forward DCT + quantize every block per component
    A = _DCT_A
    comp_coefs = []  # per component: (by, bx, 64) zigzagged ints
    for ci, plane in enumerate(planes):
        blocks = _component_blocks(plane)
        coefs = np.einsum("ux,abxy,vy->abuv", A, blocks, A)
        q = qtables[0 if ci == 0 else 1].astype(np.float64)
        quant = np.round(coefs / q).astype(np.int64)
        comp_coefs.append(quant[:, :, ZIG_ROWS, ZIG_COLS])
    return grey, h, w, samp, qtables, comp_coefs


def _jpeg_headers(grey, h, w, samp, qtables, sof_marker: int) -> bytearray:
    """SOI + APP0 + DQT + SOF — shared by baseline and progressive."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtables):
        body = bytes([ti]) + bytes(int(q[r, c]) for r, c in ZIGZAG)
        out += _seg(0xDB, body)
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _seg(sof_marker, sof)
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode HxW (grey) or HxWx3 (RGB) uint8 as baseline JFIF.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2 box
    mean, the common camera layout).  ``restart_interval`` > 0 inserts
    DRI/RSTn markers every that many MCUs (exercises the decoder's
    predictor-reset path)."""
    grey, h, w, samp, qtables, comp_coefs = _prepare_components(
        pixels, quality, subsampling
    )

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # gather the (dc_diff, ac) symbol stream per table class to build tables
    def mcu_blocks():
        """Yield (comp_idx, by, bx) in interleaved MCU order."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (sh, sv) in enumerate(samp):
                    for v in range(sv):
                        for u in range(sh):
                            yield ci, my * sv + v, mx * sh + u

    def block_at(ci, by, bx):
        cz = comp_coefs[ci]
        by = min(by, cz.shape[0] - 1)  # replicate edge blocks if MCU
        bx = min(bx, cz.shape[1] - 1)  # grid overhangs the plane
        return cz[by, bx]

    blocks_per_mcu = sum(sh * sv for sh, sv in samp)
    dc_syms: dict[int, list[int]] = {0: [], 1: []}
    ac_syms: dict[int, list[int]] = {0: [], 1: []}
    pred = [0] * len(comp_coefs)
    mcu_index = 0
    stream: list[tuple[int, list]] = []  # (table_class, tokens) per block
    for count, (ci, by, bx) in enumerate(mcu_blocks()):
        if count % blocks_per_mcu == 0:  # a new MCU starts here
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                pred = [0] * len(comp_coefs)
                stream.append((-1, [mcu_index // restart_interval - 1]))
            mcu_index += 1
        z = block_at(ci, by, bx)
        tc = 0 if ci == 0 else 1
        dc = int(z[0])
        diff = dc - pred[ci]
        pred[ci] = dc
        size = _size_cat(diff)
        dc_syms[tc].append(size)
        tokens = [("dc", size, diff)]
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if z[k] != 0:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(z[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms[tc].append(0xF0)
                tokens.append(("ac", 0xF0, 0, 0))
                run -= 16
            size = _size_cat(v)
            sym = (run << 4) | size
            ac_syms[tc].append(sym)
            tokens.append(("ac", sym, size, v))
            run = 0
        if last_nz < 63:
            ac_syms[tc].append(0x00)
            tokens.append(("ac", 0x00, 0, 0))
        stream.append((tc, tokens))

    n_classes = 1 if grey else 2
    dc_tabs = [_build_table(dc_syms[c]) for c in range(n_classes)]
    ac_tabs = [_build_table(ac_syms[c]) for c in range(n_classes)]

    bw = _BitWriter()
    entropy = bytearray()
    for tc, tokens in stream:
        if tc == -1:  # restart marker: flush + emit RSTn
            bw.flush()
            entropy.extend(bw.out)
            bw = _BitWriter()
            entropy.extend(bytes([0xFF, 0xD0 + (tokens[0] % 8)]))
            continue
        for tok in tokens:
            if tok[0] == "dc":
                _, size, diff = tok
                code, length = dc_tabs[tc].enc[size]
                bw.write(code, length)
                bw.write(_mag_bits(diff, size), size)
            else:
                _, sym, size, v = tok
                code, length = ac_tabs[tc].enc[sym]
                bw.write(code, length)
                if size:
                    bw.write(_mag_bits(v, size), size)
    bw.flush()
    entropy.extend(bw.out)

    # ---- markers
    out = _jpeg_headers(grey, h, w, samp, qtables, sof_marker=0xC0)
    ncomp = 1 if grey else 3
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, t in enumerate(tabs):
            body = bytes([(cls << 4) | ti]) + bytes(t.bits) + bytes(t.values)
            out += _seg(0xC4, body)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------ progressive encoder


def _emit_eobrun(bw, collect, eobrun: int, br_bits: list[int]) -> int:
    """Flush a pending EOB run (+ any buffered correction bits)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        sym = nbits << 4
        if collect is not None:
            collect.append(sym)
        else:
            code, length = bw[0].enc[sym]
            bw[1].write(code, length)
            if nbits:
                bw[1].write(eobrun - (1 << nbits), nbits)
    if collect is None:
        for bit in br_bits:
            bw[1].write(bit, 1)
    br_bits.clear()
    return 0


def _scan_blocks_prog(comp_order, comp_coefs, samp, w, h):
    """Block stream for a progressive scan, mirroring the decoder's
    _scan_units (444/grey: every component grid equals the MCU grid)."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    if len(comp_order) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in comp_order:
                    sh, sv = samp[ci]
                    for v in range(sv):
                        for u in range(sh):
                            cz = comp_coefs[ci]
                            by = min(my * sv + v, cz.shape[0] - 1)
                            bx = min(mx * sh + u, cz.shape[1] - 1)
                            yield ci, cz[by, bx]
    else:
        ci = comp_order[0]
        cz = comp_coefs[ci]
        for by in range(cz.shape[0]):
            for bx in range(cz.shape[1]):
                yield ci, cz[by, bx]


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode as PROGRESSIVE JFIF (SOF2) with a spectral-selection +
    successive-approximation scan script (the shape libjpeg's default
    progressive mode uses): DC first at Al=1, AC bands 1-5 / 6-63 at
    Al=2 per component, then DC and AC refinement scans down to Al=0.
    Transports the SAME quantized coefficients as :func:`encode_jpeg`,
    so decode(progressive) == decode(baseline) pixel-exactly — the
    round-trip tests pin that identity (4:4:4 and 4:2:0).  Huffman
    tables are emitted per scan (self-built, stream-defined)."""
    grey, h, w, samp, qtables, comp_coefs = _prepare_components(
        pixels, quality, subsampling
    )
    ncomp = 1 if grey else 3
    all_comps = list(range(ncomp))
    # (kind, comps, Ss, Se, Ah, Al)
    scans = [("dc_first", all_comps, 0, 0, 0, 1)]
    for ci in all_comps:
        scans.append(("ac_first", [ci], 1, 5, 0, 2))
        scans.append(("ac_first", [ci], 6, 63, 0, 2))
    scans.append(("dc_refine", all_comps, 0, 0, 1, 0))
    for ci in all_comps:
        scans.append(("ac_refine", [ci], 1, 63, 2, 1))
    for ci in all_comps:
        scans.append(("ac_refine", [ci], 1, 63, 1, 0))

    out = _jpeg_headers(grey, h, w, samp, qtables, sof_marker=0xC2)

    for kind, comp_order, Ss, Se, Ah, Al in scans:
        # pass 1 collects Huffman symbols; pass 2 emits bits
        table = None
        for phase in ("collect", "emit"):
            collect: list[int] | None = [] if phase == "collect" else None
            writer = _BitWriter() if phase == "emit" else None
            bw = (table, writer)
            pred = {ci: 0 for ci in comp_order}
            eobrun = 0
            br_bits: list[int] = []

            def emit_sym(sym, extra=0, nbits=0):
                if collect is not None:
                    collect.append(sym)
                else:
                    code, length = table.enc[sym]
                    writer.write(code, length)
                    if nbits:
                        writer.write(extra, nbits)

            for ci, z in _scan_blocks_prog(comp_order, comp_coefs, samp, w, h):
                if kind == "dc_first":
                    val = int(z[0]) >> Al  # DC point transform: arithmetic
                    diff = val - pred[ci]
                    pred[ci] = val
                    size = _size_cat(diff)
                    emit_sym(size, _mag_bits(diff, size), size)
                elif kind == "dc_refine":
                    if collect is None:
                        writer.write((int(z[0]) >> Al) & 1, 1)
                elif kind == "ac_first":
                    k = Ss
                    r = 0
                    while k <= Se:
                        v = int(z[k])
                        # AC point transform: magnitude shift toward zero
                        t = -((-v) >> Al) if v < 0 else v >> Al
                        if t == 0:
                            r += 1
                        else:
                            eobrun = _emit_eobrun(bw, collect, eobrun, br_bits)
                            while r > 15:
                                emit_sym(0xF0)
                                r -= 16
                            size = _size_cat(t)
                            emit_sym((r << 4) | size, _mag_bits(t, size), size)
                            r = 0
                        k += 1
                    if r > 0:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            eobrun = _emit_eobrun(bw, collect, eobrun, br_bits)
                else:  # ac_refine
                    p1 = 1 << Al
                    absv = []
                    eob_idx = Ss - 1  # last newly-significant index
                    for k in range(Ss, Se + 1):
                        v = int(z[k])
                        t = (-v if v < 0 else v) >> Al
                        absv.append(t)
                        if t == 1:
                            eob_idx = k
                    r = 0
                    pending: list[int] = []  # correction bits of this block
                    for k in range(Ss, Se + 1):
                        t = absv[k - Ss]
                        if t == 0:
                            r += 1
                            continue
                        # ZRLs are needed BEFORE deciding correction vs
                        # newly-significant (libjpeg jcphuff: past the
                        # last new significant, runs fold into the EOB)
                        while r > 15 and k <= eob_idx:
                            eobrun = _emit_eobrun(bw, collect, eobrun, br_bits)
                            emit_sym(0xF0)
                            if collect is None:
                                for bit in pending:
                                    writer.write(bit, 1)
                            pending.clear()
                            r -= 16
                        if t > 1:
                            # already significant: buffer a correction bit
                            pending.append(t & 1)
                            continue
                        # newly significant (t == 1)
                        eobrun = _emit_eobrun(bw, collect, eobrun, br_bits)
                        emit_sym((r << 4) | 1)
                        if collect is None:
                            writer.write(1 if int(z[k]) >= 0 else 0, 1)
                            for bit in pending:
                                writer.write(bit, 1)
                        pending.clear()
                        r = 0
                    if r > 0 or pending:
                        eobrun += 1
                        br_bits.extend(pending)
                        if eobrun == 0x7FFF or len(br_bits) > 900:
                            eobrun = _emit_eobrun(bw, collect, eobrun, br_bits)
            # end of scan: flush any pending EOB run
            if kind in ("ac_first", "ac_refine"):
                eobrun = _emit_eobrun(bw, collect, eobrun, br_bits)
            if phase == "collect":
                table = _build_table(collect) if collect else None
            else:
                writer.flush()
                # DHT (when the scan uses Huffman symbols) + SOS + data
                needs_table = kind != "dc_refine"
                cls = 0 if kind.startswith("dc") else 1
                if needs_table and table is not None:
                    body = (
                        bytes([(cls << 4) | 0])
                        + bytes(table.bits)
                        + bytes(table.values)
                    )
                    out += _seg(0xC4, body)
                sos = bytes([len(comp_order)])
                for ci in comp_order:
                    sos += bytes([ci + 1, 0])  # table 0 for both classes
                sos += bytes([Ss, Se, (Ah << 4) | Al])
                out += _seg(0xDA, sos)
                out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------- decoder


def _read_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff an entropy-coded segment: returns (segments split at
    RSTn markers, position of the next real marker).

    Vectorized: 0xFF positions come from ONE numpy scan and the Python
    loop only visits those (~1/256 of bytes + stuffing), slice-copying
    the runs between them — the old per-byte bytearray walk was ~20 %
    of decode wall time.  Semantics preserved exactly: FF00 unstuffs
    to FF, RSTn splits, any other FF-marker (including FF as the
    stream's final byte, which stays data) ends the scan at the FF."""
    n = len(data)
    ffs = np.nonzero(np.frombuffer(data, np.uint8)[start:] == 0xFF)[0]
    segments: list[bytes] = []
    parts: list[bytes] = []
    p = start
    for q in (int(i) + start for i in ffs):
        if q < p:
            continue  # inside a consumed FFxx pair
        if q + 1 >= n:
            break  # trailing FF with no marker byte: stays data
        nxt = data[q + 1]
        if nxt == 0x00:
            parts.append(data[p : q + 1])  # keep the FF, drop the stuffing
            p = q + 2
        elif 0xD0 <= nxt <= 0xD7:
            parts.append(data[p:q])
            segments.append(b"".join(parts))
            parts = []
            p = q + 2
        else:
            parts.append(data[p:q])
            segments.append(b"".join(parts))
            return segments, q
    parts.append(data[p:n])
    segments.append(b"".join(parts))
    return segments, n


def _ac_first_block(z, br, ac_tab, Ss, Se, Al, eobrun):
    """AC coefficients of ONE block in a first (Ah=0) scan — also the
    baseline AC path (Ss=1, Se=63, Al=0; EOB == an EOBRUN of 1)."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        sym = ac_tab.decode(br)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > Se:
            raise ValueError("JPEG: AC coefficient overflow")
        v = br.read_bits(s)  # inline EXTEND (s > 0 here): hot path
        z[k] = (v if v >= (1 << (s - 1)) else v - (1 << s) + 1) << Al
        k += 1
    return eobrun


def _ac_refine_block(z, br, ac_tab, Ss, Se, Al, eobrun):
    """AC successive-approximation refinement of ONE block (T.81
    G.1.2.3; the libjpeg decode_mcu_AC_refine structure): correction
    bits ride on already-nonzero coefficients, (run, 1) symbols place
    newly-significant ones, EOB runs cover whole blocks whose remaining
    band has corrections only."""
    p1 = 1 << Al
    m1 = -p1
    k = Ss
    if eobrun == 0:
        while k <= Se:
            sym = ac_tab.decode(br)
            r, s = sym >> 4, sym & 0x0F
            sval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: skip 16 zero-HISTORY coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG: bad refinement symbol")
                sval = p1 if br.read_bit() else m1
            while k <= Se:
                if z[k] != 0:
                    if br.read_bit() and (z[k] & p1) == 0:
                        z[k] += p1 if z[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval and k <= Se:
                z[k] = sval
            k += 1
    if eobrun > 0:
        while k <= Se:
            if z[k] != 0:
                if br.read_bit() and (z[k] & p1) == 0:
                    z[k] += p1 if z[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _scan_units(scan_comps, mcus_x, mcus_y, width, height, hmax, vmax):
    """Entropy-coded units of a scan: lists of (comp, block_index).
    Interleaved (ns > 1): one unit per MCU with every component's h*v
    blocks.  Single-component: one unit per block of the COMPONENT's
    own grid (T.81 A.2.2), raster order."""
    if len(scan_comps) > 1:
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            unit = []
            for c in scan_comps:
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        by, bx = my * c["v"] + v, mx * c["h"] + u
                        unit.append((c, by * c["bw"] + bx))
            yield unit
    else:
        c = scan_comps[0]
        cw = -(-(width * c["h"]) // hmax)
        ch = -(-(height * c["v"]) // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        for by in range(nby):
            for bx in range(nbx):
                yield [(c, by * c["bw"] + bx)]


_BITMASK = tuple((1 << i) - 1 for i in range(64))

# ------------------------------------------------ native scan kernel

_NATIVE_LIB = None
_NATIVE_TRIED = False
_SCAN_ERRORS = {
    1: "JPEG: invalid Huffman code",
    2: "JPEG: entropy data exhausted",
    3: "JPEG: AC coefficient overflow",
    4: "JPEG: missing restart segment",
    5: "JPEG: bad refinement symbol",
    6: "JPEG: too many scan components",
}


def _native_kernel():
    """Lazily compile jpeg_scan_kernel.c (cc -O2 -shared, cached by
    source hash in the system temp dir) and load it via ctypes.
    Returns the library, or None when no compiler / load failure —
    callers fall back to the pure-Python tight loop.  This is the
    documented libjpeg-turbo swap point realized without an external
    dependency: the Huffman symbol walk is the one serial stage numpy
    cannot express."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    try:
        import ctypes
        import hashlib
        import shutil
        import subprocess
        import tempfile

        src = os.path.join(os.path.dirname(__file__), "jpeg_scan_kernel.c")
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(tempfile.gettempdir(), f"pcs_jpeg_scan_{digest}.so")
        if not os.path.exists(so):
            cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
            if cc is None:
                return None
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                [cc, "-O2", "-fPIC", "-shared", "-o", tmp, src],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)  # atomic: concurrent executors race safely
        lib = ctypes.CDLL(so)
        lib.decode_scan.restype = ctypes.c_int
        _NATIVE_LIB = lib
    except Exception:
        _NATIVE_LIB = None
    return _NATIVE_LIB


def _decode_scan_native(lib, segments, restart_interval, unit_blocks, states, Ss, Se, Ah, Al):
    """Marshal one scan to the C kernel.  ``states[ci]`` here carries
    numpy buffers: (coef int64 ndarray, dc_lut_np|None, dc_maxlen,
    ac_lut_np|None, ac_maxlen)."""
    import ctypes

    seg_data = b"".join(segments)
    seg_off = np.zeros(len(segments) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segments], out=seg_off[1:])
    n_units = len(unit_blocks)
    unit_off = np.zeros(n_units + 1, dtype=np.int32)
    np.cumsum([len(u) for u in unit_blocks], out=unit_off[1:])
    flat = [t for unit in unit_blocks for t in unit]
    blk_ci = np.array([t[0] for t in flat], dtype=np.int32)
    blk_base = np.array([t[1] for t in flat], dtype=np.int64)

    n = len(states)
    I32P = ctypes.POINTER(ctypes.c_int32)
    I64P = ctypes.POINTER(ctypes.c_int64)
    _empty32 = np.zeros(1, dtype=np.int32)
    coef_ptrs = (I64P * n)(*[s[0].ctypes.data_as(I64P) for s in states])
    dc_ptrs = (I32P * n)(
        *[(s[1] if s[1] is not None else _empty32).ctypes.data_as(I32P) for s in states]
    )
    ac_ptrs = (I32P * n)(
        *[(s[3] if s[3] is not None else _empty32).ctypes.data_as(I32P) for s in states]
    )
    dc_maxlens = np.array([s[2] for s in states], dtype=np.int32)
    ac_maxlens = np.array([s[4] for s in states], dtype=np.int32)

    rc = lib.decode_scan(
        ctypes.c_char_p(seg_data),
        seg_off.ctypes.data_as(I64P),
        ctypes.c_int(len(segments)),
        ctypes.c_int(restart_interval),
        unit_off.ctypes.data_as(I32P),
        ctypes.c_int(n_units),
        blk_ci.ctypes.data_as(I32P),
        blk_base.ctypes.data_as(I64P),
        ctypes.c_int(n),
        coef_ptrs,
        dc_ptrs,
        dc_maxlens.ctypes.data_as(I32P),
        ac_ptrs,
        ac_maxlens.ctypes.data_as(I32P),
        ctypes.c_int(Ss),
        ctypes.c_int(Se),
        ctypes.c_int(Ah),
        ctypes.c_int(Al),
    )
    if rc != 0:
        raise ValueError(_SCAN_ERRORS.get(rc, f"JPEG: scan kernel error {rc}"))


def _decode_scan_fast(segments, restart_interval, unit_blocks, states, Ss, Se, Ah, Al):
    """One entropy-coded scan, tight-loop form: the ``fast`` engine's
    replacement for the reference per-block functions
    (`_HuffTable.decode` / `_ac_first_block` / `_ac_refine_block`).

    Same algorithm, same error behavior, bit-identical output (pinned
    by test_fast_engine_matches_reference_*) — the speed comes purely
    from Python-level mechanics: the bit accumulator lives in local
    variables instead of a _BitReader object (no method calls or
    attribute traffic per symbol), Huffman LUTs are resolved once per
    scan instead of a dict lookup per block, and coefficients land in
    a flat Python list (ndarray scalar get/set is ~10x a list index).
    ~5x wall-clock on photographic 256x256 payloads; see PERF_NOTES.

    ``states[ci]`` = (coef_list, dc_lut, dc_maxlen, ac_lut, ac_maxlen);
    ``unit_blocks[ui]`` = [(ci, base_offset), ...] per entropy unit."""
    M = _BITMASK
    seg_idx = 0
    data = segments[0]
    end = len(data)
    pos = 0
    acc = 0
    nbits = 0
    npred = len(states)
    preds = [0] * npred
    eobrun = 0
    p1 = 1 << Al
    m1 = -p1
    k0 = Ss if Ss else 1
    do_dc = Ss == 0
    do_ac = Se >= k0
    dc_first = Ah == 0
    for ui, unit in enumerate(unit_blocks):
        if restart_interval and ui and ui % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG: missing restart segment")
            data = segments[seg_idx]
            end = len(data)
            pos = 0
            acc = 0
            nbits = 0
            preds = [0] * npred
            eobrun = 0
        for ci, base in unit:
            coef, dc_lut, dc_maxlen, ac_lut, ac_maxlen = states[ci]
            if do_dc:
                if dc_first:  # DC first (or baseline full)
                    if nbits < dc_maxlen:
                        while nbits < 56 and pos < end:
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            nbits += 8
                    if nbits < dc_maxlen:
                        peek = (acc << (dc_maxlen - nbits)) & M[dc_maxlen]
                    else:
                        peek = (acc >> (nbits - dc_maxlen)) & M[dc_maxlen]
                    entry = dc_lut[peek]
                    if entry == 0:
                        raise ValueError("JPEG: invalid Huffman code")
                    ln = entry & 31
                    if nbits < ln:
                        raise ValueError("JPEG: entropy data exhausted")
                    nbits -= ln
                    acc &= M[nbits]
                    size = entry >> 5
                    if size:
                        if nbits < size:
                            while nbits < 56 and pos < end:
                                acc = (acc << 8) | data[pos]
                                pos += 1
                                nbits += 8
                            if nbits < size:
                                raise ValueError("JPEG: entropy data exhausted")
                        nbits -= size
                        v = (acc >> nbits) & M[size]
                        acc &= M[nbits]
                        preds[ci] += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    coef[base] = preds[ci] << Al
                else:  # DC refinement: one raw bit
                    if nbits < 1:
                        while nbits < 56 and pos < end:
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            nbits += 8
                        if nbits < 1:
                            raise ValueError("JPEG: entropy data exhausted")
                    nbits -= 1
                    if (acc >> nbits) & 1:
                        coef[base] |= p1
                    acc &= M[nbits]
            if not do_ac:
                continue
            if Ah == 0:  # AC first scan (also the baseline AC path)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = k0
                while k <= Se:
                    if nbits < ac_maxlen:
                        while nbits < 56 and pos < end:
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            nbits += 8
                    if nbits < ac_maxlen:
                        peek = (acc << (ac_maxlen - nbits)) & M[ac_maxlen]
                    else:
                        peek = (acc >> (nbits - ac_maxlen)) & M[ac_maxlen]
                    entry = ac_lut[peek]
                    if entry == 0:
                        raise ValueError("JPEG: invalid Huffman code")
                    ln = entry & 31
                    if nbits < ln:
                        raise ValueError("JPEG: entropy data exhausted")
                    nbits -= ln
                    acc &= M[nbits]
                    sym = entry >> 5
                    r = sym >> 4
                    s = sym & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                if nbits < r:
                                    while nbits < 56 and pos < end:
                                        acc = (acc << 8) | data[pos]
                                        pos += 1
                                        nbits += 8
                                    if nbits < r:
                                        raise ValueError("JPEG: entropy data exhausted")
                                nbits -= r
                                eobrun += (acc >> nbits) & M[r]
                                acc &= M[nbits]
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > Se:
                        raise ValueError("JPEG: AC coefficient overflow")
                    if nbits < s:
                        while nbits < 56 and pos < end:
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            nbits += 8
                        if nbits < s:
                            raise ValueError("JPEG: entropy data exhausted")
                    nbits -= s
                    v = (acc >> nbits) & M[s]
                    acc &= M[nbits]
                    coef[base + k] = (v if v >= (1 << (s - 1)) else v - (1 << s) + 1) << Al
                    k += 1
            else:  # AC successive-approximation refinement
                k = Ss
                if eobrun == 0:
                    while k <= Se:
                        if nbits < ac_maxlen:
                            while nbits < 56 and pos < end:
                                acc = (acc << 8) | data[pos]
                                pos += 1
                                nbits += 8
                        if nbits < ac_maxlen:
                            peek = (acc << (ac_maxlen - nbits)) & M[ac_maxlen]
                        else:
                            peek = (acc >> (nbits - ac_maxlen)) & M[ac_maxlen]
                        entry = ac_lut[peek]
                        if entry == 0:
                            raise ValueError("JPEG: invalid Huffman code")
                        ln = entry & 31
                        if nbits < ln:
                            raise ValueError("JPEG: entropy data exhausted")
                        nbits -= ln
                        acc &= M[nbits]
                        sym = entry >> 5
                        r = sym >> 4
                        s = sym & 0x0F
                        sval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    if nbits < r:
                                        while nbits < 56 and pos < end:
                                            acc = (acc << 8) | data[pos]
                                            pos += 1
                                            nbits += 8
                                        if nbits < r:
                                            raise ValueError("JPEG: entropy data exhausted")
                                    nbits -= r
                                    eobrun += (acc >> nbits) & M[r]
                                    acc &= M[nbits]
                                break
                            # r == 15: skip 16 zero-HISTORY coefficients
                        else:
                            if s != 1:
                                raise ValueError("JPEG: bad refinement symbol")
                            if nbits < 1:
                                while nbits < 56 and pos < end:
                                    acc = (acc << 8) | data[pos]
                                    pos += 1
                                    nbits += 8
                                if nbits < 1:
                                    raise ValueError("JPEG: entropy data exhausted")
                            nbits -= 1
                            sval = p1 if (acc >> nbits) & 1 else m1
                            acc &= M[nbits]
                        while k <= Se:
                            zk = coef[base + k]
                            if zk != 0:
                                if nbits < 1:
                                    while nbits < 56 and pos < end:
                                        acc = (acc << 8) | data[pos]
                                        pos += 1
                                        nbits += 8
                                    if nbits < 1:
                                        raise ValueError("JPEG: entropy data exhausted")
                                nbits -= 1
                                bit = (acc >> nbits) & 1
                                acc &= M[nbits]
                                if bit and (zk & p1) == 0:
                                    coef[base + k] = zk + (p1 if zk >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if sval and k <= Se:
                            coef[base + k] = sval
                        k += 1
                if eobrun > 0:
                    while k <= Se:
                        zk = coef[base + k]
                        if zk != 0:
                            if nbits < 1:
                                while nbits < 56 and pos < end:
                                    acc = (acc << 8) | data[pos]
                                    pos += 1
                                    nbits += 8
                                if nbits < 1:
                                    raise ValueError("JPEG: entropy data exhausted")
                            nbits -= 1
                            bit = (acc >> nbits) & 1
                            acc &= M[nbits]
                            if bit and (zk & p1) == 0:
                                coef[base + k] = zk + (p1 if zk >= 0 else m1)
                        k += 1
                    eobrun -= 1


def decode_jpeg(data: bytes, engine: str = "auto") -> tuple[int, int, np.ndarray]:
    """Decode a baseline (SOF0/SOF1), progressive (SOF2), arithmetic
    (SOF9 sequential / SOF10 progressive, QM-coded —
    functions/jpegarith.py), or lossless (SOF3, predictive —
    functions/jpeglossless.py) JPEG to (width, height, HxWxC uint8) —
    C is 1 for greyscale, 3 (RGB) otherwise.  SOF3 with precision > 8
    exceeds the uint8 contract (use decode_jpeg_lossless directly);
    hierarchical modes raise NotImplementedError.  Arithmetic and
    lossless streams decode through their pure-Python engines
    regardless of ``engine``.

    ``engine`` selects the entropy-scan implementation — all three are
    pinned bit-identical on every stream in pytest:

    - ``"native"``: the lazily-compiled C kernel
      (jpeg_scan_kernel.c via ctypes) — raises RuntimeError when no C
      compiler is available;
    - ``"fast"``: the inlined pure-Python tight loop
      (:func:`_decode_scan_fast`) — always available;
    - ``"reference"``: the readable per-block structure
      (`_HuffTable.decode` / `_ac_*_block`) the others are pinned to;
    - ``"auto"`` (default): native when compilable, else fast."""
    lib = None
    if engine == "auto":
        lib = _native_kernel()
        engine = "native" if lib is not None else "fast"
    elif engine == "native":
        lib = _native_kernel()
        if lib is None:
            raise RuntimeError("JPEG native kernel unavailable (no C compiler)")
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    height = width = None
    restart_interval = 0
    progressive = False
    arith = False
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    saw_scan = False
    mcus_x = mcus_y = hmax = vmax = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec = body[b] >> 4
                tid = body[b] & 0x0F
                n = 64 * (2 if prec else 1)
                vals = body[b + 1 : b + 1 + n]
                tab = np.zeros((8, 8), dtype=np.int64)
                for k, (r, c) in enumerate(ZIGZAG):
                    tab[r, c] = (
                        struct.unpack(">H", vals[2 * k : 2 * k + 2])[0]
                        if prec
                        else vals[k]
                    )
                qt[tid] = tab
                b += 1 + n
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                cls = body[b] >> 4
                tid = body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                values = list(body[b + 17 : b + 17 + n])
                huff[(cls, tid)] = _HuffTable(bits, values)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF9/10 arithmetic
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                if arith or engine == "reference":
                    # arithmetic has a single (pure-Python) engine
                    c["zz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
                elif engine == "fast":
                    c["coef"] = [0] * (c["bh"] * c["bw"] * 64)
                else:
                    c["coef"] = np.zeros(c["bh"] * c["bw"] * 64, dtype=np.int64)
        elif marker == 0xC3:
            # LOSSLESS (SOF3): its own predictive pipeline — dispatch to
            # functions/jpeglossless.py.  decode_jpeg's uint8 contract
            # fits precision <= 8; higher precisions are served by
            # decode_jpeg_lossless directly (int32 output).
            from parquet_common_spark.functions.jpeglossless import (
                decode_jpeg_lossless,
            )

            prec = body[0]
            if prec > 8:
                raise NotImplementedError(
                    "JPEG SOF3 with precision > 8 does not fit the uint8 "
                    "contract — call jpeglossless.decode_jpeg_lossless"
                )
            h, w, arr = decode_jpeg_lossless(data)
            return w, h, arr.astype(np.uint8)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: hierarchical modes are "
                "unsupported (baseline, progressive, both arithmetic DCT "
                "modes, and lossless SOF3 only)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning tables
            b = 0
            while b + 1 < len(body):
                tc, tb = body[b] >> 4, body[b] & 0x0F
                if tc == 0:
                    dc_cond[tb] = (body[b + 1] & 0x0F, body[b + 1] >> 4)
                else:
                    ac_cond[tb] = body[b + 1]
                b += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — one scan's entropy data follows
            if not comps:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cid, tsel = body[1 + 2 * si], body[2 + 2 * si]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"] = tsel >> 4
                        comp["ta"] = tsel & 0x0F
                        scan_comps.append(comp)
            Ss, Se, AhAl = body[1 + 2 * ns : 4 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 0x0F
            if not progressive:
                Ss, Se, Ah, Al = 0, 63, 0, 0
            if arith:
                from parquet_common_spark.functions import jpegarith as JA

                segments, pos = JA.read_entropy_arith(data, pos + 2 + length)
                units = list(
                    _scan_units(
                        scan_comps, mcus_x, mcus_y, width, height, hmax, vmax
                    )
                )
                JA.decode_scan_arith(
                    segments, restart_interval, scan_comps, units,
                    dc_cond, ac_cond, Ss, Se, Ah, Al,
                )
                saw_scan = True
                continue
            segments, pos = _read_entropy(data, pos + 2 + length)
            if engine in ("fast", "native"):
                idx = {id(c): i for i, c in enumerate(scan_comps)}
                unit_blocks = [
                    [(idx[id(c)], b * 64) for (c, b) in unit]
                    for unit in _scan_units(
                        scan_comps, mcus_x, mcus_y, width, height, hmax, vmax
                    )
                ]
                # resolve tables once per scan; a missing NEEDED table
                # raises KeyError exactly like the reference path
                need_dc = Ss == 0 and Ah == 0
                need_ac = Se >= (Ss if Ss else 1)
                lut_attr = "lut" if engine == "fast" else "lut_np"
                states = [
                    (
                        c["coef"],
                        getattr(huff[(0, c["td"])], lut_attr) if need_dc else None,
                        huff[(0, c["td"])].maxlen if need_dc else 1,
                        getattr(huff[(1, c["ta"])], lut_attr) if need_ac else None,
                        huff[(1, c["ta"])].maxlen if need_ac else 1,
                    )
                    for c in scan_comps
                ]
                if engine == "fast":
                    _decode_scan_fast(
                        segments, restart_interval, unit_blocks, states, Ss, Se, Ah, Al
                    )
                else:
                    _decode_scan_native(
                        lib, segments, restart_interval, unit_blocks, states, Ss, Se, Ah, Al
                    )
                saw_scan = True
                continue
            seg_idx = 0
            br = _BitReader(segments[0])
            pred = {c["id"]: 0 for c in scan_comps}
            eobrun = 0
            for ui, unit in enumerate(
                _scan_units(scan_comps, mcus_x, mcus_y, width, height, hmax, vmax)
            ):
                if restart_interval and ui and ui % restart_interval == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("JPEG: missing restart segment")
                    br = _BitReader(segments[seg_idx])
                    pred = {c["id"]: 0 for c in scan_comps}
                    eobrun = 0
                for c, bidx in unit:
                    z = c["zz"][bidx]
                    if Ss == 0:
                        if Ah == 0:  # DC first (or baseline full)
                            dc_tab = huff[(0, c["td"])]
                            size = dc_tab.decode(br)
                            diff = _extend(br.read_bits(size), size)
                            pred[c["id"]] += diff
                            z[0] = pred[c["id"]] << Al
                        else:  # DC refinement: one raw bit
                            if br.read_bit():
                                z[0] |= 1 << Al
                    if Se >= max(Ss, 1):
                        ac_tab = huff[(1, c["ta"])]
                        if Ah == 0:
                            eobrun = _ac_first_block(
                                z, br, ac_tab, max(Ss, 1), Se, Al, eobrun
                            )
                        else:
                            eobrun = _ac_refine_block(
                                z, br, ac_tab, Ss, Se, Al, eobrun
                            )
            saw_scan = True
            continue  # pos already at the next marker
        pos += 2 + length
    if height is None or not saw_scan:
        raise ValueError("JPEG: missing SOF or SOS")
    if not arith and engine == "fast":
        for c in comps:
            c["zz"] = np.array(c["coef"], dtype=np.int64).reshape(-1, 64)
    elif not arith and engine == "native":
        for c in comps:
            c["zz"] = c["coef"].reshape(-1, 64)

    # dequantize + batch IDCT per component
    A = _DCT_A
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        coefs = np.zeros((c["zz"].shape[0], 8, 8), dtype=np.float64)
        coefs[:, ZIG_ROWS, ZIG_COLS] = c["zz"].astype(np.float64)
        coefs *= q[None, :, :]
        # == einsum("ux,nuv,vy->nxy", A, coefs, A) but BLAS-backed
        blocks = A.T @ coefs @ A
        plane = (
            blocks.reshape(c["bh"], c["bw"], 8, 8)
            .swapaxes(1, 2)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full MCU-grid resolution, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width] + 128.0)

    if len(planes) == 1:
        grey = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, grey[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
