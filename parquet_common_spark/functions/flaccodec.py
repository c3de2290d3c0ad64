"""FLAC decode (and a test-oracle encoder) — pure Python/numpy, from
the published format spec (RFC 9639 / xiph.org FLAC format): STREAMINFO
metadata, frame headers (all block-size/rate/depth codes, UTF-8-coded
frame numbers, CRC-8), subframe types CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32), Rice / Rice2 residual partitions with
escape codes, wasted-bits shifts, stereo decorrelation (left-side,
right-side, mid-side), and frame CRC-16 verification.

Posture matches the other from-scratch codecs (PNG/JPEG/WAV/MP4): the
reference repo has no media surface, so this extends the repo's own
multimodal envelope.  The per-symbol serial stage (Rice unary walks +
predictor reconstruction) runs through a compiled C kernel
(flac_subframe_kernel.c, same lazily-built hash-cached pattern as
jpeg_scan_kernel.c) when a compiler is present; the pure-Python
``_read_subframe`` remains the fallback and the error-path authority,
with bit-identity across engines pinned by tests (subframe types x
stereo modes x partition orders + hypothesis round-trips).  The
encoder exists to pin round-trips: FLAC is lossless, so
decode(encode(x)) must equal x BIT-EXACTLY for every subframe type and
stereo mode, and a defect in any Rice/predictor/bit-packing detail
breaks the equality.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# ------------------------------------------------------------- CRCs


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tab.append(r)
    return tab


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    lib = _native_kernel()
    if lib is not None:
        import ctypes

        return lib.flac_crc8(ctypes.c_char_p(data), ctypes.c_int64(len(data)))
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    lib = _native_kernel()
    if lib is not None:
        import ctypes

        return lib.flac_crc16(ctypes.c_char_p(data), ctypes.c_int64(len(data)))
    r = 0
    for b in data:
        r = _CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# -------------------------------------------------------- bit I/O


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0  # bits consumed within current byte (MSB first)

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)


# ------------------------------------------------------ frame pieces

_BLOCKSIZE = {
    0x1: 192, 0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048, 0xC: 4096,
    0xD: 8192, 0xE: 16384, 0xF: 32768,
}
_RATES = {
    0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
    0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000,
    0xB: 96000,
}
_DEPTHS = {0x1: 8, 0x2: 12, 0x4: 16, 0x5: 20, 0x6: 24, 0x7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: bad UTF-8-coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    payload = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    for i in range(nbytes - 1):
        payload.append(0x80 | ((v >> (6 * i)) & 0x3F))
    lead = (0xFF << (8 - nbytes)) & 0xFF | (v >> (6 * (nbytes - 1)))
    bw.write(lead, 8)
    for p in reversed(payload):
        bw.write(p, 8)


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_enc(v: int) -> int:
    return -(v << 1) - 1 if v < 0 else v << 1


def _read_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC: block size not divisible by partitions")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: partition shorter than predictor order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(br.signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                r = br.read(param) if param else 0
                out.append(_zigzag_dec((q << param) | r))
    return out


def _predict(warm: list[int], resid: list[int], coefs: list[int], shift: int) -> list[int]:
    s = list(warm)
    order = len(coefs)
    for r in resid:
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * s[-1 - j]
        s.append((acc >> shift) + r)
    return s


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    ebps = bps - wasted
    if ftype == 0:  # CONSTANT
        v = br.signed(ebps)
        s = [v] * blocksize
    elif ftype == 1:  # VERBATIM
        s = [br.signed(ebps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        warm = [br.signed(ebps) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        s = _predict(warm, resid, _FIXED_COEFS[order], 0)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        warm = [br.signed(ebps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise ValueError("FLAC: invalid LPC precision")
        prec += 1
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.signed(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        s = _predict(warm, resid, coefs, shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype}")
    if wasted:
        s = [v << wasted for v in s]
    return s


# ------------------------------------------------ native subframe kernel

_NATIVE_LIB = None
_NATIVE_TRIED = False
# rc -> the SAME ValueError message the pure path raises (error-path
# parity with _read_subframe/_read_residual); rc 300+t carries the
# reserved subframe type t.
_SUBFRAME_ERRORS = {
    1: "FLAC: bitstream truncated",
    2: "FLAC: subframe padding bit set",
    4: "FLAC: invalid LPC precision",
    5: "FLAC: negative LPC shift",
    6: "FLAC: reserved residual coding method",
    7: "FLAC: block size not divisible by partitions",
    8: "FLAC: partition shorter than predictor order",
}


def _native_kernel():
    """Lazily compile flac_subframe_kernel.c (cc -O2 -shared, cached by
    source hash in the system temp dir) and load it via ctypes.
    Returns the library, or None when no compiler / load failure —
    callers fall back to the pure-Python per-symbol loop.  Same
    build/caching pattern as jpegcodec._native_kernel."""
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

        src = os.path.join(os.path.dirname(__file__), "flac_subframe_kernel.c")
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(tempfile.gettempdir(), f"pcs_flac_subframe_{digest}.so")
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
        lib.decode_subframe.restype = ctypes.c_int
        lib.flac_crc8.restype = ctypes.c_int
        lib.flac_crc16.restype = ctypes.c_int
        _NATIVE_LIB = lib
    except Exception:
        _NATIVE_LIB = None
    return _NATIVE_LIB


def _read_subframe_native(lib, data: bytes, br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    """One subframe through the C kernel; advances ``br`` and returns
    an int64 sample array.  Raises the same ValueErrors as the pure
    path (messages mapped from kernel return codes)."""
    import ctypes

    buf = np.empty(blocksize, dtype=np.int64)
    byte = ctypes.c_int64(br.byte)
    bit = ctypes.c_int32(br.bit)
    rc = lib.decode_subframe(
        ctypes.c_char_p(data),
        ctypes.c_int64(len(data)),
        ctypes.byref(byte),
        ctypes.byref(bit),
        ctypes.c_int32(blocksize),
        ctypes.c_int32(bps),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc:
        if rc >= 300:
            raise ValueError(f"FLAC: reserved subframe type {rc - 300}")
        raise ValueError(_SUBFRAME_ERRORS.get(rc, f"FLAC: subframe kernel error {rc}"))
    br.byte = byte.value
    br.bit = bit.value
    return buf


# --------------------------------------------------------- public API


def _parse_streaminfo(data: bytes):
    if data[:4] != b"fLaC":
        raise ValueError("not FLAC: bad magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)  # min framesize
            br.read(24)  # max framesize
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (channels, rate, bps, total)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    return info, pos


def flac_info(data: bytes) -> tuple[int, int, int, int]:
    """(n_channels, sample_rate, bits_per_sample, n_frames) from
    STREAMINFO."""
    info, _ = _parse_streaminfo(data)
    return info

def flac_samples(data: bytes, engine: str = "auto") -> tuple[np.ndarray, int]:
    """Decode all frames to ((n, channels) int32, rate).  Verifies each
    frame's header CRC-8 and footer CRC-16.

    ``engine`` selects the subframe (Rice + predictor) implementation:
    ``"reference"`` is the pure-Python per-symbol loop (error-path
    authority), ``"native"`` the compiled C kernel, ``"auto"`` native
    when a compiler is available else reference.  All engines are
    bit-identical on valid streams (pinned by test)."""
    if engine == "auto":
        lib = _native_kernel()
        engine = "native" if lib is not None else "reference"
    elif engine == "native":
        lib = _native_kernel()
        if lib is None:
            raise RuntimeError("FLAC: native kernel unavailable (no C compiler)")
    elif engine == "reference":
        lib = None
    else:
        raise ValueError(f"FLAC: unknown engine {engine!r}")

    def read_subframe(br, blocksize, fbps):
        if engine == "native":
            return _read_subframe_native(lib, data, br, blocksize, fbps)
        return np.asarray(_read_subframe(br, blocksize, fbps), dtype=np.int64)

    (channels, rate, bps, total), pos = _parse_streaminfo(data)
    out: list[np.ndarray] = []
    got = 0
    while pos + 2 <= len(data) and (total == 0 or got < total):
        hdr_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        depth_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0x6:
            blocksize = br.read(8) + 1
        elif bs_code == 0x7:
            blocksize = br.read(16) + 1
        elif bs_code in _BLOCKSIZE:
            blocksize = _BLOCKSIZE[bs_code]
        else:
            raise ValueError("FLAC: reserved block size code")
        if sr_code == 0xC:
            br.read(8)
        elif sr_code in (0xD, 0xE):
            br.read(16)
        elif sr_code == 0xF:
            raise ValueError("FLAC: invalid sample rate code")
        fbps = bps if depth_code == 0 else _DEPTHS.get(depth_code)
        if fbps is None:
            raise ValueError("FLAC: reserved sample size code")
        hdr_crc = br.read(8)
        hdr_bytes = data[hdr_start : br.byte]  # crc byte is at br.byte-1
        if crc8(hdr_bytes[:-1]) != hdr_crc:
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if chan_code <= 7:
            nch = chan_code + 1
            chans = [read_subframe(br, blocksize, fbps) for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            nch = 2
            side_idx = 1 if chan_code in (8, 10) else 0
            chans = [
                read_subframe(br, blocksize, fbps + (1 if i == side_idx else 0))
                for i in range(2)
            ]
            a, b = chans  # int64 arrays: decorrelate vectorized
            if chan_code == 8:  # left-side: b is side = L - R
                chans = [a, a - b]
            elif chan_code == 9:  # right-side: a is side = L - R
                chans = [b + a, b]
            else:  # mid-side
                m2 = (a << 1) | (b & 1)
                chans = [(m2 + b) >> 1, (m2 - b) >> 1]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if nch != channels:
            raise ValueError("FLAC: frame channel count != STREAMINFO")
        br.align()
        if br.byte + 2 > len(data):
            raise ValueError("FLAC: bitstream truncated")
        foot_crc = (data[br.byte] << 8) | data[br.byte + 1]
        if crc16(data[hdr_start : br.byte]) != foot_crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = br.byte + 2
        out.append(np.stack(chans, axis=0).T)
        got += blocksize
    if not out:
        raise ValueError("FLAC: no frames")
    pcm = np.concatenate(out, axis=0)
    if total:
        pcm = pcm[:total]
    return pcm.astype(np.int32), rate


# ----------------------------------------------------- test encoder


def _best_rice_param(resid: list[int], pbits: int) -> int:
    if not resid:
        return 0
    mean = sum(_zigzag_enc(v) for v in resid) / max(len(resid), 1)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < (1 << pbits) - 2:
        p += 1
    return p


def _write_residual(bw: _BitWriter, resid: list[int], order: int,
                    blocksize: int, porder: int) -> None:
    bw.write(0, 2)  # Rice, 4-bit params
    bw.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        part = resid[idx : idx + n]
        idx += n
        param = _best_rice_param(part, 4)
        bw.write(param, 4)
        for v in part:
            u = _zigzag_enc(v)
            bw.unary(u >> param)
            if param:
                bw.write(u & ((1 << param) - 1), param)


# encoder-side LPC demo filter (order 2): pred = (3*s[-1] - s[-2]) >> 1
_LPC_COEFS = [3, -1]
_LPC_SHIFT = 1
_LPC_PREC = 4  # bits per coefficient


def _wasted_flag(bw: _BitWriter, s: list[int], wasted: int) -> list[int]:
    if wasted == 0:
        bw.write(0, 1)
        return s
    assert all(v % (1 << wasted) == 0 for v in s), "samples not shiftable"
    bw.write(1, 1)
    bw.unary(wasted - 1)  # decoder reads unary()+1
    return [v >> wasted for v in s]


def _write_subframe(bw: _BitWriter, s: list[int], bps: int,
                    kind: str, porder: int, wasted: int = 0) -> None:
    blocksize = len(s)
    bw.write(0, 1)  # pad
    if kind == "constant":
        assert all(v == s[0] for v in s)
        bw.write(0, 6)
        s = _wasted_flag(bw, s, wasted)
        bw.write(s[0] & ((1 << (bps - wasted)) - 1), bps - wasted)
        return
    if kind == "verbatim":
        bw.write(1, 6)
        s = _wasted_flag(bw, s, wasted)
        for v in s:
            bw.write(v & ((1 << (bps - wasted)) - 1), bps - wasted)
        return
    if kind == "lpc" and blocksize <= len(_LPC_COEFS):
        # a block shorter than the predictor order cannot carry it
        # (spec: order < blocksize); degrade to the largest legal fixed
        kind = f"fixed{blocksize - 1}"
    if kind == "lpc":
        order = len(_LPC_COEFS)
        bw.write(31 + order, 6)  # type 1xxxxx, order = xxxxx+1
        s = _wasted_flag(bw, s, wasted)
        ebps = bps - wasted
        for v in s[:order]:
            bw.write(v & ((1 << ebps) - 1), ebps)
        bw.write(_LPC_PREC - 1, 4)
        bw.write(_LPC_SHIFT, 5)
        for c in _LPC_COEFS:
            bw.write(c & ((1 << _LPC_PREC) - 1), _LPC_PREC)
        resid = [
            s[i]
            - (sum(c * s[i - 1 - j] for j, c in enumerate(_LPC_COEFS))
               >> _LPC_SHIFT)
            for i in range(order, blocksize)
        ]
        while porder > 0 and (
            blocksize % (1 << porder) or (blocksize >> porder) < order
        ):
            porder -= 1
        _write_residual(bw, resid, order, blocksize, porder)
        return
    assert kind.startswith("fixed")
    order = min(int(kind[5:]), blocksize - 1)  # spec: order < blocksize
    coefs = _FIXED_COEFS[order]
    bw.write(8 + order, 6)
    s = _wasted_flag(bw, s, wasted)
    ebps = bps - wasted
    for v in s[:order]:
        bw.write(v & ((1 << ebps) - 1), ebps)
    resid = [
        s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, blocksize)
    ]
    # partition order must divide the block and leave the first
    # partition non-negative after the warmup samples
    while porder > 0 and (
        blocksize % (1 << porder) or (blocksize >> porder) < order
    ):
        porder -= 1
    _write_residual(bw, resid, order, blocksize, porder)


def flac_encode(
    x: np.ndarray,
    rate: int,
    bits: int = 16,
    blocksize: int = 1024,
    stereo_mode: str = "indep",
    subframe: str = "fixed2",
    partition_order: int = 0,
    wasted_bits: int = 0,
) -> bytes:
    """Encode (n, channels) ints as FLAC — the round-trip oracle for
    :func:`flac_samples`.  ``stereo_mode``: indep | ls | rs | ms
    (2-channel input only); ``subframe``: constant | verbatim |
    fixed0..fixed4 | lpc (constant requires genuinely constant blocks,
    wasted_bits requires samples divisible by 2^wasted_bits)."""
    x = np.asarray(x, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    si_body = bytes(si.out) + bytes(16)  # md5 zeroed (unverified)
    out += bytes([0x80]) + len(si_body).to_bytes(3, "big") + si_body

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = x[start : start + blocksize]
        bs = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(0x7, 4)  # 16-bit blocksize-1 follows
        bw.write(0x0, 4)  # rate from STREAMINFO
        if channels == 2 and stereo_mode != "indep":
            bw.write({"ls": 8, "rs": 9, "ms": 10}[stereo_mode], 4)
        else:
            bw.write(channels - 1, 4)
        bw.write(0x0, 3)  # depth from STREAMINFO
        bw.write(0, 1)  # reserved
        _write_utf8_number(bw, fi)
        bw.write(bs - 1, 16)
        assert bw.nacc == 0
        hdr = bytes(bw.out)
        bw.write(crc8(hdr), 8)

        if channels == 2 and stereo_mode != "indep":
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            side = [a - b for a, b in zip(left, right)]
            if stereo_mode == "ls":
                chans = [(left, bits), (side, bits + 1)]
            elif stereo_mode == "rs":
                chans = [(side, bits + 1), (right, bits)]
            else:
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                chans = [(mid, bits), (side, bits + 1)]
        else:
            chans = [([int(v) for v in blk[:, ci]], bits) for ci in range(channels)]
        for s, bps in chans:
            _write_subframe(bw, s, bps, subframe, partition_order, wasted_bits)
        bw.align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)
