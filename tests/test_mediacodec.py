"""Stdlib media codec: PNG decode/encode round-trip against hand-built
files, unfilter coverage for every PNG filter type, JPEG/WAV header
parses, and the Spark-side decode path exercising real payloads."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from parquet_common_spark.functions import mediacodec as MC


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_png(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG BY HAND with an explicit filter type per scanline —
    independent of encode_png, so decode is tested against the spec,
    not against our own encoder."""
    h, w, c = pixels.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y, ftype in zip(range(h), filters):
        cur = pixels[y].reshape(-1).astype(np.int32)
        if ftype == 0:
            enc = cur.copy()
        elif ftype == 1:  # Sub
            enc = cur.copy()
            for i in range(w * c - 1, bpp - 1, -1):
                enc[i] = (enc[i] - cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif ftype == 3:  # Average
            enc = cur.copy()
            for i in range(w * c - 1, -1, -1):
                left = cur[i - bpp] if i >= bpp else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            enc = cur.copy()
            for i in range(w * c - 1, -1, -1):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                enc[i] = (enc[i] - MC._paeth(left, int(prev[i]), ul)) & 0xFF
        raw.append(ftype)
        raw.extend(int(x) & 0xFF for x in enc)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        MC.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    rng = np.random.default_rng(7 + channels)
    arr = rng.integers(0, 256, size=(13, 9, channels), dtype=np.uint8)
    data = MC.encode_png(arr)
    w, h, got = MC.decode_png(data)
    assert (w, h) == (9, 13)
    assert np.array_equal(got, arr)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_unfilter_each_type(ftype):
    rng = np.random.default_rng(ftype)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    data = _hand_png(arr, [ftype] * 5)
    w, h, got = MC.decode_png(data)
    assert (w, h) == (7, 5)
    assert np.array_equal(got, arr), f"filter {ftype} unfilter mismatch"


def test_png_mixed_filters_and_palette():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    data = _hand_png(arr, [0, 1, 2, 3, 4])
    _, _, got = MC.decode_png(data)
    assert np.array_equal(got, arr)
    # palette: indexed pixels expand through PLTE
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[:, :, None]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + bytes(idx[0].reshape(-1)) + b"\x00" + bytes(idx[1].reshape(-1))
    data = (
        MC.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, got = MC.decode_png(data)
    assert (w, h) == (2, 2)
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_png_rejects_out_of_envelope():
    # illegal header combinations are hard errors, not silent garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 3, 2, 0, 0, 0)  # depth 3 illegal
    data = MC.PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        MC.decode_png(data)
    # sub-byte depth is only legal for greyscale/palette color types
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    data = MC.PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="invalid for color type"):
        MC.decode_png(data)
    with pytest.raises(ValueError, match="signature"):
        MC.decode_png(b"nope")


def test_png_16bit_roundtrip():
    """Depth-16 decode returns uint16 samples, big-endian on the wire."""
    rng = np.random.default_rng(21)
    for channels in (1, 3, 4):
        arr = rng.integers(0, 65536, size=(9, 7, channels), dtype=np.uint16)
        w, h, got = MC.decode_png(MC.encode_png(arr, bitdepth=16))
        assert (w, h) == (7, 9)
        assert got.dtype == np.uint16
        assert np.array_equal(got, arr)


def test_png_16bit_filtered_scanlines():
    """16-bit rows through filters 1/2/4: the filter distance is
    channels*2 BYTES (spec: filters act on bytes, not samples)."""
    rng = np.random.default_rng(22)
    arr = rng.integers(0, 65536, size=(6, 5, 3), dtype=np.uint16)
    h, w, c = arr.shape
    # build by hand: big-endian byte stream then byte-wise filtering
    flat = np.empty((h, w * c * 2), dtype=np.int32)
    flat[:, 0::2] = arr.reshape(h, -1) >> 8
    flat[:, 1::2] = arr.reshape(h, -1) & 0xFF
    bpp = c * 2
    raw = bytearray()
    prev = np.zeros(w * c * 2, dtype=np.int32)
    for y, ftype in zip(range(h), [0, 1, 2, 4, 1, 2]):
        cur = flat[y]
        if ftype == 0:
            enc = cur.copy()
        elif ftype == 1:
            enc = cur.copy()
            for i in range(len(cur) - 1, bpp - 1, -1):
                enc[i] = (enc[i] - cur[i - bpp]) & 0xFF
        elif ftype == 2:
            enc = (cur - prev) & 0xFF
        else:
            enc = cur.copy()
            for i in range(len(cur) - 1, -1, -1):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                enc[i] = (enc[i] - MC._paeth(left, int(prev[i]), ul)) & 0xFF
        raw.append(ftype)
        raw.extend(int(x) & 0xFF for x in enc)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    data = (
        MC.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    dw, dh, got = MC.decode_png(data)
    assert np.array_equal(got, arr)


def test_png_subbyte_greyscale():
    """1/2/4-bit greyscale: MSB-first packing, row byte padding, and
    the standard scale-to-8-bit expansion."""
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        rng = np.random.default_rng(depth)
        samples = rng.integers(0, maxv + 1, size=(5, 11), dtype=np.uint8)
        # pack rows MSB-first with padding
        raw = bytearray()
        for y in range(5):
            bits = np.unpackbits(samples[y][:, None], axis=1, count=8)[:, -depth:]
            rowbits = bits.reshape(-1)
            pad = (-len(rowbits)) % 8
            rowbits = np.concatenate([rowbits, np.zeros(pad, np.uint8)])
            raw.append(0)
            raw.extend(np.packbits(rowbits).tobytes())
        ihdr = struct.pack(">IIBBBBB", 11, 5, depth, 0, 0, 0, 0)
        data = (
            MC.PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        w, h, got = MC.decode_png(data)
        assert (w, h) == (11, 5)
        expect = (samples.astype(np.uint16) * (255 // maxv)).astype(np.uint8)
        assert np.array_equal(got[:, :, 0], expect), f"depth {depth}"


def test_png_adam7_interlaced():
    """Adam7: 7 independently-filtered passes recombine to the image —
    hand-built from the spec's pass geometry, mixed filter types."""
    rng = np.random.default_rng(77)
    for size in ((10, 9), (8, 8), (3, 2), (1, 1), (5, 1)):
        h, w = size
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        raw = bytearray()
        for pi, (x0, y0, dx, dy) in enumerate(MC._ADAM7):
            sub = arr[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            prev = np.zeros(pw * 3, dtype=np.int32)
            for y in range(ph):
                cur = sub[y].reshape(-1).astype(np.int32)
                ftype = (pi + y) % 3  # mix None/Sub/Up across passes
                if ftype == 0:
                    enc = cur.copy()
                elif ftype == 1:
                    enc = cur.copy()
                    for i in range(pw * 3 - 1, 2, -1):
                        enc[i] = (enc[i] - cur[i - 3]) & 0xFF
                else:
                    enc = (cur - prev) & 0xFF
                raw.append(ftype)
                raw.extend(int(x) & 0xFF for x in enc)
                prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
        data = (
            MC.PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        dw, dh, got = MC.decode_png(data)
        assert (dw, dh) == (w, h)
        assert np.array_equal(got, arr), f"size {size}"


def test_resize_nearest_geometry():
    arr = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    out = MC.resize_nearest(arr, 3, 4)
    assert out.shape == (4, 3, 3)
    assert np.array_equal(out[0, 0], arr[0, 0])  # corner anchored


def test_jpeg_dimensions():
    # SOI + APP0(JFIF) + SOF0(120x80) + EOI — marker walk must skip APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, 80, 120, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    data = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )
    assert MC.jpeg_dimensions(data) == (120, 80)
    with pytest.raises(ValueError, match="SOI"):
        MC.jpeg_dimensions(b"\x00\x01")


def test_wav_info():
    # 2ch 16-bit 8kHz, 100 frames -> data = 100 * 4 bytes
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    data_body = b"\x00" * 400
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data_body)) + data_body
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert MC.wav_info(wav) == (2, 8000, 100)


def test_sniff_media():
    assert MC.sniff_media(MC.encode_png(np.zeros((1, 1, 3), dtype=np.uint8))) == "png"
    assert MC.sniff_media(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert MC.sniff_media(b"RIFF\x00\x00\x00\x00WAVE") == "wav"
    assert MC.sniff_media(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert MC.sniff_media(b"plain text") is None


def test_decode_media_real_and_fallback(spark):
    """The operator-facing decode routes real containers through the
    codec and magic-less payloads through the synthetic fallback —
    end-to-end through the Arrow mapInPandas plan."""
    from parquet_common_spark.operators import multimodal as MM

    png = MC.encode_png(np.zeros((11, 17, 3), dtype=np.uint8))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + 64) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 64) + b"\x00" * 64
    )
    rows = [(1, "image", bytearray(png)), (2, "audio", bytearray(wav)), (3, "image", bytearray(b"synthetic"))]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["doc_id"]: r for r in MM.decode_media(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (17, 11, 1)
    assert got[2]["n_frames"] == 32  # 64 bytes / 2-byte block align
    assert got[3]["width"] == len(b"synthetic") % 640 + 1  # fallback
    # mp4: real box-walk metadata (geometry + frame count), frame
    # DECODE stays codec-gated
    assert MM._decode_media("video", _hand_mp4()) == (320, 240, 45)


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _hand_mp4() -> bytes:
    """Minimal ISO-BMFF: ftyp + moov{mvhd, trak{tkhd, mdia{hdlr,
    minf{stbl{stts}}}}} — 320x240, 5s, 30+15 video samples."""
    ftyp = _mp4_box(b"ftyp", b"mp42\x00\x00\x00\x00")
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00" + b"\x00" * 3 + struct.pack(">IIII", 0, 0, 1000, 5000),
    )
    tkhd = _mp4_box(
        b"tkhd",
        b"\x00" * 72 + struct.pack(">II", 320 << 16, 240 << 16),
    )
    hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    stts = _mp4_box(
        b"stts", b"\x00" * 4 + struct.pack(">IIIII", 2, 30, 100, 15, 200)
    )
    stbl = _mp4_box(b"stbl", stts)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + moov


def test_mp4_info_box_walk():
    w, h, dur, frames = MC.mp4_info(_hand_mp4())
    assert (w, h) == (320, 240)
    assert abs(dur - 5.0) < 1e-9
    assert frames == 45
    # an audio-only track contributes no video frames
    hdlr_a = _mp4_box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
    stts = _mp4_box(b"stts", b"\x00" * 4 + struct.pack(">III", 1, 99, 10))
    mdia = _mp4_box(b"mdia", hdlr_a + _mp4_box(b"minf", _mp4_box(b"stbl", stts)))
    trak = _mp4_box(b"trak", mdia)
    data = _mp4_box(b"ftyp", b"mp42\x00\x00\x00\x00") + _mp4_box(b"moov", trak)
    assert MC.mp4_info(data)[3] == 0
    with pytest.raises(ValueError, match="ftyp"):
        MC.mp4_info(b"plainly not an mp4")


def test_resize_media_real_png(spark):
    """resize_media re-encodes PNG payloads for real: output payload is
    a valid PNG at the constrained geometry."""
    from parquet_common_spark.operators import multimodal as MM

    rng = np.random.default_rng(3)
    big = MC.encode_png(rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8))
    df = spark.createDataFrame([(9, "image", bytearray(big))], MM.MEDIA_SCHEMA)
    (row,) = MM.resize_media(df, max_side=32).collect()
    assert (row["width"], row["height"]) == (24, 32)
    w, h, pixels = MC.decode_png(bytes(row["payload"]))
    assert (w, h) == (24, 32) and pixels.shape == (32, 24, 3)


def _make_wav(samples: np.ndarray, rate: int, bits: int, fmt_tag: int = 1) -> bytes:
    """Hand-built RIFF/WAVE: samples (frames, ch) float in [-1, 1]."""
    frames, ch = samples.shape
    if fmt_tag == 3:
        payload = samples.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif bits == 8:
        payload = (samples * 127 + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        payload = (samples * 32767).astype("<i2").tobytes()
    elif bits == 24:
        v = (samples.reshape(-1) * ((1 << 23) - 1)).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v)
        b = np.zeros((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        payload = b.tobytes()
    else:
        v = (samples.reshape(-1) * ((1 << 31) - 1)).astype("<i4")
        payload = v.tobytes()
    align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * align, align, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_samples_all_depths():
    """PCM 8/16/24/32-int and 32/64-float all decode to the same signal
    (a sine whose RMS is 1/sqrt(2) of the amplitude)."""
    t = np.arange(8000) / 8000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t))[:, None]
    for bits, tag in ((8, 1), (16, 1), (24, 1), (32, 1), (32, 3), (64, 3)):
        data = _make_wav(sig, 8000, bits, tag)
        x, rate = MC.wav_samples(data)
        assert rate == 8000 and x.shape == (8000, 1)
        rms = float(np.sqrt(np.mean(x * x)))
        tol = 0.01 if bits == 8 else 1e-3
        assert abs(rms - 0.5 / np.sqrt(2)) < tol, (bits, tag, rms)
    # stereo keeps channel separation
    st = np.stack([sig[:, 0], np.zeros_like(sig[:, 0])], axis=1)
    x, _ = MC.wav_samples(_make_wav(st, 8000, 16))
    assert np.abs(x[:, 1]).max() == 0 and np.abs(x[:, 0]).max() > 0.4


def test_wav_samples_rejects_compressed():
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="format tag"):
        MC.wav_samples(data)


def test_audio_features_operator(spark):
    """Real WAV rows get signal stats; magic-less audio rows keep the
    synthetic frame count with NULL stats; non-audio rows are dropped."""
    from parquet_common_spark.operators.multimodal import audio_features

    t = np.arange(4000) / 8000.0
    sig = (0.25 * np.sin(2 * np.pi * 220 * t))[:, None]
    wav = _make_wav(sig, 8000, 16)
    rows = [
        (1, "audio", bytearray(wav)),
        (2, "audio", bytearray(b"no-magic-synthetic-payload")),
        (3, "image", bytearray(b"not-audio")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert set(got) == {1, 2}
    real = got[1]
    assert real["n_channels"] == 1 and real["sample_rate"] == 8000
    assert real["n_frames"] == 4000 and abs(real["duration_s"] - 0.5) < 1e-9
    assert abs(real["rms"] - 0.25 / np.sqrt(2)) < 1e-3
    assert abs(real["peak"] - 0.25) < 1e-3
    synth = got[2]
    assert synth["rms"] is None and synth["peak"] is None
    assert synth["n_frames"] == len(b"no-magic-synthetic-payload") % 48000 + 1


def test_sample_frames_uses_real_mp4_count(spark):
    """For real mp4 payloads the frame GRID comes from the stts box walk
    (45 frames -> indices 0,10,20,30,40 at every_k=10); magic-less rows
    keep the synthetic count."""
    from parquet_common_spark.operators.multimodal import sample_frames

    rows = [
        (1, "video", bytearray(_hand_mp4())),
        (2, "video", bytearray(b"plain-synthetic")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {}
    for r in sample_frames(df, every_k=10).collect():
        got.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert sorted(got[1]) == [0, 10, 20, 30, 40]
    synth_frames = len(b"plain-synthetic") % 300 + 1
    assert sorted(got[2]) == list(range(0, synth_frames, 10))


def _demuxable_mp4(use_co64: bool = False, with_stss: bool = True) -> bytes:
    """A fully-demuxable ISO-BMFF file: 6 video access units in mdat,
    3 chunks x 2 samples, stts(6x100@600), ctts v1 (+0 / +50 split),
    stss sync at samples 1 and 4."""
    ftyp = _mp4_box(b"ftyp", b"mp42\x00\x00\x00\x00")
    frames = [bytes([0x40 + i]) * (5 + i) for i in range(6)]  # sizes 5..10
    mdat = _mp4_box(b"mdat", b"".join(frames))
    base = len(ftyp) + 8  # first payload byte inside mdat
    c1, c2, c3 = base, base + 5 + 6, base + 5 + 6 + 7 + 8

    mvhd = _mp4_box(b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 600, 600))
    tkhd = _mp4_box(b"tkhd", b"\x00" * 72 + struct.pack(">II", 64 << 16, 48 << 16))
    mdhd = _mp4_box(b"mdhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 600, 600))
    hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    stts = _mp4_box(b"stts", b"\x00" * 4 + struct.pack(">III", 1, 6, 100))
    ctts = _mp4_box(
        b"ctts",
        b"\x01" + b"\x00" * 3 + struct.pack(">I", 2)
        + struct.pack(">II", 3, 0)
        + struct.pack(">Ii", 3, 50),
    )
    stsc = _mp4_box(b"stsc", b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">III", 1, 2, 1))
    stsz = _mp4_box(
        b"stsz",
        b"\x00" * 4 + struct.pack(">II", 0, 6) + struct.pack(">6I", *[len(f) for f in frames]),
    )
    if use_co64:
        stco = _mp4_box(b"co64", b"\x00" * 4 + struct.pack(">I", 3) + struct.pack(">3Q", c1, c2, c3))
    else:
        stco = _mp4_box(b"stco", b"\x00" * 4 + struct.pack(">I", 3) + struct.pack(">3I", c1, c2, c3))
    boxes = stts + ctts + stsc + stsz + stco
    if with_stss:
        boxes += _mp4_box(b"stss", b"\x00" * 4 + struct.pack(">I", 2) + struct.pack(">2I", 1, 4))
    stbl = _mp4_box(b"stbl", boxes)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


@pytest.mark.parametrize("use_co64", [False, True])
def test_mp4_demux_sample_tables(use_co64):
    data = _demuxable_mp4(use_co64=use_co64)
    frames = MC.mp4_demux(data)
    assert len(frames) == 6
    assert [f["size"] for f in frames] == [5, 6, 7, 8, 9, 10]
    # exact access-unit bytes out of mdat
    for i, f in enumerate(frames):
        assert MC.mp4_frame_bytes(data, f) == bytes([0x40 + i]) * (5 + i)
    # DTS from stts (delta 100 @ timescale 600); PTS adds ctts v1 offsets
    for i, f in enumerate(frames):
        assert abs(f["dts"] - i * 100 / 600) < 1e-12
        want_pts = f["dts"] + (50 / 600 if i >= 3 else 0.0)
        assert abs(f["pts"] - want_pts) < 1e-12
    # stss: samples 1 and 4 (1-based) are sync
    assert [f["keyframe"] for f in frames] == [True, False, False, True, False, False]


def test_mp4_demux_no_stss_all_keyframes():
    frames = MC.mp4_demux(_demuxable_mp4(with_stss=False))
    assert all(f["keyframe"] for f in frames)


def test_mp4_demux_metadata_only_returns_empty():
    assert MC.mp4_demux(_hand_mp4()) == []


def test_sample_frames_real_demux(spark):
    """sample_frames on a demuxable mp4 emits the REAL access units;
    keyframes_only restricts to stss sync samples."""
    from parquet_common_spark.operators.multimodal import sample_frames

    data = _demuxable_mp4()
    df = spark.createDataFrame(
        [(7, "video", bytearray(data))], "doc_id long, media_type string, payload binary"
    )
    rows = {r["frame_idx"]: bytes(r["frame_payload"]) for r in sample_frames(df, every_k=2).collect()}
    assert sorted(rows) == [0, 2, 4]
    assert rows[2] == b"\x42" * 7
    key = sorted(
        r["frame_idx"] for r in sample_frames(df, every_k=1, keyframes_only=True).collect()
    )
    assert key == [0, 3]


def _wrap_wav(payload: bytes, fmt_tag: int, ch: int, rate: int, bits: int,
              block_align: int) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * block_align,
                      block_align, bits)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_g711_roundtrip_and_pins():
    t = np.arange(4000) / 8000.0
    sig = (0.8 * np.sin(2 * np.pi * 440 * t)).reshape(-1, 1)
    x16 = (sig * 32767).astype(np.int16)
    for tag, law in ((7, "ulaw"), (6, "alaw")):
        enc = MC.g711_encode(x16.reshape(-1), law)
        wav = _wrap_wav(enc.tobytes(), tag, 1, 8000, 8, 1)
        x, rate = MC.wav_samples(wav)
        assert rate == 8000 and x.shape == (4000, 1)
        # companding round-trip: max error within the top-segment step
        assert np.max(np.abs(x - sig)) < 0.05
        assert np.corrcoef(x.ravel(), sig.ravel())[0, 1] > 0.999
    # canonical G.711 decode pins: ulaw 0xFF -> 0; alaw 0x55 -> -8
    assert MC.wav_samples(_wrap_wav(b"\xff", 7, 1, 8000, 8, 1))[0][0, 0] == 0.0
    assert MC.wav_samples(_wrap_wav(b"\x55", 6, 1, 8000, 8, 1))[0][0, 0] == (
        -8 / 32768.0
    )


def test_wav_ima_adpcm_roundtrip_stereo():
    t = np.arange(2021) / 8000.0
    sig = np.stack(
        [0.6 * np.sin(2 * np.pi * 300 * t), 0.4 * np.sin(2 * np.pi * 523 * t)],
        axis=1,
    )
    x16 = (sig * 32767).astype(np.int16)
    payload, align = MC.ima_adpcm_encode(x16, channels=2, samples_per_block=505)
    wav = _wrap_wav(payload, 0x11, 2, 8000, 4, align)
    x, rate = MC.wav_samples(wav)
    frames = (2021 // 505) * 505
    assert rate == 8000 and x.shape == (frames, 2)
    ref = sig[:frames]
    # ADPCM tracks within a few quantization steps once the step adapts
    # (the first ~20 samples are the classic slope-overload warm-up while
    # the step index climbs from 7 toward the signal's true slope)
    assert np.max(np.abs(x[24:] - ref[24:])) < 0.05
    assert np.corrcoef(x[:, 0], ref[:, 0])[0, 1] > 0.995


def test_wav_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        MC.wav_samples(_wrap_wav(b"\x00\x00", 2, 1, 8000, 4, 2))  # MS ADPCM


def _png_with_filters(w, h, ch, ftypes, seed=7):
    """Hand-filtered PNG: pixel bytes from a deterministic pattern,
    each row filtered with the given type via the RFC 2083 formulas."""
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8).astype(np.int32)
    bpp = ch
    stream = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        cur = pix[y]
        a = np.concatenate((np.zeros(bpp, np.int32), cur[:-bpp]))
        b = prev
        c = np.concatenate((np.zeros(bpp, np.int32), prev[:-bpp]))
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - a
        elif f == 2:
            filt = cur - b
        elif f == 3:
            filt = cur - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            filt = cur - pred
        stream.append(f)
        stream += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[ch], 0, 0, 0)
    png = MC.PNG_SIGNATURE + MC._png_chunk(b"IHDR", ihdr)
    png += MC._png_chunk(b"IDAT", _z.compress(bytes(stream)))
    png += MC._png_chunk(b"IEND", b"")
    return png, pix.astype(np.uint8).reshape(h, w, ch)


def test_png_unfilter_native_matches_pure_all_filters(monkeypatch):
    for ch in (1, 3, 4):
        png, want = _png_with_filters(37, 23, ch, ftypes=[0, 1, 2, 3, 4])
        _, _, native = MC.decode_png(png)
        # force the pure-Python path
        monkeypatch.setattr(MC, "_PNG_NATIVE_LIB", None)
        monkeypatch.setattr(MC, "_PNG_NATIVE_TRIED", True)
        _, _, pure = MC.decode_png(png)
        monkeypatch.undo()
        assert np.array_equal(native, pure)
        assert np.array_equal(native.reshape(want.shape), want)


def test_png_unfilter_native_truncation_same_error(monkeypatch):
    # decode_png validates total IDAT length up front, so drive the
    # unfilter layer directly: the kernel must DEFER to the pure path on
    # any malformed input (negative return), so both paths raise the
    # identical errors
    full_row = bytes([2]) + bytes(16)
    for forced_pure in (False, True):
        if forced_pure:
            monkeypatch.setattr(MC, "_PNG_NATIVE_LIB", None)
            monkeypatch.setattr(MC, "_PNG_NATIVE_TRIED", True)
        # stream ends exactly after row 1 -> "PNG IDAT truncated"
        with pytest.raises(ValueError, match="truncated"):
            MC._unfilter_rows(full_row, n_rows=2, row_bytes=16, bpp=3, pos=0)
        # short final row -> pure path's broadcast ValueError on both
        with pytest.raises(ValueError):
            MC._unfilter_rows(
                bytes([4]) + bytes(10), n_rows=1, row_bytes=16, bpp=3, pos=0
            )
        # bad filter type -> same message on both
        with pytest.raises(ValueError, match="bad PNG filter"):
            MC._unfilter_rows(
                bytes([9]) + bytes(16), n_rows=1, row_bytes=16, bpp=3, pos=0
            )
        monkeypatch.undo()


def _png_body_of(png, ctype):
    for t, body in MC._png_chunks(png):
        if t == ctype:
            return body
    raise KeyError(ctype)


def _wrap_wav_fact(payload: bytes, fmt_tag: int, ch: int, rate: int,
                   bits: int, block_align: int, fact_frames: int) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * block_align,
                      block_align, bits)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, fact_frames)
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_info_agrees_with_wav_samples_for_adpcm():
    """ADVICE r7: wav_info used data_size // block_align for IMA ADPCM,
    undercounting ~505x vs what wav_samples decodes.  The two public
    APIs must agree, with and without a fact chunk."""
    t = np.arange(1011) / 8000.0
    x16 = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    payload, align = MC.ima_adpcm_encode(
        x16.reshape(-1, 1), channels=1, samples_per_block=505
    )
    wav = _wrap_wav(payload, 0x11, 1, 8000, 4, align)
    x, _ = MC.wav_samples(wav)
    ch, rate, frames = MC.wav_info(wav)
    assert (ch, rate) == (1, 8000)
    assert frames == x.shape[0] == 1010  # 2 full blocks of 505
    # with a fact chunk clamping off the last 3 (padding) samples
    wav_f = _wrap_wav_fact(payload, 0x11, 1, 8000, 4, align, 1007)
    xf, _ = MC.wav_samples(wav_f)
    assert MC.wav_info(wav_f)[2] == xf.shape[0] == 1007
    # PCM path unchanged: frames = data bytes / frame bytes
    pcm = _wrap_wav(x16.tobytes(), 1, 1, 8000, 16, 2)
    assert MC.wav_info(pcm)[2] == MC.wav_samples(pcm)[0].shape[0] == 1011


def test_wav_ima_adpcm_partial_trailing_block():
    """A truncated final block must decode its present body (whole
    interleave words), not be silently dropped (ADVICE r7)."""
    t = np.arange(1515) / 8000.0
    x16 = (0.5 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16)
    payload, align = MC.ima_adpcm_encode(
        x16.reshape(-1, 1), channels=1, samples_per_block=505
    )
    assert len(payload) == 3 * align  # align = 4 + 252 = 256
    # cut mid-way through the third block: header (4B) + 30 words of 4B
    cut = 2 * align + 4 + 30 * 4
    wav = _wrap_wav(payload[:cut], 0x11, 1, 8000, 4, align)
    x, _ = MC.wav_samples(wav)
    want = 2 * 505 + (30 * 4 * 2 + 1)  # 2 full blocks + partial
    assert x.shape[0] == want
    assert MC.wav_info(wav)[2] == want
    # the partial block's samples match the full decode's prefix
    full = MC.wav_samples(_wrap_wav(payload, 0x11, 1, 8000, 4, align))[0]
    assert np.array_equal(x, full[:want])
    # a non-word-aligned cut truncates to whole words, never crashes
    wav_ragged = _wrap_wav(payload[: cut + 3], 0x11, 1, 8000, 4, align)
    assert MC.wav_samples(wav_ragged)[0].shape[0] == want
    # trailing garbage shorter than a header is dropped
    wav_stub = _wrap_wav(payload[: 2 * align + 2], 0x11, 1, 8000, 4, align)
    assert MC.wav_samples(wav_stub)[0].shape[0] == 2 * 505


def test_wav_ima_adpcm_bad_block_align_raises_codec_error():
    # body (align - 4*ch) not divisible by 4*ch: explicit codec error,
    # not a bare numpy reshape ValueError
    with pytest.raises(ValueError, match="IMA ADPCM"):
        MC.wav_samples(_wrap_wav(b"\x00" * 20, 0x11, 1, 8000, 4, 10))


def test_audio_features_flac(spark):
    """FLAC rows decode through the real codec inside the Arrow stage:
    signal stats match the WAV-encoded version of the SAME samples."""
    from parquet_common_spark.functions import flaccodec as FC
    from parquet_common_spark.operators.multimodal import audio_features

    t = np.arange(3000) / 8000.0
    sig = np.stack(
        [0.25 * np.sin(2 * np.pi * 220 * t), 0.15 * np.sin(2 * np.pi * 330 * t)],
        axis=1,
    )
    x16 = (sig * 32767).astype(np.int64)
    flac = FC.flac_encode(x16, 8000, 16, blocksize=512, stereo_mode="ms")
    wav = _make_wav(sig, 8000, 16)
    rows = [(1, "audio", bytearray(flac)), (2, "audio", bytearray(wav))]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {r["doc_id"]: r for r in audio_features(df).collect()}
    f, w = got[1], got[2]
    assert f["n_channels"] == 2 and f["sample_rate"] == 8000
    assert f["n_frames"] == 3000
    # same PCM, same normalization -> identical stats
    assert abs(f["rms"] - w["rms"]) < 1e-12
    assert abs(f["peak"] - w["peak"]) < 1e-12
