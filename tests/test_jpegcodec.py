"""Baseline JPEG codec: DCT pinned against the T.81 direct formula,
encoder/decoder round trips across layouts, envelope errors, and the
multimodal wiring (real JPEG pixels through decode/resize)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from parquet_common_spark.functions import jpegcodec as J
from parquet_common_spark.functions import mediacodec as MC


def test_dct_matrix_orthonormal_and_matches_t81():
    A = J.dct_matrix()
    assert np.allclose(A @ A.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(0)
    blk = rng.normal(size=(8, 8))
    coef = A @ blk @ A.T
    direct = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = sum(
                blk[x, y]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
                for x in range(8)
                for y in range(8)
            )
            direct[u, v] = 0.25 * cu * cv * s
    assert np.allclose(coef, direct, atol=1e-10)


def test_zigzag_is_the_standard_order():
    # the canonical first/last entries of T.81 figure A.6
    assert J.ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0),
    ]
    assert J.ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert sorted(J.ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]


def test_flat_image_roundtrips_exactly():
    img = np.full((16, 24), 130, dtype=np.uint8)
    w, h, out = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert (w, h) == (24, 16)
    assert np.array_equal(out[:, :, 0], img)


def test_smooth_rgb_roundtrip_within_quant_error():
    x = np.linspace(0, 255, 32)
    gx, gy = np.meshgrid(x, x)
    rgb = np.stack([gx, gy, (gx + gy) / 2], axis=2).astype(np.uint8)
    w, h, out = J.decode_jpeg(J.encode_jpeg(rgb, quality=95))
    assert (w, h) == (32, 32)
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.max() <= 8 and err.mean() < 1.5


def test_420_subsampling_and_odd_dimensions():
    rng = np.random.default_rng(3)
    rgb = rng.integers(90, 160, size=(17, 13, 3)).astype(np.uint8)
    w, h, out = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, subsampling="420"))
    assert (w, h) == (13, 17) and out.shape == (17, 13, 3)
    # mid-range low-contrast content: subsampled chroma stays close
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.mean() < 30


def test_restart_intervals_roundtrip():
    x = np.linspace(0, 255, 40)
    gx, gy = np.meshgrid(x, x)
    rgb = np.stack([gx, gy, gy], axis=2).astype(np.uint8)
    plain = J.decode_jpeg(J.encode_jpeg(rgb, quality=92))[2]
    with_rst = J.decode_jpeg(J.encode_jpeg(rgb, quality=92, restart_interval=3))[2]
    # restart markers change the container, not the content
    assert np.array_equal(plain, with_rst)


def test_grayscale_roundtrip():
    rng = np.random.default_rng(5)
    img = (rng.normal(128, 10, size=(24, 24))).clip(0, 255).astype(np.uint8)
    w, h, out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert out.shape == (24, 24, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).mean() < 6


def test_geometry_agrees_with_sof_parser():
    img = np.zeros((10, 34), dtype=np.uint8)
    data = J.encode_jpeg(img)
    assert MC.sniff_media(data) == "jpeg"
    assert MC.jpeg_dimensions(data) == (34, 10)


def test_unsupported_modes_raise():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(J.encode_jpeg(img))
    # rewrite SOF0 to SOF7 (hierarchical) — genuinely unsupported.
    # (SOF3 lossless is a SUPPORTED mode since r9 — dispatched to
    # functions/jpeglossless.py and covered by test_jpeglossless.py —
    # so it no longer belongs in this test.)
    i = bytes(data).find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC7
    with pytest.raises(NotImplementedError, match="hierarchical"):
        J.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"not a jpeg")


# -------------------------------------------------- progressive (SOF2)
#
# encode_jpeg_progressive transports the SAME quantized coefficients as
# the baseline encoder, so decode(progressive) must equal
# decode(baseline) PIXEL-EXACTLY — any defect in the EOB-run /
# correction-bit / successive-approximation logic breaks the identity.


def _assert_progressive_identity(img, quality):
    base = J.decode_jpeg(J.encode_jpeg(img, quality=quality, subsampling="444"))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=quality))
    assert base[:2] == prog[:2]
    assert np.array_equal(base[2], prog[2]), "progressive != baseline pixels"
    return prog


def test_progressive_flat_and_smooth():
    _assert_progressive_identity(np.full((16, 24), 130, dtype=np.uint8), 90)
    x = np.linspace(0, 255, 32)
    gx, gy = np.meshgrid(x, x)
    rgb = np.stack([gx, gy, (gx + gy) / 2], axis=2).astype(np.uint8)
    _assert_progressive_identity(rgb, 95)


def test_progressive_noise_exercises_all_scan_paths():
    """Random noise keeps every coefficient band busy: EOB runs, ZRL in
    refinement scans, newly-significant placements and correction bits
    all fire.  Also odd geometry (edge-block replication)."""
    rng = np.random.default_rng(11)
    for shape, q in (((24, 40, 3), 85), ((17, 13, 3), 70), ((9, 25), 95)):
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        _assert_progressive_identity(img, q)


def test_progressive_low_quality_long_eob_runs():
    """Very low quality zeroes most coefficients — long cross-block EOB
    runs in both first and refinement scans."""
    rng = np.random.default_rng(13)
    img = (rng.normal(128, 6, size=(48, 48, 3))).clip(0, 255).astype(np.uint8)
    _assert_progressive_identity(img, 10)


def test_progressive_stream_is_sof2():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = J.encode_jpeg_progressive(img)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert MC.jpeg_dimensions(data) == (8, 8)  # SOF scan still works
    # multiple SOS scans present (DC first + AC bands + refinements)
    assert data.count(b"\xff\xda") >= 4


def test_multimodal_decodes_and_resizes_real_jpeg(spark):
    from parquet_common_spark.operators.multimodal import decode_media, resize_media

    big = np.zeros((96, 64, 3), dtype=np.uint8)
    big[:, :, 0] = 200
    payload = J.encode_jpeg(big, quality=90)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "doc_id long, media_type string, payload binary",
    )
    meta = decode_media(df).collect()[0]
    assert (meta["width"], meta["height"]) == (64, 96)
    out = resize_media(df, max_side=48).collect()[0]
    assert (meta["width"], meta["height"]) == (64, 96)
    assert max(out["width"], out["height"]) == 48
    # the resized payload is a real JPEG that decodes to the new geometry
    w, h, pixels = J.decode_jpeg(bytes(out["payload"]))
    assert (w, h) == (out["width"], out["height"])
    assert abs(int(pixels[:, :, 0].mean()) - 200) < 10


def test_progressive_420_identity():
    rng = np.random.default_rng(5)
    for shape in ((24, 40, 3), (17, 13, 3)):
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(img, quality=85, subsampling="420"))
        prog = J.decode_jpeg(
            J.encode_jpeg_progressive(img, quality=85, subsampling="420")
        )
        assert np.array_equal(base[2], prog[2])


def test_corrupt_payloads_yield_null_metadata(spark):
    """decode_media must survive malformed containers: truncated/garbage
    payloads with valid magic produce NULL metadata rows, not job
    failure (quarantine via `width IS NULL` at scale)."""
    from parquet_common_spark.functions import mediacodec as MC
    from parquet_common_spark.operators.multimodal import decode_media

    good = J.encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    rows = [
        (1, "image", bytearray(good)),
        (2, "image", bytearray(MC.PNG_SIGNATURE + b"\x00garbage" * 4)),
        (3, "image", bytearray(b"\xff\xd8\xff\xe0truncated")),
        (4, "video", bytearray(b"\x00\x00\x00\x08ftyp")),  # truncated mp4
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    got = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert got[1]["width"] == 8
    assert got[2]["width"] is None and got[2]["n_frames"] is None
    assert got[3]["width"] is None
    # truncated mp4 still yields the (0, 0, 0) metadata parse or NULLs -
    # either way no exception escapes
    assert got[4]["n_bytes"] == 8


# ------------------------------------------------- engine identity pins


def _photo(h, w, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (128 + 80 * np.sin(x / 17) * np.cos(y / 23)).astype(np.float64)
    return np.clip(
        base[:, :, None] + rng.normal(0, 18, (h, w, 3)), 0, 255
    ).astype(np.uint8)


def _engines():
    engines = ["reference", "fast"]
    if J._native_kernel() is not None:
        engines.append("native")
    return engines


def test_decode_engines_bit_identical_across_layouts():
    """The fast (pure-Python tight loop) and native (C kernel) scan
    decoders must produce BIT-identical pixels to the readable
    reference structure on every stream shape: baseline 444/420,
    restart intervals, greyscale, progressive 444/420, odd
    dimensions."""
    img = _photo(96, 112)
    cases = [
        J.encode_jpeg(img, quality=85, subsampling="444"),
        J.encode_jpeg(img, quality=85, subsampling="420"),
        J.encode_jpeg(img, quality=85, restart_interval=3),
        J.encode_jpeg(img[:, :, 0], quality=90),
        J.encode_jpeg_progressive(img, quality=85),
        J.encode_jpeg_progressive(_photo(56, 88), quality=80, subsampling="420"),
        J.encode_jpeg(_photo(41, 27), quality=60, subsampling="420"),
        J.encode_jpeg_progressive(_photo(33, 19), quality=30),  # long EOB runs
    ]
    engines = _engines()
    assert "native" in engines, "C compiler expected in this environment"
    for enc in cases:
        ref = J.decode_jpeg(enc, engine="reference")
        for eng in engines[1:]:
            got = J.decode_jpeg(enc, engine=eng)
            assert got[:2] == ref[:2]
            assert np.array_equal(got[2], ref[2]), f"{eng} diverged"


def test_decode_engines_agree_on_truncated_stream_errors():
    """A truncated entropy stream raises ValueError in every engine
    (same exhaustion semantics, not just the happy path)."""
    enc = J.encode_jpeg(_photo(48, 48), quality=85)
    # cut inside the entropy data (past the headers, before EOI)
    cut = enc[: len(enc) // 2]
    for eng in _engines():
        with pytest.raises(ValueError):
            J.decode_jpeg(cut, engine=eng)


def test_decode_auto_engine_matches_reference():
    """The default engine (auto: native when compilable, else fast)
    is what multimodal mapInPandas callers get — pin it too."""
    enc = J.encode_jpeg_progressive(_photo(64, 64), quality=75)
    assert np.array_equal(
        J.decode_jpeg(enc)[2], J.decode_jpeg(enc, engine="reference")[2]
    )


# ------------------------------------------- arithmetic coding (SOF9)


def _arith_img(rng, h, w, ch):
    base = rng.integers(0, 255, (h // 8 + 1, w // 8 + 1, ch), dtype=np.uint8)
    up = np.repeat(np.repeat(base, 8, 0), 8, 1)[:h, :w]
    noise = rng.integers(-12, 12, (h, w, ch))
    x = np.clip(up.astype(int) + noise, 0, 255).astype(np.uint8)
    return x[:, :, 0] if ch == 1 else x


@pytest.mark.parametrize(
    "h,w,ch,sub,ri",
    [
        (32, 32, 1, "444", 0),
        (40, 24, 3, "444", 0),
        (33, 17, 3, "420", 0),   # odd dims + subsampling: MCU overhang
        (64, 48, 3, "444", 3),   # restart markers: coder+stats re-init
        (16, 16, 1, "444", 1),   # restart every MCU
        (8, 8, 1, "444", 0),     # single block
    ],
)
def test_jpeg_arith_decodes_identical_to_huffman(h, w, ch, sub, ri):
    """SOF9 arithmetic and SOF0 baseline transport the SAME quantized
    coefficients (_prepare_components is shared), so the decoded pixels
    must be bit-identical — this pins the whole QM coder + F.2.4
    statistics model round-trip."""
    from parquet_common_spark.functions.jpegarith import encode_jpeg_arith

    x = _arith_img(np.random.default_rng(1234 + h + w), h, w, ch)
    jh = J.encode_jpeg(x, quality=85, subsampling=sub, restart_interval=ri)
    ja = encode_jpeg_arith(x, quality=85, subsampling=sub, restart_interval=ri)
    wh, hh, ph = J.decode_jpeg(jh)
    wa, ha, pa = J.decode_jpeg(ja)
    assert (wa, ha) == (wh, hh) == (w, h)
    assert np.array_equal(pa, ph)


def test_jpeg_arith_compresses_tighter_than_huffman():
    """The point of arithmetic coding: adaptive probability estimation
    beats fixed Huffman tables.  If the Qe transcription were broken in
    a self-consistent way, the ratio would typically blow past 1.0 —
    this is the strongest indirect check available without third-party
    streams."""
    from parquet_common_spark.functions.jpegarith import encode_jpeg_arith

    x = _arith_img(np.random.default_rng(99), 96, 96, 3)
    jh = J.encode_jpeg(x, quality=85)
    ja = encode_jpeg_arith(x, quality=85)
    assert len(ja) < len(jh), (len(ja), len(jh))


def test_jpeg_arith_envelope_markers():
    from parquet_common_spark.functions.jpegarith import encode_jpeg_arith
    from parquet_common_spark.functions.mediacodec import jpeg_dimensions

    x = _arith_img(np.random.default_rng(5), 24, 40, 1)
    ja = encode_jpeg_arith(x, quality=90)
    assert b"\xff\xc9" in ja and b"\xff\xcc" in ja  # SOF9 + DAC
    assert b"\xff\xc4" not in ja  # no Huffman tables
    assert jpeg_dimensions(ja) == (40, 24)
    # arithmetic lossless (SOF11) stays out of envelope, explicit
    bad = ja.replace(b"\xff\xc9", b"\xff\xcb", 1)
    with pytest.raises(NotImplementedError, match="SOF11"):
        J.decode_jpeg(bad)


def test_jpeg_arith_qe_table_structure():
    """Structural sanity of the Table D.3 transcription: 113 adaptive
    states + fixed bin, all transitions in range, Qe bounded by 0x8000,
    switch only on states whose LPS self-transition flips MPS, and the
    fast-attack chain (0..13) walks NMPS to the steady region."""
    from parquet_common_spark.functions.jpegarith import _QE, FIXED_BIN

    assert len(_QE) == 114
    for i, (qe, nlps, nmps, sw) in enumerate(_QE):
        assert 0 < qe < 0x8000
        assert 0 <= nlps < 114 and 0 <= nmps < 114
        assert sw in (0, 1)
    qe, nlps, nmps, sw = _QE[FIXED_BIN]
    assert (nlps, nmps, sw) == (FIXED_BIN, FIXED_BIN, 0)
    # switch states are exactly the chain heads (MPS flip points)
    assert [i for i, e in enumerate(_QE[:113]) if e[3]] == [
        0, 14, 36, 64, 80, 88, 95, 105, 110, 112
    ]


@pytest.mark.parametrize(
    "h,w,ch,sub",
    [(32, 32, 1, "444"), (40, 24, 3, "444"), (33, 17, 3, "420"),
     (64, 48, 3, "444")],
)
def test_jpeg_arith_progressive_decodes_identical_to_baseline(h, w, ch, sub):
    """SOF10 (progressive arithmetic, Annex G.1.3 successive
    approximation through the QM coder) transports the same quantized
    coefficients as SOF0 — decoded pixels must be bit-identical.  This
    pins the DC first/refine, AC band first, and AC refinement
    procedures including the kex EOB-context rule."""
    from parquet_common_spark.functions.jpegarith import (
        encode_jpeg_arith_progressive,
    )

    x = _arith_img(np.random.default_rng(4321 + h * w), h, w, ch)
    jh = J.encode_jpeg(x, quality=85, subsampling=sub)
    jp = encode_jpeg_arith_progressive(x, quality=85, subsampling=sub)
    assert b"\xff\xca" in jp and b"\xff\xc4" not in jp
    wh, hh, ph = J.decode_jpeg(jh)
    wp, hp, pp = J.decode_jpeg(jp)
    assert (wp, hp) == (wh, hh) == (w, h)
    assert np.array_equal(pp, ph)


def test_jpeg_arith_progressive_equals_huffman_progressive():
    """Same scan script, same coefficients: SOF10 and SOF2 decode
    identically (transitively pins both progressive transports)."""
    from parquet_common_spark.functions.jpegarith import (
        encode_jpeg_arith_progressive,
    )

    x = _arith_img(np.random.default_rng(77), 48, 56, 3)
    ph = J.decode_jpeg(J.encode_jpeg_progressive(x, quality=80))[2]
    pa = J.decode_jpeg(encode_jpeg_arith_progressive(x, quality=80))[2]
    assert np.array_equal(pa, ph)


def test_jpeg_arith_roundtrip_hypothesis():
    """Property fuzz for BOTH arithmetic modes: random geometry,
    content regime, subsampling, and restarts — arithmetic pixels must
    equal baseline pixels for the same coefficients, always."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_common_spark.functions.jpegarith import (
        encode_jpeg_arith,
        encode_jpeg_arith_progressive,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(min_value=8, max_value=40),
        w=st.integers(min_value=8, max_value=40),
        ch=st.sampled_from([1, 3]),
        sub=st.sampled_from(["444", "420"]),
        regime=st.sampled_from(["noise", "smooth", "flat"]),
        q=st.sampled_from([30, 70, 95]),
        ri=st.sampled_from([0, 0, 2]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def prop(h, w, ch, sub, regime, q, ri, seed):
        rng = np.random.default_rng(seed)
        if regime == "noise":
            x = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        elif regime == "flat":
            x = np.full((h, w, ch), int(rng.integers(0, 256)), dtype=np.uint8)
        else:
            gx = np.linspace(0, 255, w)[None, :, None]
            gy = np.linspace(0, 255, h)[:, None, None]
            x = ((gx + gy) / 2).astype(np.uint8) * np.ones((1, 1, ch), np.uint8)
        if ch == 1:
            x = x[:, :, 0]
        base = J.decode_jpeg(J.encode_jpeg(x, quality=q, subsampling=sub))[2]
        seq = J.decode_jpeg(
            encode_jpeg_arith(x, quality=q, subsampling=sub, restart_interval=ri)
        )[2]
        assert np.array_equal(seq, base)
        prog = J.decode_jpeg(
            encode_jpeg_arith_progressive(x, quality=q, subsampling=sub)
        )[2]
        assert np.array_equal(prog, base)

    prop()


def test_qm_coder_entropy_efficiency():
    """Compression-efficiency pin for the Qe state machine: coding a
    Bernoulli(p) source through ONE adaptive bin must approach the
    binary entropy H(p).  A corrupted Qe VALUE (the failure mode the
    round-trip tests cannot see, since encoder and decoder share the
    table) degrades efficiency measurably — e.g. zeroing out the
    adaptation or mis-transcribing a steady-state Qe row pushes the
    skewed-source rates well above these bounds."""
    import math
    import random

    from parquet_common_spark.functions.jpegarith import (
        ArithDecoder,
        ArithEncoder,
    )

    rnd = random.Random(99)
    n = 60_000
    for p, max_ratio in ((0.5, 1.06), (0.9, 1.12), (0.99, 1.25), (0.999, 1.6)):
        bits = [1 if rnd.random() < p else 0 for _ in range(n)]
        enc = ArithEncoder()
        stats = bytearray(1)
        for b in bits:
            enc.encode(stats, 0, b)
        data = enc.finish()
        h = -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
        rate = len(data) * 8 / n
        assert rate <= h * max_ratio + 0.01, (p, rate, h)
        # and it still decodes
        dec = ArithDecoder(data)
        dstats = bytearray(1)
        assert all(dec.decode(dstats, 0) == b for b in bits)
