"""FLAC codec pins: lossless, so every decode(encode(x)) must be
BIT-EXACT across the full (stereo mode x subframe type x partition
order) matrix, plus the LPC and wasted-bits paths the fixed-predictor
encoder wouldn't otherwise reach, plus CRC/truncation error surfaces."""

from __future__ import annotations

import struct

import numpy as np
import pytest

import parquet_common_spark.functions.flaccodec as FC


def _sig(n=3000, channels=2, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    cols = [
        (6000 * np.sin(2 * np.pi * 440 * t)).astype(np.int64),
        (4000 * np.sin(2 * np.pi * 523 * t)
         + rng.integers(-50, 50, n)).astype(np.int64),
    ]
    return np.stack(cols[:channels], axis=1)


@pytest.mark.parametrize("mode", ["indep", "ls", "rs", "ms"])
@pytest.mark.parametrize("sub", ["verbatim", "fixed0", "fixed1", "fixed2",
                                 "fixed3", "fixed4", "lpc"])
def test_flac_roundtrip_matrix(mode, sub):
    sig = _sig()
    for porder in (0, 2):
        data = FC.flac_encode(sig, 8000, 16, blocksize=512,
                              stereo_mode=mode, subframe=sub,
                              partition_order=porder)
        pcm, rate = FC.flac_samples(data)
        assert rate == 8000
        assert np.array_equal(pcm, sig), (mode, sub, porder)


def test_flac_constant_mono_and_info():
    const = np.full((1000, 1), -12345, dtype=np.int64)
    d = FC.flac_encode(const, 44100, 16, blocksize=500, subframe="constant")
    pcm, rate = FC.flac_samples(d)
    assert np.array_equal(pcm, const) and rate == 44100
    assert FC.flac_info(d) == (1, 44100, 16, 1000)
    # constant coding collapses 2000 bytes of PCM to tens of bytes
    assert len(d) < 100


def test_flac_wasted_bits():
    # every sample divisible by 4: encoder emits wasted=2, decoder
    # must shift back (the path a fixed-point synth hits)
    sig = (_sig(1024, 1) & ~np.int64(3))
    d = FC.flac_encode(sig, 8000, 16, blocksize=256,
                       subframe="fixed2", wasted_bits=2)
    pcm, _ = FC.flac_samples(d)
    assert np.array_equal(pcm, sig)


def test_flac_partial_final_block_and_odd_blocksize():
    sig = _sig(777, 2)  # 777 = 3 blocks of 256 + 9
    d = FC.flac_encode(sig, 16000, 16, blocksize=256, stereo_mode="ms")
    pcm, rate = FC.flac_samples(d)
    assert rate == 16000 and np.array_equal(pcm, sig)


def test_flac_crc_corruption_detected():
    sig = _sig(512, 1)
    d = bytearray(FC.flac_encode(sig, 8000, 16, blocksize=512))
    # flip a bit in the last byte before the frame CRC-16
    d[-3] ^= 0x01
    with pytest.raises(ValueError, match="CRC-16"):
        FC.flac_samples(bytes(d))
    # corrupt the frame header's blocksize field: CRC-8 catches it
    d2 = bytearray(FC.flac_encode(sig, 8000, 16, blocksize=512))
    hdr = d2.find(b"\xff\xf8")
    d2[hdr + 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC-8|sync"):
        FC.flac_samples(bytes(d2))


def test_flac_error_surfaces():
    with pytest.raises(ValueError, match="magic"):
        FC.flac_samples(b"RIFFxxxxWAVE")
    sig = _sig(512, 1)
    d = FC.flac_encode(sig, 8000, 16, blocksize=512)
    with pytest.raises(ValueError, match="truncated|sync|CRC"):
        FC.flac_samples(d[: len(d) - 40])


def test_flac_utf8_frame_numbers():
    # >128 frames forces multi-byte UTF-8-coded frame numbers
    sig = _sig(140 * 64, 1)
    d = FC.flac_encode(sig, 8000, 16, blocksize=64)
    pcm, _ = FC.flac_samples(d)
    assert np.array_equal(pcm, sig)


def test_flac_crc_vectors():
    # CRC-8 poly 0x07 / CRC-16 poly 0x8005 published check values
    assert FC.crc8(b"123456789") == 0xF4
    assert FC.crc16(b"123456789") == 0xFEE8


def test_flac_roundtrip_hypothesis():
    """Property fuzz: arbitrary int16 PCM, arbitrary length/blocksize/
    mode/subframe combinations — decode(encode(x)) == x always."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=700),
        channels=st.integers(min_value=1, max_value=2),
        blocksize=st.sampled_from([64, 192, 256, 333]),
        mode=st.sampled_from(["indep", "ls", "rs", "ms"]),
        sub=st.sampled_from(["verbatim", "fixed0", "fixed1", "fixed2",
                             "fixed3", "fixed4", "lpc"]),
        porder=st.integers(min_value=0, max_value=3),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def prop(n, channels, blocksize, mode, sub, porder, seed):
        rng = np.random.default_rng(seed)
        # mix of smooth and noisy content (predictors see both regimes)
        t = np.arange(n)
        smooth = (3000 * np.sin(t / 7.0)).astype(np.int64)
        noise = rng.integers(-32768, 32767, n)
        x = np.stack(
            [smooth if c % 2 == 0 else noise for c in range(channels)],
            axis=1,
        )
        if channels == 1 and mode != "indep":
            mode = "indep"
        d = FC.flac_encode(x, 8000, 16, blocksize=blocksize,
                           stereo_mode=mode, subframe=sub,
                           partition_order=porder)
        pcm, rate = FC.flac_samples(d)
        assert rate == 8000
        assert np.array_equal(pcm, x)

    prop()


# ------------------------------------------- native kernel (round 9)


def test_flac_native_kernel_available():
    """This environment has a C compiler; the subframe kernel must
    build (elsewhere the pure path is the documented fallback)."""
    assert FC._native_kernel() is not None


@pytest.mark.parametrize("mode", ["indep", "ls", "rs", "ms"])
@pytest.mark.parametrize("sub", ["verbatim", "fixed0", "fixed2",
                                 "fixed4", "lpc"])
def test_flac_engines_bit_identical(mode, sub):
    """reference (pure Python, error-path authority) vs native (C
    kernel): BIT-IDENTICAL samples across subframe types x stereo
    modes x partition orders — the FLAC arm of the JPEG/PNG
    two-engine discipline."""
    if FC._native_kernel() is None:
        pytest.skip("no C compiler")
    sig = _sig()
    for porder in (0, 2):
        data = FC.flac_encode(sig, 8000, 16, blocksize=512,
                              stereo_mode=mode, subframe=sub,
                              partition_order=porder)
        ref, r1 = FC.flac_samples(data, engine="reference")
        nat, r2 = FC.flac_samples(data, engine="native")
        assert r1 == r2 == 8000
        assert np.array_equal(ref, nat), (mode, sub, porder)


def test_flac_engines_error_parity_on_truncation():
    """Both engines surface mid-subframe truncation as the SAME
    domain ValueError (never IndexError or garbage samples)."""
    sig = _sig(512, 1)
    d = FC.flac_encode(sig, 8000, 16, blocksize=512)
    for cut in (len(d) - 40, len(d) - 150):
        for eng in ("reference", "native"):
            if eng == "native" and FC._native_kernel() is None:
                continue
            with pytest.raises(ValueError, match="FLAC:"):
                FC.flac_samples(d[:cut], engine=eng)


def test_flac_truncated_at_footer_crc_is_domain_error():
    """A stream cut exactly at the frame footer CRC-16 raises the
    module's ValueError('FLAC: ...'), not IndexError (round-8 advice:
    data[br.byte + 1] was unguarded)."""
    sig = _sig(512, 1)
    d = FC.flac_encode(sig, 8000, 16, blocksize=512)
    # the final frame ends with 2 CRC bytes; cut inside them
    for drop in (1, 2):
        for eng in ("reference", "native"):
            if eng == "native" and FC._native_kernel() is None:
                continue
            with pytest.raises(ValueError, match="FLAC:"):
                FC.flac_samples(d[: len(d) - drop], engine=eng)


def test_flac_crc_kernel_matches_pure_tables():
    """Kernel CRCs == pure-Python table CRCs on randomized buffers
    (the frame-verify path dispatches to the kernel when present)."""
    if FC._native_kernel() is None:
        pytest.skip("no C compiler")
    rng = np.random.default_rng(3)
    for n in (0, 1, 7, 256, 4096):
        buf = bytes(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        r8 = 0
        for b in buf:
            r8 = FC._CRC8[r8 ^ b]
        r16 = 0
        for b in buf:
            r16 = FC._CRC16[((r16 >> 8) ^ b) & 0xFF] ^ ((r16 << 8) & 0xFFFF)
        assert FC.crc8(buf) == r8
        assert FC.crc16(buf) == r16
