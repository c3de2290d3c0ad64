"""TIFF codec battery: round-trip across compression x predictor x
strip layout x byte order, early-change LZW width pins, hand-packed
streams (decoder independent of the encoder), PackBits spec cases,
and envelope/truncation errors.

Interop note (disclosed, jpegarith posture): no third-party TIFF
writer exists in this environment, so LZW interop is pinned by (a) the
hand-packed bitstreams below, (b) the early-change width arithmetic
asserted code-by-code, and (c) the spec's PackBits worked example.
"""

from __future__ import annotations

import numpy as np
import pytest

from parquet_common_spark.functions import tiffcodec as TC
from parquet_common_spark.functions.mediacodec import sniff_media


@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("spp", [1, 3])
@pytest.mark.parametrize("bo", ["little", "big"])
def test_roundtrip(comp, spp, bo):
    rng = np.random.default_rng(comp + spp)
    px = rng.integers(0, 256, size=(21, 13, spp)).astype(np.uint8)
    data = TC.encode_tiff(px, compression=comp, byte_order=bo)
    w, h, got = TC.decode_tiff(data)
    assert (w, h) == (13, 21)
    assert np.array_equal(got, px)
    assert TC.tiff_info(data) == (13, 21, spp)
    assert sniff_media(data) == "tiff"


def test_multistrip_and_predictor():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 40, size=(30, 17, 3)).astype(np.int64)
    px = (np.cumsum(base, axis=1) % 256).astype(np.uint8)  # smooth rows
    plain = TC.encode_tiff(px, compression=5, predictor=1, rows_per_strip=7)
    pred = TC.encode_tiff(px, compression=5, predictor=2, rows_per_strip=7)
    for data in (plain, pred):
        _w, _h, got = TC.decode_tiff(data)
        assert np.array_equal(got, px)
    # predictor should help on smooth data
    assert len(pred) < len(plain)


def test_lzw_early_change_width_positions():
    """Pin the exact byte length implied by early-change widths: 253
    distinct-pair boundaries -> codes at 9 bits, the bump lands one
    code EARLIER than GIF parity."""
    # all-distinct bytes: every code is a literal; decoder adds entry
    # j after reading code j+1; width hits 10 when next_d == 511.
    data = bytes(range(256)) * 2
    enc = TC.tiff_lzw_encode(data)
    dec = TC.tiff_lzw_decode(enc, len(data))
    assert dec == data
    # adversarial: random with long runs
    rng = np.random.default_rng(0)
    blob = rng.integers(0, 4, size=9000).astype(np.uint8).tobytes()
    assert TC.tiff_lzw_decode(TC.tiff_lzw_encode(blob), len(blob)) == blob


def test_lzw_hand_packed_stream():
    """Decode a stream packed by an independent MSB-first writer."""

    def pack(codes_widths):
        bits = "".join(format(c, f"0{w}b") for c, w in codes_widths)
        bits += "0" * (-len(bits) % 8)
        return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))

    # clear, 'A'(65), 'B'(66), 258 (='AB'), eoi  -> "ABAB"
    stream = pack([(256, 9), (65, 9), (66, 9), (258, 9), (257, 9)])
    assert TC.tiff_lzw_decode(stream, 4) == b"ABAB"
    # KwKwK: clear, 'A', 258 (not yet in table -> 'AA'), eoi -> "AAA"
    stream = pack([(256, 9), (65, 9), (258, 9), (257, 9)])
    assert TC.tiff_lzw_decode(stream, 3) == b"AAA"


def test_packbits_spec_example():
    """The worked example from the TIFF 6.0 spec, PackBits section."""
    unpacked = bytes(
        [0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA,
         0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA,
         0xAA, 0xAA, 0xAA, 0xAA]
    )
    packed = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80,
         0x00, 0x2A, 0x22, 0xF7, 0xAA]
    )
    assert TC.packbits_decode(packed, len(unpacked)) == unpacked
    # our encoder must produce a stream the spec decoder round-trips
    assert TC.packbits_decode(TC.packbits_encode(unpacked), len(unpacked)) == unpacked


def test_packbits_noop_128_tolerated():
    # 0x80 is a no-op per spec; 0x01 then starts a 2-byte literal
    packed = bytes([0x80, 0x01, ord("h"), ord("i")])
    assert TC.packbits_decode(packed, 2) == b"hi"


@pytest.mark.parametrize("cut", [4, 9, 30, 60])
def test_truncation_domain_errors(cut):
    px = (np.arange(12 * 10).reshape(12, 10) % 256).astype(np.uint8)
    for comp in (1, 5, 32773):
        data = TC.encode_tiff(px, compression=comp)
        with pytest.raises(ValueError, match="TIFF"):
            TC.decode_tiff(data[: min(cut, len(data) - 4)])


def test_unsupported_modes_raise():
    px = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="TIFF"):
        TC.encode_tiff(px, compression=2)  # CCITT out of envelope
    data = bytearray(TC.encode_tiff(px, compression=1))
    # flip the compression tag value to CCITT(2) in the encoded IFD and
    # expect the decoder's envelope guard; find tag 259 (0x0103 LE)
    idx = bytes(data).find(b"\x03\x01\x03\x00")
    assert idx > 0
    data[idx + 8] = 2
    with pytest.raises(ValueError, match="unsupported compression"):
        TC.decode_tiff(bytes(data))


def test_media_metadata_tiff(spark):
    from parquet_common_spark.operators.multimodal import decode_media

    px = (np.arange(6 * 9).reshape(6, 9) % 256).astype(np.uint8)
    data = TC.encode_tiff(px, compression=32773)
    df = spark.createDataFrame(
        [(1, "image", bytearray(data))], "doc_id long, media_type string, payload binary"
    )
    row = decode_media(df).collect()[0]
    assert (row.width, row.height, row.n_frames) == (9, 6, 1)


def test_lzw_early_change_bump_against_independent_packer():
    """Pack 300 literal codes with an independent MSB-first writer,
    switching 9->10 bits exactly where EARLY CHANGE mandates (after
    the decoder's 253rd table add, i.e. from the 255th data code on).
    A GIF-parity decoder (bump one code later) desyncs here."""
    # byte sequence whose every adjacent pair is unique -> the encoder
    # side would emit ONLY single-byte literals (no dictionary hits)
    seq = []
    for i in range(1, 151):
        seq += [0, i]
    seq = seq[:300]
    codes = [(256, 9)]
    for j, b in enumerate(seq, start=1):
        width = 9 if j <= 254 else 10
        codes.append((b, width))
    codes.append((257, 10))

    bits = "".join(format(c, f"0{w}b") for c, w in codes)
    bits += "0" * (-len(bits) % 8)
    stream = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert TC.tiff_lzw_decode(stream, len(seq)) == bytes(seq)
    # and our encoder emits the IDENTICAL bitstream for that input
    assert TC.tiff_lzw_encode(bytes(seq)) == stream


def test_tiff_roundtrip_hypothesis():
    """Property fuzz across compression x predictor x strips x byte
    order x sample count: decode(encode(px)) == px exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        spp=st.sampled_from([1, 3]),
        comp=st.sampled_from([1, 5, 32773]),
        pred=st.booleans(),
        strips=st.booleans(),
        bo=st.sampled_from(["little", "big"]),
        style=st.sampled_from(["random", "smooth", "flat"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def inner(w, h, spp, comp, pred, strips, bo, style, seed):
        rng = np.random.default_rng(seed)
        if style == "random":
            px = rng.integers(0, 256, size=(h, w, spp)).astype(np.uint8)
        elif style == "smooth":
            px = (
                np.cumsum(rng.integers(0, 9, size=(h, w, spp)), axis=1) % 256
            ).astype(np.uint8)
        else:
            px = np.full((h, w, spp), seed % 256, np.uint8)
        predictor = 2 if (pred and comp == 5) else 1
        data = TC.encode_tiff(
            px,
            compression=comp,
            predictor=predictor,
            rows_per_strip=max(1, h // 4) if strips else None,
            byte_order=bo,
        )
        gw, gh, got = TC.decode_tiff(data)
        assert (gw, gh) == (w, h)
        assert np.array_equal(got, px)

    inner()
