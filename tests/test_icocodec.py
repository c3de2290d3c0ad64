"""ICO container: DIB/PNG entry roundtrips, the doubled-height + AND
mask quirks, the legacy all-zero-alpha heuristic, envelope guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from parquet_common_spark.functions.icocodec import (
    decode_ico,
    encode_ico,
    ico_entries,
)


def _rgba(h, w, seed=0, holes=True):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    img[:, :, 3] = 255
    if holes:
        img[rng.random((h, w)) < 0.3, 3] = 0  # transparent pixels
    return img


@pytest.mark.parametrize("hw", [(1, 1), (5, 7), (16, 16), (33, 9)])
def test_roundtrip_dib_entry(hw):
    img = _rgba(*hw, seed=hw[0])
    data = encode_ico([img])
    got = decode_ico(data)
    # transparent pixels: alpha 0 survives; RGB under a masked pixel is
    # still the stored XOR color
    np.testing.assert_array_equal(got, img)


def test_roundtrip_png_entry_and_mixed_directory():
    a = _rgba(6, 6, seed=1)
    b = _rgba(4, 10, seed=2, holes=False)
    data = encode_ico([a, b], as_png=[True, False])
    ents = ico_entries(data)
    assert [e["is_png"] for e in ents] == [True, False]
    assert (ents[0]["width"], ents[0]["height"]) == (6, 6)
    np.testing.assert_array_equal(decode_ico(data, 0), a)
    np.testing.assert_array_equal(decode_ico(data, 1), b)


def test_256px_encodes_as_zero_byte():
    img = _rgba(256, 256, seed=3, holes=False)
    data = encode_ico([img])
    # directory bytes store 256 as 0
    assert data[6] == 0 and data[7] == 0
    assert ico_entries(data)[0]["width"] == 256
    got = decode_ico(data)
    np.testing.assert_array_equal(got, img)


def test_legacy_zero_alpha_heuristic_and_mask():
    """A 32-bit DIB whose alpha channel is ALL zero is legacy-unused:
    opacity comes from the AND mask alone."""
    img = _rgba(3, 3, seed=4, holes=False)
    data = bytearray(encode_ico([img]))
    ents = ico_entries(bytes(data))
    off = ents[0]["offset"] + 40  # info header
    # zero every alpha byte in the BGRA rows (stride = 3*4 -> 12, no pad)
    for r in range(3):
        for c in range(3):
            data[off + r * 12 + c * 4 + 3] = 0
    got = decode_ico(bytes(data))
    # mask has no bits set (img was fully opaque) -> fully opaque output
    assert (got[:, :, 3] == 255).all()
    np.testing.assert_array_equal(got[:, :, :3], img[:, :, :3])


def test_hand_packed_mask_forces_transparency():
    """A set AND-mask bit forces transparency even over opaque alpha."""
    img = _rgba(1, 2, seed=5, holes=False)
    data = bytearray(encode_ico([img]))
    ents = ico_entries(bytes(data))
    # mask rows start after header(40) + xor rows (1 row * 8 bytes)
    mask_off = ents[0]["offset"] + 40 + 8
    data[mask_off] = 0b10000000  # first pixel transparent
    got = decode_ico(bytes(data))
    assert got[0, 0, 3] == 0 and got[0, 1, 3] == 255


def test_envelope_guards():
    img = _rgba(2, 2)
    data = encode_ico([img])
    with pytest.raises(ValueError, match="magic"):
        decode_ico(b"\x01\x00" + data[2:])
    with pytest.raises(ValueError, match="CUR"):
        decode_ico(data[:2] + b"\x02\x00" + data[4:])
    with pytest.raises(ValueError, match="out of range"):
        decode_ico(data, 5)
    with pytest.raises(ValueError, match="RGBA"):
        encode_ico([np.zeros((2, 2, 3), np.uint8)])
    # compressed DIB entry refused
    bad = bytearray(data)
    off = ico_entries(data)[0]["offset"]
    struct.pack_into("<I", bad, off + 16, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        decode_ico(bytes(bad))


def test_hypothesis_fuzz_roundtrip():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        png=st.booleans(),
        holes=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def inner(h, w, png, holes, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        if holes:
            img[:, :, 3] = np.where(rng.random((h, w)) < 0.5, 0, 255)
        else:
            img[:, :, 3] = 255
        data = encode_ico([img], as_png=[png])
        np.testing.assert_array_equal(decode_ico(data), img)

    inner()


def test_png_entry_16bit_scales_to_8bit():
    # a 16-bit PNG icon entry must scale samples >> 8, not truncate
    import struct as _struct

    from parquet_common_spark.functions.mediacodec import encode_png

    px16 = np.array(
        [[[0xFF00, 0x8000, 0x0100, 0xFFFF]],
         [[0x0000, 0x00FF, 0xABCD, 0x8080]]],
        dtype=np.uint16,
    )  # 2x1 RGBA, deliberately non-trivial low bytes
    payload = encode_png(px16, bitdepth=16)
    icondir = _struct.pack("<HHH", 0, 1, 1)
    entry = _struct.pack(
        "<BBBBHHII", 1, 2, 0, 0, 1, 32, len(payload), 6 + 16
    )
    got = decode_ico(icondir + entry + payload)
    assert got.dtype == np.uint8 and got.shape == (2, 1, 4)
    assert np.array_equal(got, (px16 >> 8).astype(np.uint8))
