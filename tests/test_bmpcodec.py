"""BMP codec: roundtrips across the parameter matrix, hand-packed
fixtures for decode-only paths (16/32-bit, RLE escapes), envelope
guards, and a hypothesis fuzz round (the GIF/TIFF codec discipline)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from parquet_common_spark.functions.bmpcodec import (
    decode_bmp,
    encode_bmp,
)


def _img_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _pal(k):
    return np.stack(
        [(np.arange(k) * 17) % 256, (np.arange(k) * 29) % 256, (np.arange(k) * 43) % 256],
        axis=1,
    ).astype(np.uint8)


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("hw", [(1, 1), (3, 5), (7, 4), (16, 16)])
def test_roundtrip_24bit(hw, top_down):
    img = _img_rgb(*hw, seed=hw[0] * 7 + top_down)
    data = encode_bmp(img, bits=24, top_down=top_down)
    assert data[:2] == b"BM"
    got = decode_bmp(data)
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("bits,k", [(8, 256), (8, 5), (4, 16), (4, 3), (1, 2)])
@pytest.mark.parametrize("top_down", [False, True])
def test_roundtrip_palette(bits, k, top_down):
    rng = np.random.default_rng(bits * 31 + k)
    idx = rng.integers(0, k, (9, 13), dtype=np.uint8)
    pal = _pal(k)
    data = encode_bmp(idx, bits=bits, palette=pal, top_down=top_down)
    got = decode_bmp(data)
    np.testing.assert_array_equal(got, pal[idx])


@pytest.mark.parametrize("top_down", [False, True])
def test_roundtrip_rle8(top_down):
    # long runs + singletons + a 300-pixel run (forces run splitting at 255)
    idx = np.zeros((4, 300), np.uint8)
    idx[1, :] = 7
    idx[2, 0::2] = 3
    idx[3, 250:] = 9
    pal = _pal(10)
    data = encode_bmp(idx, bits=8, palette=pal, rle=True, top_down=top_down)
    got = decode_bmp(data)
    np.testing.assert_array_equal(got, pal[idx])


def _hand_bmp(width, height, bits, compression, payload, palette=b""):
    offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bits, compression,
        len(payload), 2835, 2835, len(palette) // 4, 0,
    )
    fhdr = struct.pack("<2sIHHI", b"BM", offset + len(payload), 0, 0, offset)
    return fhdr + info + palette + payload


def test_hand_packed_24bit_bottom_up():
    """2x2 bottom-up 24-bit: stored rows are (bottom), (top); BGR order;
    stride padded 6 -> 8."""
    bottom = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"   # blue px, green px
    top = bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # red px, white px
    data = _hand_bmp(2, 2, 24, 0, bottom + top)
    got = decode_bmp(data)
    expect = np.array(
        [[[255, 0, 0], [255, 255, 255]], [[0, 0, 255], [0, 255, 0]]], np.uint8
    )
    np.testing.assert_array_equal(got, expect)


def test_hand_packed_32bit_and_16bit():
    # 1x2 top-down 32-bit BGRX
    payload = bytes([10, 20, 30, 0, 40, 50, 60, 0])
    got = decode_bmp(_hand_bmp(2, -1, 32, 0, payload))
    np.testing.assert_array_equal(
        got, np.array([[[30, 20, 10], [60, 50, 40]]], np.uint8)
    )
    # 1x1 top-down 16-bit X1R5G5B5: r=31 g=0 b=15
    v = (31 << 10) | (0 << 5) | 15
    payload16 = struct.pack("<H", v) + b"\x00\x00"
    got16 = decode_bmp(_hand_bmp(1, -1, 16, 0, payload16))
    # 5->8 bit replication: 31 -> 255, 15 -> 123
    np.testing.assert_array_equal(got16, np.array([[[255, 0, 123]]], np.uint8))


def test_hand_packed_rle8_escapes():
    """RLE8 with encoded runs, absolute mode, delta, EOL, EOB — skipped
    pixels resolve to palette index 0."""
    pal = _pal(8)
    palette = np.zeros((8, 4), np.uint8)
    palette[:, :3] = pal[:, ::-1]
    # bottom-up 2 rows, width 6.
    # stored row 0 (bottom): run 3x idx1; absolute 3 literals 2,3,4; EOL
    # stored row 1 (top): delta dx=2 (skips 2 -> idx0); run 4x idx5; EOB
    stream = bytes(
        [3, 1, 0, 3, 2, 3, 4, 0x00, 0, 0, 0, 2, 2, 0, 4, 5, 0, 1]
    )
    data = _hand_bmp(6, 2, 8, 1, stream, palette.tobytes())
    got = decode_bmp(data)
    top_idx = [0, 0, 5, 5, 5, 5]
    bottom_idx = [1, 1, 1, 2, 3, 4]
    np.testing.assert_array_equal(got[0], pal[np.array(top_idx)])
    np.testing.assert_array_equal(got[1], pal[np.array(bottom_idx)])


def test_hand_packed_rle4_nibbles():
    pal = _pal(16)
    palette = np.zeros((16, 4), np.uint8)
    palette[:, :3] = pal[:, ::-1]
    # width 5, one row: run 5 of alternating nibbles 0xAB -> A B A B A,
    # then EOB.  (A=10, B=11)
    stream = bytes([5, 0xAB, 0, 1])
    data = _hand_bmp(5, 1, 4, 2, stream, palette.tobytes())
    got = decode_bmp(data)
    np.testing.assert_array_equal(got[0], pal[np.array([10, 11, 10, 11, 10])])


def test_envelope_guards():
    img = _img_rgb(2, 2)
    data = encode_bmp(img)
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + data[2:])
    with pytest.raises(ValueError, match="compression"):
        bad = bytearray(data)
        struct.pack_into("<I", bad, 14 + 16, 3)  # BI_BITFIELDS
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(data[:-3])
    with pytest.raises(ValueError, match="palette"):
        encode_bmp(np.zeros((2, 2), np.uint8), bits=8)
    with pytest.raises(ValueError, match="RLE"):
        encode_bmp(img, bits=24, rle=True)


def test_hypothesis_fuzz_roundtrip():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        bits=st.sampled_from([24, 8, 4, 1]),
        rle=st.booleans(),
        top_down=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def inner(h, w, bits, rle, top_down, seed):
        rng = np.random.default_rng(seed)
        if bits == 24:
            if rle:
                return
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            data = encode_bmp(img, bits=24, top_down=top_down)
            np.testing.assert_array_equal(decode_bmp(data), img)
        else:
            if rle and bits != 8:
                return
            k = 1 << bits
            idx = rng.integers(0, k, (h, w), dtype=np.uint8)
            pal = _pal(k)
            data = encode_bmp(
                idx, bits=bits, palette=pal, rle=rle, top_down=top_down
            )
            np.testing.assert_array_equal(decode_bmp(data), pal[idx])

    inner()


def test_rle_encode_is_always_bottom_up():
    # BI_RLE8 with negative biHeight is invalid per the DIB spec: the
    # encoder must store RLE bottom-up even when top_down is requested,
    # and the round-trip must still return the same image.
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 8, size=(6, 9)).astype(np.uint8)
    pal = np.stack([np.arange(8) * 31 % 256] * 3, axis=1).astype(np.uint8)
    data = encode_bmp(idx, bits=8, palette=pal, rle=True, top_down=True)
    height = struct.unpack_from("<i", data, 14 + 8)[0]
    assert height > 0  # bottom-up stored
    assert np.array_equal(decode_bmp(data), pal[idx])
