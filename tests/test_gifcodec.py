"""GIF codec battery: round-trip across palette sizes / interlace /
multi-frame, LZW table overflow + KwKwK, transparency and disposal
compositing, an INDEPENDENTLY hand-packed bitstream (decoder is not
just the encoder's mirror), and truncation error parity."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_common_spark.functions import gifcodec as GC
from parquet_common_spark.functions.mediacodec import sniff_media


def _pal(k: int) -> np.ndarray:
    i = np.arange(k)
    return np.stack([(i * 17) % 256, (i * 29) % 256, (i * 43) % 256], 1).astype(np.uint8)


@pytest.mark.parametrize("k", [4, 16, 64, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip(k, interlace):
    rng = np.random.default_rng(k + interlace)
    w, h, n = 23, 17, 2
    frames = rng.integers(0, k, size=(n, h, w)).astype(np.uint8)
    pal = _pal(k)
    data = GC.encode_gif(frames, pal, interlace=interlace, disposal=1)
    got, delays = GC.gif_frames(data)
    assert got.shape == (n, h, w, 3)
    for f in range(n):
        assert np.array_equal(got[f], pal[frames[f]])
    assert GC.gif_info(data) == (w, h, n)
    assert sniff_media(data) == "gif"


def test_lzw_table_overflow_emits_clear_and_survives():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(180, 200)).astype(np.uint8)
    data = GC.encode_gif(img, _pal(256))
    got, _ = GC.gif_frames(data)
    assert np.array_equal(got[0], _pal(256)[img])


def test_kwkwk_case():
    # 'aaaa...' forces code == next_code immediately after table adds
    img = np.zeros((1, 64), dtype=np.uint8)
    data = GC.encode_gif(img, _pal(4))
    got, _ = GC.gif_frames(data)
    assert np.array_equal(got[0], np.broadcast_to(_pal(4)[0], (1, 64, 3)))


def test_single_pixel_and_tall_interlace():
    # interlace pass boundaries: heights 1..9 hit every pass subset
    for h in range(1, 10):
        img = (np.arange(h * 3).reshape(h, 3) % 16).astype(np.uint8)
        data = GC.encode_gif(img, _pal(16), interlace=True)
        got, _ = GC.gif_frames(data)
        assert np.array_equal(got[0], _pal(16)[img])


def test_transparency_and_disposal_restore_previous():
    pal = np.array([[9, 9, 9], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)
    frames = np.zeros((2, 8, 8), np.uint8)
    frames[0, :, :] = 1
    frames[1, 2:4, 2:4] = 2  # rest transparent (index 0)
    data = GC.encode_gif(frames, pal, transparent_index=0, disposal=3)
    got, _ = GC.gif_frames(data)
    assert np.array_equal(got[0][0, 0], pal[1])
    # disposal 3 restored the background before frame 1; transparent
    # pixels show it, opaque block shows green
    assert np.array_equal(got[1][0, 0], pal[0])
    assert np.array_equal(got[1][2, 2], pal[2])


def test_disposal_restore_background():
    pal = _pal(4)
    frames = np.zeros((2, 4, 4), np.uint8)
    frames[0, :, :] = 3
    frames[1, 0, 0] = 2
    data = GC.encode_gif(frames, pal, transparent_index=1, disposal=2)
    got, _ = GC.gif_frames(data)
    assert np.array_equal(got[0][3, 3], pal[3])
    # after restore-to-background, untouched pixels are bg color (0)
    assert np.array_equal(got[1][3, 3], pal[0])


def test_delays_round_trip():
    frames = np.zeros((3, 2, 2), np.uint8)
    data = GC.encode_gif(frames, _pal(4), delays=[10, 20, 30])
    _got, delays = GC.gif_frames(data)
    assert delays == [10, 20, 30]


def _pack_codes(codes_widths: list[tuple[int, int]]) -> bytes:
    """Independent LSB-first bit packer (deliberately written in a
    different style from the codec's emit())."""
    bits = "".join(format(c, f"0{w}b")[::-1] for c, w in codes_widths)
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i : i + 8][::-1], 2) for i in range(0, len(bits), 8))


def test_decode_hand_packed_stream():
    # 2x2 image, palette 4 (mcs=2, clear=4, eoi=5, first code width 3):
    # pixels [0,1,1,0] encoded WITHOUT any compression wins:
    # clear(4), 0, 1, then "1,0": after codes 0 and 1 the table holds
    # 6:{0,1}; encoder emitting literals only is also a VALID stream:
    # clear,0,1,1,0,eoi — after the decoder's 2nd table add next_code
    # hits 8 == 1<<3, so the 4th data code and EOI are packed 4-bit.
    codes = [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]
    lzw = _pack_codes(codes)
    hdr = b"GIF89a" + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    hdr += bytes([0x80 | 1, 0, 0])  # GCT 4 entries, bg 0, aspect 0
    hdr += _pal(4).tobytes()
    img = bytes([0x2C]) + (0).to_bytes(2, "little") * 2
    img += (2).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00"
    img += bytes([2])  # LZW min code size
    img += bytes([len(lzw)]) + lzw + b"\x00"
    data = hdr + img + b"\x3B"
    got, _ = GC.gif_frames(data)
    exp = _pal(4)[np.array([[0, 1], [1, 0]], np.uint8)]
    assert np.array_equal(got[0], exp)
    assert GC.gif_info(data) == (2, 2, 1)


def test_decode_hand_packed_with_dictionary_hit():
    # pixels [1,2,1,2,1,2]: literal 1, literal 2, then code 6 ({1,2}),
    # then code 8 == KwKwK?  No: after 1,2 table has 6:{1,2}; emitting
    # 6 adds 7:{2,1}; then remaining "1,2" -> emit 6 again... stream:
    # clear,1,2,6,6,eoi decodes to 1,2,1,2,1,2 (width bumps to 4 after
    # the add following the first 6).
    codes = [(4, 3), (1, 3), (2, 3), (6, 3), (6, 4), (5, 4)]
    lzw = _pack_codes(codes)
    hdr = b"GIF87a" + (6).to_bytes(2, "little") + (1).to_bytes(2, "little")
    hdr += bytes([0x80 | 1, 0, 0]) + _pal(4).tobytes()
    img = bytes([0x2C]) + (0).to_bytes(2, "little") * 2
    img += (6).to_bytes(2, "little") + (1).to_bytes(2, "little") + b"\x00"
    img += bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00"
    data = hdr + img + b"\x3B"
    got, _ = GC.gif_frames(data)
    exp = _pal(4)[np.array([[1, 2, 1, 2, 1, 2]], np.uint8)]
    assert np.array_equal(got[0], exp)


@pytest.mark.parametrize("cut", [3, 12, 25, 40])
def test_truncation_raises_domain_error(cut):
    img = (np.arange(48).reshape(6, 8) % 16).astype(np.uint8)
    data = GC.encode_gif(img, _pal(16))
    trunc = data[: min(cut, len(data) - 2)]
    with pytest.raises(ValueError, match="GIF"):
        GC.gif_frames(trunc)


def test_bad_signature_and_bad_index():
    with pytest.raises(ValueError, match="GIF"):
        GC.gif_frames(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="palette"):
        GC.encode_gif(np.array([[5]], np.uint8), _pal(4))


def test_frame_sampling_gif_payloads(spark):
    """Animated GIFs through the sample_frames operator: every_k
    sampling, PNG re-encode of composited frames."""
    from parquet_common_spark.functions.mediacodec import decode_png
    from parquet_common_spark.operators.multimodal import sample_frames

    pal = _pal(16)
    rows = []
    for d in range(4):
        frames = ((np.arange(5 * 6 * 7).reshape(5, 6, 7) + d) % 16).astype(np.uint8)
        rows.append((d, "video", bytearray(GC.encode_gif(frames, pal, disposal=1))))
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    out = sample_frames(df, every_k=2).orderBy("doc_id", "frame_idx").collect()
    assert [(r.doc_id, r.frame_idx) for r in out] == [
        (d, i) for d in range(4) for i in (0, 2, 4)
    ]
    w, h, px = decode_png(bytes(out[0].frame_payload))
    assert (w, h) == (7, 6)
    exp = pal[(np.arange(6 * 7).reshape(6, 7) + 0) % 16]
    assert np.array_equal(px, exp)


def test_media_metadata_gif(spark):
    from parquet_common_spark.operators.multimodal import decode_media

    data = GC.encode_gif(np.zeros((3, 4, 5), np.uint8), _pal(4), disposal=1)
    df = spark.createDataFrame(
        [(1, "image", bytearray(data))], "doc_id long, media_type string, payload binary"
    )
    row = decode_media(df).collect()[0]
    assert (row.width, row.height, row.n_frames) == (5, 4, 3)


def test_gif_roundtrip_hypothesis():
    """Property fuzz (the FLAC/arith-JPEG discipline): random palette
    sizes, geometries, frame counts, interlace, content styles —
    decode(encode(x)) == palette[x] exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        k=st.sampled_from([4, 8, 16, 32, 64, 128, 256]),
        w=st.integers(1, 33),
        h=st.integers(1, 33),
        n=st.integers(1, 3),
        interlace=st.booleans(),
        style=st.sampled_from(["random", "runs", "gradient"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def inner(k, w, h, n, interlace, style, seed):
        rng = np.random.default_rng(seed)
        if style == "random":
            frames = rng.integers(0, k, size=(n, h, w)).astype(np.uint8)
        elif style == "runs":
            frames = np.repeat(
                rng.integers(0, k, size=(n, h, (w + 4) // 5)), 5, axis=2
            )[:, :, :w].astype(np.uint8)
        else:
            frames = (np.arange(n * h * w).reshape(n, h, w) % k).astype(np.uint8)
        pal = _pal(k)
        data = GC.encode_gif(frames, pal, interlace=interlace, disposal=1)
        got, _ = GC.gif_frames(data)
        assert got.shape == (n, h, w, 3)
        for f in range(n):
            assert np.array_equal(got[f], pal[frames[f]])

    inner()
