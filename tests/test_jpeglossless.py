"""SOF3 lossless JPEG pins: lossless means decode(encode(x)) must be
BIT-EXACT across the full (predictor x precision x components x
restart) matrix; plus the decode_jpeg dispatch, point-transform
semantics, and error surfaces."""

from __future__ import annotations

import numpy as np
import pytest

import parquet_common_spark.functions.jpegcodec as J
import parquet_common_spark.functions.jpeglossless as JL


def _img(h, w, c, prec, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << prec, (h, w, c)).astype(np.int64)


@pytest.mark.parametrize("pred", list(range(1, 8)))
@pytest.mark.parametrize("prec,shape", [(8, (13, 17, 1)), (8, (8, 9, 3)),
                                        (12, (9, 5, 1)), (16, (7, 11, 2))])
def test_lossless_roundtrip_matrix(pred, prec, shape):
    img = _img(*shape, prec)
    data = JL.encode_jpeg_lossless(img, predictor=pred, precision=prec)
    h, w, out = JL.decode_jpeg_lossless(data)
    assert (h, w) == shape[:2]
    assert np.array_equal(out.astype(np.int64), img), (pred, prec, shape)


@pytest.mark.parametrize("ri", [1, 3, 7, 100])
def test_lossless_restart_intervals(ri):
    img = _img(11, 7, 1, 8)
    data = JL.encode_jpeg_lossless(img, predictor=4, restart_interval=ri)
    _, _, out = JL.decode_jpeg_lossless(data)
    assert np.array_equal(out.astype(np.int64), img), ri


def test_lossless_point_transform():
    """Pt shifts out the low bits at encode and shifts back at decode:
    output == (input >> Pt) << Pt (H.2.4 inverse point transform)."""
    img = _img(6, 6, 1, 8)
    data = JL.encode_jpeg_lossless(img, predictor=1, point_transform=2)
    _, _, out = JL.decode_jpeg_lossless(data)
    assert np.array_equal(out.astype(np.int64), (img >> 2) << 2)


def test_lossless_ssss16_max_diff():
    """A 16-bit sample jumping by exactly 32768 exercises the SSSS=16
    no-extra-bits symbol (Annex H's special case)."""
    img = np.zeros((4, 4, 1), dtype=np.int64)
    img[0, 1] = 32768
    img[2, 3] = 65535
    data = JL.encode_jpeg_lossless(img, predictor=1, precision=16)
    _, _, out = JL.decode_jpeg_lossless(data)
    assert np.array_equal(out.astype(np.int64) & 0xFFFF, img)


def test_lossless_gradient_and_constant():
    grad = (np.arange(64).reshape(8, 8, 1) * 3).astype(np.int64)
    const = np.full((5, 9, 1), 77, dtype=np.int64)
    for img, pred in ((grad, 7), (const, 2)):
        data = JL.encode_jpeg_lossless(img, predictor=pred)
        _, _, out = JL.decode_jpeg_lossless(data)
        assert np.array_equal(out.astype(np.int64), img)


def test_decode_jpeg_dispatches_sof3():
    """decode_jpeg routes SOF3 streams to the lossless pipeline for
    precision <= 8 (uint8 contract) and refuses >8 with a pointer."""
    img = _img(10, 6, 3, 8)
    data = JL.encode_jpeg_lossless(img, predictor=5)
    w, h, px = J.decode_jpeg(data)
    assert (w, h) == (6, 10) and px.dtype == np.uint8
    assert np.array_equal(px.astype(np.int64), img)
    deep = JL.encode_jpeg_lossless(_img(4, 4, 1, 12), precision=12)
    with pytest.raises(NotImplementedError, match="decode_jpeg_lossless"):
        J.decode_jpeg(deep)


def test_lossless_error_surfaces():
    img = _img(6, 6, 1, 8)
    data = JL.encode_jpeg_lossless(img)
    with pytest.raises(ValueError, match="SOI"):
        JL.decode_jpeg_lossless(b"nope" + data)
    with pytest.raises(ValueError):
        JL.decode_jpeg_lossless(data[:40])  # truncated mid-stream
    # a baseline stream through the lossless entry point is rejected
    base = J.encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=90)
    with pytest.raises(ValueError, match="not an SOF3"):
        JL.decode_jpeg_lossless(base)
    with pytest.raises(ValueError, match="predictor"):
        JL.encode_jpeg_lossless(img, predictor=0)


def test_lossless_roundtrip_hypothesis():
    """Property fuzz: arbitrary sizes/precisions/predictors/restarts —
    decode(encode(x)) == x always."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=12),
        w=st.integers(min_value=1, max_value=12),
        c=st.integers(min_value=1, max_value=3),
        prec=st.sampled_from([2, 4, 8, 12, 16]),
        pred=st.integers(min_value=1, max_value=7),
        ri=st.sampled_from([0, 1, 4]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def prop(h, w, c, prec, pred, ri, seed):
        img = _img(h, w, c, prec, seed)
        data = JL.encode_jpeg_lossless(
            img, predictor=pred, precision=prec, restart_interval=ri
        )
        hh, ww, out = JL.decode_jpeg_lossless(data)
        assert (hh, ww) == (h, w)
        assert np.array_equal(out.astype(np.int64), img)

    prop()
