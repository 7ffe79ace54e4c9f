"""Property round-trip for the stdlib PNG codec pair.

The golden/round-trip tests in test_operators.py pin curated shapes
and filters; this file lets hypothesis drive arbitrary (H, W, C)
uint8 images through encode_png under every scanline filter and
demands PIXEL-EXACT recovery from png_decoder().pixels — the filter
arithmetic (Sub's mod-256 prefix sums, Average's floor division,
Paeth's tie-breaking order) is exactly the kind of code where an
off-by-one survives curated fixtures. No Spark session: the codec is
driver/executor-pure Python, so examples are cheap and volume is
affordable here.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from exporter_spark.operators import multimodal


@st.composite
def _images(draw, depth: int = 8):
    h = draw(st.integers(min_value=1, max_value=12))
    w = draw(st.integers(min_value=1, max_value=12))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    top = 2**depth - 1
    # sample values drawn adversarially: extremes (stress the mod-256
    # wraparound in Sub/Up), near-mid values (stress Average's
    # floor), byte-boundary values for 16-bit, plus plain uniform
    vals = draw(
        st.lists(
            st.one_of(
                st.sampled_from(
                    sorted(
                        v
                        for v in {0, 1, top // 2, top // 2 + 1, 255, 256, top}
                        if v <= top
                    )
                ),
                st.integers(min_value=0, max_value=top),
            ),
            min_size=h * w * ch,
            max_size=h * w * ch,
        )
    )
    dt = np.uint8 if depth == 8 else np.uint16
    return np.array(vals, dtype=dt).reshape(h, w, ch)


@settings(max_examples=150, deadline=None)
@given(
    img=_images(),
    ft=st.integers(min_value=0, max_value=4),
    interlace=st.booleans(),
)
def test_png_roundtrip_pixel_exact(img, ft, interlace):
    dec = multimodal.png_decoder()
    back = dec.pixels(
        multimodal.encode_png(img, filter_type=ft, interlace=interlace)
    )
    assert back.shape == img.shape
    assert np.array_equal(back, img)


@settings(max_examples=100, deadline=None)
@given(
    img=_images(depth=16),
    ft=st.integers(min_value=0, max_value=4),
    interlace=st.booleans(),
)
def test_png_roundtrip_pixel_exact_16bit(img, ft, interlace):
    dec = multimodal.png_decoder()
    back = dec.pixels(
        multimodal.encode_png(
            img, filter_type=ft, bit_depth=16, interlace=interlace
        )
    )
    assert back.dtype == np.uint16
    assert np.array_equal(back, img)


@settings(max_examples=200, deadline=None)
@given(
    img=_images(),
    ft=st.integers(min_value=0, max_value=4),
    flips=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=4,
    ),
    cut=st.one_of(st.none(), st.integers(min_value=0, max_value=10**6)),
)
def test_png_corruption_never_leaks_raw_exceptions(img, ft, flips, cut):
    """The decode contract is 'malformed payloads raise ValueError
    with the reason named' — random byte flips and truncations must
    never surface struct.error / zlib.error / IndexError / numpy
    shape errors instead. (Decoding may also still SUCCEED: a flip
    inside IDAT that zlib tolerates is caught by CRC first, but a
    flip in an ignored ancillary position is legitimately harmless.)"""
    payload = bytearray(multimodal.encode_png(img, filter_type=ft))
    for pos, val in flips:
        payload[pos % len(payload)] = val
    data = bytes(payload[: cut % (len(payload) + 1)] if cut is not None
                 else payload)
    dec = multimodal.png_decoder()
    try:
        feats = dec(data)
    except ValueError:
        return
    assert len(feats) == 8  # survived corruption -> still well-formed


@settings(max_examples=60, deadline=None)
@given(img=_images())
def test_png_features_filter_invariant(img):
    """Features are a function of the pixels, not of the filter the
    encoder happened to pick — all five encodings of one image must
    decode to identical feature vectors."""
    dec = multimodal.png_decoder()
    feats = [
        dec(multimodal.encode_png(img, filter_type=ft)).tolist()
        for ft in range(5)
    ]
    assert all(f == feats[0] for f in feats[1:])
