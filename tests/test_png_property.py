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
def _images(draw):
    h = draw(st.integers(min_value=1, max_value=12))
    w = draw(st.integers(min_value=1, max_value=12))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    # byte values drawn adversarially: extremes (0/255 stress the
    # mod-256 wraparound in Sub/Up), near-mid values (stress
    # Average's floor), plus plain uniform
    vals = draw(
        st.lists(
            st.one_of(
                st.sampled_from([0, 1, 127, 128, 129, 254, 255]),
                st.integers(min_value=0, max_value=255),
            ),
            min_size=h * w * ch,
            max_size=h * w * ch,
        )
    )
    return np.array(vals, dtype=np.uint8).reshape(h, w, ch)


@settings(max_examples=150, deadline=None)
@given(img=_images(), ft=st.integers(min_value=0, max_value=4))
def test_png_roundtrip_pixel_exact(img, ft):
    dec = multimodal.png_decoder()
    back = dec.pixels(multimodal.encode_png(img, filter_type=ft))
    assert back.shape == img.shape
    assert np.array_equal(back, img)


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
