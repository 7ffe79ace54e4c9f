"""The binary-decoder swap-in seam, made falsifiable (VERDICT r15 #3).

The ``decoder=`` contract always documented "swap in
libjpeg-turbo/cv2 when the cluster image allows" — these tests give
the seam a concrete adapter (operators/backends.py) and assertions
that RUN whenever any backend is importable. In this container no
backend is importable and installs are unavailable (verified:
SCALE.md round-16 seam note), so the parity half skips — but the
adapter contract half runs everywhere, including here.
"""

from __future__ import annotations

import numpy as np
import pytest

from exporter_spark.operators import backends, gif, multimodal
from exporter_spark.operators.jpeg import encode_jpeg, jpeg_decoder


def _importable(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


HAVE_PIL = _importable("PIL")
HAVE_CV2 = _importable("cv2")


def _fixture_rgb(h=24, w=32):
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    k = np.arange(3).reshape(1, 1, 3)
    return ((29 * r + 5 * c + 11 * k) % 256).astype(np.uint8)


# ---------------------------------------------------------------------
# Contract half — runs in every environment
# ---------------------------------------------------------------------


def test_absent_backend_fails_at_build_time_by_name():
    """A misconfigured cluster must fail when the pipeline is BUILT,
    not row-by-row inside executors — the factory raises ImportError
    naming the pip package."""
    if not HAVE_PIL:
        with pytest.raises(ImportError, match="pillow"):
            backends.pillow_decoder()
    if not HAVE_CV2:
        with pytest.raises(ImportError, match="opencv"):
            backends.cv2_decoder()
    if HAVE_PIL or HAVE_CV2:
        pytest.skip("a backend is importable here; absence half n/a")


def test_available_backends_reflects_this_interpreter():
    got = backends.available_image_backends()
    assert set(got) <= {"pillow", "cv2"}
    assert ("pillow" in got) == HAVE_PIL
    assert ("cv2" in got) == HAVE_CV2


def test_image_lanes_matches_builtin_decoders():
    """The shared lane formula in backends.py must be the SAME one the
    built-in decoders inline — pinned through the lossless GIF round
    trip (encode → auto_decoder vs image_lanes over the raw pixels)."""
    px = _fixture_rgb()
    # GIF needs <=256 colors; quantize the fixture to a 64-value grid
    px = (px // 4 * 4)[:11, :13]
    payload = gif.encode_gif(px)
    lanes_builtin = multimodal.auto_decoder()(payload)
    lanes_shared = backends.image_lanes(gif.gif_decoder().pixels(payload))
    assert np.array_equal(lanes_builtin, lanes_shared)


# ---------------------------------------------------------------------
# Parity half — runs whenever a backend is importable
# ---------------------------------------------------------------------


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not importable here")
def test_pillow_parity_lossless_exact():
    """Lossless codecs: the Pillow lane and the built-in lane must be
    pixel-identical (PNG via encode_png, GIF via encode_gif)."""
    from exporter_spark.operators.multimodal import encode_png, png_decoder

    dec = backends.pillow_decoder()
    px = _fixture_rgb()
    png_payload = encode_png(px)
    assert np.array_equal(dec.pixels(png_payload), png_decoder().pixels(png_payload))
    gif_px = (px // 8 * 8)[:16, :16]
    gif_payload = gif.encode_gif(gif_px)
    assert np.array_equal(dec.pixels(gif_payload), gif.gif_decoder().pixels(gif_payload))
    assert np.array_equal(dec(png_payload), backends.image_lanes(px))


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not importable here")
def test_pillow_parity_jpeg_tolerance():
    """JPEG: two independent ITU T.81 decoders legitimately differ by
    IDCT rounding — bounded, never unbounded. libjpeg-class decoders
    vs this package's float IDCT: mean abs diff well under 1 level,
    max a few levels."""
    dec = backends.pillow_decoder()
    px = _fixture_rgb()
    payload = encode_jpeg(px, quality=90, subsampling="444")
    ours = jpeg_decoder().pixels(payload).astype(np.int16)
    theirs = dec.pixels(payload).astype(np.int16)
    assert ours.shape == theirs.shape
    diff = np.abs(ours - theirs)
    assert diff.mean() < 1.0, f"mean abs diff {diff.mean()}"
    assert diff.max() <= 8, f"max abs diff {diff.max()}"


@pytest.mark.skipif(not HAVE_CV2, reason="cv2 not importable here")
def test_cv2_parity_bgr_conversion_and_jpeg_tolerance():
    """cv2 decodes BGR; the adapter must hand back contract RGB —
    pinned on a color-asymmetric PNG (exact) and JPEG (bounded)."""
    from exporter_spark.operators.multimodal import encode_png, png_decoder

    dec = backends.cv2_decoder()
    px = _fixture_rgb()
    px[:, :, 0] = 200  # strongly R-dominant: a BGR mixup inverts it
    px[:, :, 2] = 20
    png_payload = encode_png(px)
    assert np.array_equal(dec.pixels(png_payload), png_decoder().pixels(png_payload))
    payload = encode_jpeg(px, quality=90, subsampling="444")
    diff = np.abs(
        jpeg_decoder().pixels(payload).astype(np.int16)
        - dec.pixels(payload).astype(np.int16)
    )
    assert diff.mean() < 1.0 and diff.max() <= 8


@pytest.mark.skipif(
    not (HAVE_PIL or HAVE_CV2), reason="no backend importable here"
)
def test_backend_swaps_into_extract_features(spark):
    """The seam itself: extract_features(decoder=<backend adapter>)
    must run the distributed path unchanged."""
    import pandas as pd

    from exporter_spark.operators.multimodal import encode_png

    factory = next(iter(backends.available_image_backends().values()))
    px = _fixture_rgb()
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [encode_png(px)], "meta": [None]})
    )
    out = multimodal.extract_features(df, decoder=factory()).collect()
    assert len(out) == 1
    assert out[0]["features"] == backends.image_lanes(px).tolist()


def test_image_lanes_faithful_for_gray_and_16bit():
    """Finding-3 regression (round-16 review): the shared lane
    formula must report SOURCE channels and bit depth — a grayscale
    source is (w, h, 1, 8, ...) and a 16-bit gray source is
    (w, h, 1, 16, ...) with luma normalized by 65535, identically to
    the built-in png_decoder. An adapter that RGB8-converts before
    computing lanes would silently change feature rows when a backend
    swaps in."""
    from exporter_spark.operators.multimodal import encode_png, png_decoder

    dec = png_decoder()
    gray = (np.arange(8 * 9).reshape(8, 9) % 256).astype(np.uint8)
    p = encode_png(gray)
    assert np.array_equal(dec(p), backends.image_lanes(dec.pixels(p)))
    assert dec(p)[2] == 1.0 and dec(p)[3] == 8.0
    g16 = (np.arange(8 * 9).reshape(8, 9) * 700 % 65536).astype(np.uint16)
    p16 = encode_png(g16, bit_depth=16)
    assert np.array_equal(dec(p16), backends.image_lanes(dec.pixels(p16)))
    assert dec(p16)[3] == 16.0
    rgba = np.dstack([_fixture_rgb(8, 9), np.full((8, 9), 77, np.uint8)])
    pa = encode_png(rgba)
    assert np.array_equal(dec(pa), backends.image_lanes(dec.pixels(pa)))
    assert dec(pa)[2] == 4.0
