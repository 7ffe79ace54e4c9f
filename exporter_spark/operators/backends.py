"""Binary image-decoder backends for the ``decoder=`` seam.

The zero-dependency codecs (PNG/PPM/BMP/JPEG/GIF in this package) are
the default; on a cluster image that ships Pillow or OpenCV, these
adapters swap a C decoder into the SAME contract, so the Spark-side
plumbing (schema, partitioning, Arrow batching, pickling) is
untouched. The contract every adapter honors:

* calling the closure with a payload returns the 8 float32 lanes in
  ``multimodal.PNG_FEATURE_NAMES`` order, computed by
  :func:`image_lanes` over the SOURCE-FAITHFUL array (grayscale
  stays 1-channel, 16-bit stays uint16, RGBA reports 4 channels with
  alpha excluded from luma) — the exact formula the built-in
  decoders inline, so swapping a backend in does not change feature
  rows for gray/16-bit/alpha sources either;
* ``.pixels(payload)`` returns ``np.uint8 (H, W, 3)`` RGB (grayscale
  broadcasts; alpha is dropped; 16-bit quantizes to the high byte) —
  note cv2 decodes BGR, the adapter converts;
* malformed payloads raise ``ValueError`` naming the reason, never
  backend-native exceptions and never fake lanes;
* the factory itself raises ``ImportError`` naming the missing
  package when the backend is absent, so a misconfigured cluster
  fails at pipeline BUILD time, not row-by-row inside executors.

Parity with the built-in decoders is pinned by
``tests/test_backends.py``: exact for lossless codecs, bounded pixel
tolerance for JPEG (independent ITU T.81 decoders legitimately differ
by IDCT rounding). In THIS container no backend is importable and
installs are unavailable, so the parity assertions are skip-gated —
the adapters and the contract tests below them still run (SCALE.md
round-16 seam note records the verified absence).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def image_lanes(px: np.ndarray) -> np.ndarray:
    """The shared 8-lane image feature vector — the EXACT formula the
    built-in decoders inline (multimodal.py png/ppm/bmp lane block):
    channels and bit depth are reported from the SOURCE-FAITHFUL
    array (uint8 or uint16, (H, W) or (H, W, C)); gray/gray+alpha
    luma is channel 0, RGB(A) luma is BT.601 with alpha excluded,
    normalized by the depth's max sample value. Adapters must feed
    this the faithful array, not an RGB8 conversion, or grayscale /
    16-bit / RGBA sources silently change lanes when a backend swaps
    in (round-16 review)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    depth = px.dtype.itemsize * 8
    scale = float(2**depth - 1)
    if ch <= 2:  # gray / gray+alpha
        luma = px[:, :, 0].astype(np.float64) / scale
    else:  # RGB(A) — BT.601 luma, alpha excluded
        rgb = px[:, :, :3].astype(np.float64) / scale
        luma = (
            0.299 * rgb[:, :, 0]
            + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]
        )
    return np.array(
        [
            w,
            h,
            ch,
            depth,
            float(luma.mean()),
            float(luma.std()),
            float(luma.min()),
            float(luma.max()),
        ],
        dtype=np.float32,
    )


def _to_rgb_uint8(arr: np.ndarray, source: str) -> np.ndarray:
    if arr.dtype != np.uint8:
        # 16-bit sources quantize to 8 for the shared contract
        if arr.dtype == np.uint16:
            arr = (arr >> 8).astype(np.uint8)
        else:
            raise ValueError(
                f"undecodable payload via {source}: dtype {arr.dtype}"
            )
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    elif arr.ndim == 3 and arr.shape[2] == 4:
        arr = arr[:, :, :3]
    elif arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(
            f"undecodable payload via {source}: shape {arr.shape}"
        )
    return np.ascontiguousarray(arr)


def pillow_decoder() -> Callable[[bytes], np.ndarray]:
    """Pillow-backed image decoder for the ``decoder=`` seam
    (PNG/JPEG/GIF/BMP/PPM and everything else PIL registers). First
    frame for animated sources, matching gif_decoder's feature
    contract."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as ex:  # pragma: no cover - exercised when absent
        raise ImportError(
            "pillow_decoder needs Pillow (pip install pillow) on driver"
            " and executors"
        ) from ex

    def _open(payload: bytes):
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(bytes(payload or b"")))
        im.seek(0)  # first frame of animated sources
        return im

    def _faithful(im) -> np.ndarray:
        # source-faithful array for the lane formula: L/LA/RGB/RGBA
        # pass through, 16-bit gray stays uint16. Palette and exotic
        # modes (CMYK, YCbCr, 1-bit) normalize to RGB — same as the
        # built-in PNG decoder's palette expansion. (Pillow itself
        # cannot represent 16-bit RGB PNG faithfully; it arrives as
        # 8-bit 'RGB', so that one source class keeps the normalized
        # lanes — documented limit, not silent.)
        if im.mode in ("L", "LA", "RGB", "RGBA"):
            arr = np.asarray(im)
        elif im.mode in ("I;16", "I;16L", "I;16B", "I"):
            arr = np.asarray(im.convert("I;16"), dtype=np.uint16)
        else:
            arr = np.asarray(im.convert("RGB"))
        return arr

    def _guard(fn, payload):
        from PIL import Image, UnidentifiedImageError

        try:
            with _open(payload) as im:
                return fn(im)
        except Image.DecompressionBombError as ex:
            # Pillow's own bomb guard (MAX_IMAGE_PIXELS) — surface it
            # under the contract, like the built-ins' MAX_PIXELS caps
            raise ValueError(
                f"undecodable payload via Pillow: decode cap — {ex}"
            ) from ex
        except (UnidentifiedImageError, OSError, SyntaxError) as ex:
            raise ValueError(f"undecodable payload via Pillow: {ex}") from ex

    def _pixels(payload: bytes) -> np.ndarray:
        return _guard(
            lambda im: _to_rgb_uint8(np.asarray(im.convert("RGB")), "Pillow"),
            payload,
        )

    def decode(payload: bytes) -> np.ndarray:
        return _guard(lambda im: image_lanes(_faithful(im)), payload)

    decode.pixels = _pixels
    return decode


def cv2_decoder() -> Callable[[bytes], np.ndarray]:
    """OpenCV-backed image decoder for the ``decoder=`` seam. cv2
    returns BGR — the adapter flips to the contract's RGB."""
    try:
        import cv2  # noqa: F401
    except ImportError as ex:  # pragma: no cover - exercised when absent
        raise ImportError(
            "cv2_decoder needs OpenCV (pip install opencv-python-headless)"
            " on driver and executors"
        ) from ex

    def _decode_raw(payload: bytes) -> np.ndarray:
        import cv2

        buf = np.frombuffer(bytes(payload or b""), np.uint8)
        try:
            arr = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
        except cv2.error as ex:
            # cv2's own caps (OPENCV_IO_MAX_IMAGE_PIXELS) raise
            # cv2.error — surface under the contract, never
            # backend-native (round-16 review)
            raise ValueError(f"undecodable payload via cv2: {ex}") from ex
        if arr is None:
            raise ValueError(
                "undecodable payload via cv2: imdecode returned None"
            )
        if arr.ndim == 3 and arr.shape[2] in (3, 4):
            import cv2 as _cv2

            arr = _cv2.cvtColor(
                arr,
                _cv2.COLOR_BGRA2RGBA
                if arr.shape[2] == 4
                else _cv2.COLOR_BGR2RGB,
            )
        return arr  # source-faithful: gray stays 2-D, 16-bit uint16

    def _pixels(payload: bytes) -> np.ndarray:
        return _to_rgb_uint8(_decode_raw(payload), "cv2")

    def decode(payload: bytes) -> np.ndarray:
        return image_lanes(_decode_raw(payload))

    decode.pixels = _pixels
    return decode


_BACKENDS: dict[str, tuple[str, Callable[[], Callable]]] = {
    "pillow": ("PIL", pillow_decoder),
    "cv2": ("cv2", cv2_decoder),
}


def available_image_backends() -> dict[str, Callable[[], Callable]]:
    """Backend factories whose import succeeds in THIS interpreter —
    what a cluster-image probe calls to pick a decode lane. Empty dict
    means the zero-dependency built-ins are the only lane (the state
    of this test container, verified in SCALE.md round 16)."""
    import importlib

    out = {}
    for name, (module, factory) in _BACKENDS.items():
        try:
            importlib.import_module(module)
        except ImportError:
            continue
        out[name] = factory
    return out
