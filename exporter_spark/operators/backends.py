"""Binary image-decoder backends for the ``decoder=`` seam.

The zero-dependency codecs (PNG/PPM/BMP/JPEG/GIF in this package) are
the default; on a cluster image that ships Pillow or OpenCV, these
adapters swap a C decoder into the SAME contract, so the Spark-side
plumbing (schema, partitioning, Arrow batching, pickling) is
untouched. The contract every adapter honors:

* calling the closure with a payload returns the 8 float32 lanes in
  ``multimodal.PNG_FEATURE_NAMES`` order: width, height, channels,
  bit_depth, then mean/std/min/max of the luma plane (Rec. 601
  weights over pixels/255.0, computed in float64, quantized to
  float32 per lane — byte-identical discipline to the built-in
  decoders);
* ``.pixels(payload)`` returns ``np.uint8 (H, W, 3)`` RGB (grayscale
  broadcasts; alpha is dropped) — note cv2 decodes BGR, the adapter
  converts;
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
    """The shared 8-lane image feature vector from uint8 RGB pixels —
    the same formula every built-in image decoder inlines."""
    h, w, c = px.shape
    rgb = px.astype(np.float64) / 255.0
    luma = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    return np.array(
        [w, h, c, 8, luma.mean(), luma.std(), luma.min(), luma.max()],
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

    def _pixels(payload: bytes) -> np.ndarray:
        import io

        from PIL import Image, UnidentifiedImageError

        try:
            with Image.open(io.BytesIO(bytes(payload or b""))) as im:
                im.seek(0)  # first frame of animated sources
                return _to_rgb_uint8(
                    np.asarray(im.convert("RGB")), "Pillow"
                )
        except UnidentifiedImageError as ex:
            raise ValueError(f"undecodable payload via Pillow: {ex}") from ex
        except (OSError, SyntaxError) as ex:
            raise ValueError(f"undecodable payload via Pillow: {ex}") from ex

    def decode(payload: bytes) -> np.ndarray:
        return image_lanes(_pixels(payload))

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

    def _pixels(payload: bytes) -> np.ndarray:
        import cv2

        buf = np.frombuffer(bytes(payload or b""), np.uint8)
        arr = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise ValueError(
                "undecodable payload via cv2: imdecode returned None"
            )
        if arr.ndim == 3 and arr.shape[2] in (3, 4):
            arr = cv2.cvtColor(
                arr,
                cv2.COLOR_BGRA2RGB if arr.shape[2] == 4 else cv2.COLOR_BGR2RGB,
            )
        return _to_rgb_uint8(arr, "cv2")

    def decode(payload: bytes) -> np.ndarray:
        return image_lanes(_pixels(payload))

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
