#!/usr/bin/env python
"""Regenerate the `_AVI_PINS` literal block in
exporter_spark/queries/multimodal.py.

Each pin row is the deterministic sampler output for one
`_AVI_VARIANTS` MJPEG-AVI fixture: (variant, n_sampled,
sha256-of-sampled-frame-buffer, mean_luma) where mean_luma replicates
the Spark-side ROUND(CAST(float32 AS DOUBLE), 6) exactly (same
Decimal trick as tools/gen_jpeg_pins.py — Spark's round is
BigDecimal.valueOf(double).setScale(6, HALF_UP) over the
shortest-round-trip decimal, which Python's repr() reproduces).

No Spark needed: container walk + JPEG decode are pure numpy. Run
after ANY change to operators/avi.py or operators/jpeg.py;
tests/test_parity_pins.py fails if the committed pins drift from a
live recompute.

Usage: python tools/gen_avi_pins.py [--check]
  --check: exit 1 if the committed pins differ (no rewrite)
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "exporter_spark",
    "queries",
    "multimodal.py",
)


def spark_round6(x: float) -> str:
    d = Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )
    return str(d)


def compute_pins():
    import numpy as np

    from exporter_spark.operators.multimodal import video_frame_decoder
    from exporter_spark.queries.multimodal import (
        _AVI_EVERY_MS,
        _AVI_VARIANTS,
        _avi_fixture_payload,
    )

    dec = video_frame_decoder(every_ms=_AVI_EVERY_MS, max_frames=64)
    pins = []
    for v in range(len(_AVI_VARIANTS)):
        frames = dec(_avi_fixture_payload(v))
        rgb = frames.astype(np.float64) / 255.0
        luma = (
            0.299 * rgb[:, :, :, 0]
            + 0.587 * rgb[:, :, :, 1]
            + 0.114 * rgb[:, :, :, 2]
        )
        pins.append(
            (
                v,
                int(frames.shape[0]),
                hashlib.sha256(frames.tobytes()).hexdigest(),
                spark_round6(np.float32(luma.mean())),
            )
        )
    return pins


def render(pins) -> str:
    rows = []
    for (v, n, sha, luma) in pins:
        rows.append(f'    ({v}, {n},\n     "{sha}",\n     "{luma}"),')
    return "_AVI_PINS: tuple = (\n" + "\n".join(rows) + "\n)"


def main() -> int:
    src = open(TARGET).read()
    block = render(compute_pins())
    pat = re.compile(
        r"_AVI_PINS: tuple = \((?:[^()]|\([^()]*\))*\)"
        r"|_AVI_PINS: tuple = \(\)[^\n]*"
    )
    m = pat.search(src)
    if not m:
        print("no _AVI_PINS block found", file=sys.stderr)
        return 2
    if "--check" in sys.argv:
        ok = m.group(0) == block
        print("pins", "up-to-date" if ok else "STALE")
        return 0 if ok else 1
    open(TARGET, "w").write(src[: m.start()] + block + src[m.end():])
    print(f"wrote {len(compute_pins())} pins to {TARGET}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
