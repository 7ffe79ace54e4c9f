#!/usr/bin/env python
"""Regenerate the `_JPEG_PINS` literal block in
exporter_spark/queries/multimodal.py.

Each pin row is the deterministic decode(encode(variant)) output for
one `_JPEG_VARIANTS` entry: (variant, width, height, sha256-of-decoded
-pixel-buffer, lane0..lane7) where the lanes replicate the Spark-side
ROUND(CAST(float32 AS DOUBLE), 6): Spark's round is
BigDecimal.valueOf(double).setScale(6, HALF_UP), and
BigDecimal.valueOf uses Double.toString's shortest round-trip decimal
— Python's repr() produces the same shortest form, so
Decimal(repr(x)).quantize(1e-6, ROUND_HALF_UP) is the exact replica.

No Spark needed: the codec is pure numpy. Run after ANY change to
operators/jpeg.py; tests/test_parity_pins.py fails if the committed
pins drift from a live recompute.

Usage: python tools/gen_jpeg_pins.py [--check]
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
    from exporter_spark.operators.jpeg import jpeg_decoder
    from exporter_spark.operators.multimodal import auto_decoder
    from exporter_spark.queries.multimodal import (
        _JPEG_VARIANTS,
        _jpeg_fixture_payload,
    )

    dec = auto_decoder()
    jpg = jpeg_decoder()
    pins = []
    for v in range(len(_JPEG_VARIANTS)):
        _, _, _, _, h, w, _ = _JPEG_VARIANTS[v]
        payload = _jpeg_fixture_payload(v)
        lanes = dec(payload)
        sha = hashlib.sha256(jpg.pixels(payload).tobytes()).hexdigest()
        pins.append(
            (v, w, h, sha, *[spark_round6(x) for x in lanes.tolist()])
        )
    return pins


def render(pins) -> str:
    rows = []
    for (v, w, h, sha, *lanes) in pins:
        lane_s = ", ".join(f'"{x}"' for x in lanes)
        rows.append(f'    ({v}, {w}, {h},\n     "{sha}",\n     {lane_s}),')
    return "_JPEG_PINS: tuple = (\n" + "\n".join(rows) + "\n)"


def main() -> int:
    src = open(TARGET).read()
    block = render(compute_pins())
    pat = re.compile(r"_JPEG_PINS: tuple = \((?:[^()]|\([^()]*\))*\)|_JPEG_PINS: tuple = \(\)[^\n]*")
    m = pat.search(src)
    if not m:
        print("no _JPEG_PINS block found", file=sys.stderr)
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
