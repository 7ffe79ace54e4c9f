#!/usr/bin/env python
"""Throughput of the round-14 baseline JPEG codec through the Arrow
seam — the same protocol as tools/codec_throughput_r13.py so the
numbers are comparable with the PNG/PPM/WAV lanes priced there.

Also records the optimization history this round measured: the
method-call bit reader decoded ~115 img/s/core (64x64 RGB 4:2:0
q85); the 8-bit Huffman LUT took it to ~196; inlining the reader
state into the MCU loop landed ~247 (single-core, driver-side).
The numbers printed here are the OPERATOR-level rates through
extract_features / probe_media / resize_media on local[32].

Usage: python tools/jpeg_throughput_r14.py [n_per_variant]
Prints one JSON line; snapshot committed as
tools/audits/r14_jpeg_throughput.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.operators import jpeg, multimodal  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402


def build_frames(spark, n: int):
    rng = np.random.RandomState(14)
    frames = {}
    for name, kwargs in (
        ("jpeg_64x64_420_q85", dict(quality=85, subsampling="420")),
        ("jpeg_64x64_444_q85", dict(quality=85, subsampling="444")),
    ):
        rows = []
        for i in range(n):
            px = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
            rows.append(
                (
                    i,
                    bytearray(jpeg.encode_jpeg(px, **kwargs)),
                    ("image", "jpeg", 64, 64, None),
                )
            )
        frames[name] = (
            spark.createDataFrame(rows, multimodal.media_schema())
            .repartition(32)
            .cache()
        )
    return frames


def timed_rate(fn, n: int, repeat: int = 3) -> dict:
    best = min(
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(repeat)
    )
    return {"sec": round(best, 2), "rows_per_sec": round(n / best)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark("jpeg-throughput")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    frames = build_frames(spark, n)
    for df in frames.values():
        df.count()
    out = {"n_per_variant": n, "cores": cores, "ops": {}}
    dec = jpeg.jpeg_decoder()
    for name, df in frames.items():
        rec = timed_rate(
            lambda df=df: multimodal.extract_features(df, decoder=dec)
            .select(F.sum(F.element_at("features", 1)))
            .collect(),
            n,
        )
        rec["per_core_rows_per_sec"] = round(rec["rows_per_sec"] / cores, 1)
        out["ops"][f"decode:{name}"] = rec
        print(f"decode:{name}: {json.dumps(rec)}", file=sys.stderr)
    df420 = frames["jpeg_64x64_420_q85"]
    rec = timed_rate(
        lambda: multimodal.probe_media(df420)
        .select(F.sum("meta.width"))
        .collect(),
        n,
    )
    rec["per_core_rows_per_sec"] = round(rec["rows_per_sec"] / cores, 1)
    out["ops"]["probe:jpeg"] = rec
    print(f"probe:jpeg: {json.dumps(rec)}", file=sys.stderr)
    rec = timed_rate(
        lambda: multimodal.resize_media(
            df420, 32, 32, resizer=multimodal.image_resizer()
        )
        .select(F.sum(F.length("payload")))
        .collect(),
        n,
    )
    rec["per_core_rows_per_sec"] = round(rec["rows_per_sec"] / cores, 1)
    out["ops"]["resize:jpeg_64to32"] = rec
    print(f"resize:jpeg_64to32: {json.dumps(rec)}", file=sys.stderr)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
