#!/usr/bin/env python
"""Throughput of the REAL media codecs through the Arrow seam.

The round-13 decoders (wav/png/ppm) are per-row Python by design —
the honest cost model for the one path where no JVM expression can do
the work. This harness puts a number on that cost at the operator
level: N generated payloads of realistic shape per format, decoded
via ``extract_features(decoder=...)`` on local[32], plus
``probe_media`` (header-only) and ``image_resizer`` (decode +
resample + re-encode) over the same frames. Reported as payloads/sec
total and per core, so a 100 TB capacity plan can size the decode
stage directly (the seam scales linearly with partitions — decode is
embarrassingly parallel; the measured per-core rate IS the cluster
unit).

Usage: python tools/codec_throughput_r13.py [n_per_format]
Prints one JSON line; snapshot committed as
tools/audits/r13_codec_throughput.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.operators import multimodal  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402


def build_frames(spark, n: int):
    """One DataFrame per format, n rows each, payloads generated
    driver-side once (deterministic; content seeded by row id)."""
    rng = np.random.RandomState(13)
    frames = {}
    rows = []
    for i in range(n):  # 64x64 RGB PNG ≈ 12 KB compressed
        px = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
        rows.append(
            (i, bytearray(multimodal.encode_png(px, filter_type=i % 5)),
             ("image", "png", 64, 64, None))
        )
    frames["png_64x64_rgb"] = rows
    rows = []
    for i in range(n):  # 1 s of 16 kHz 16-bit mono ≈ 32 KB
        samples = (
            (np.sin(np.arange(16000) * (0.01 + i * 1e-5)) * 12000)
            .astype(np.int16)
        )
        rows.append(
            (i, bytearray(multimodal.encode_wav(samples, framerate=16000)),
             ("audio", "wav", None, None, 1000))
        )
    frames["wav_1s_16k"] = rows
    rows = []
    for i in range(n):  # 64x64 binary PPM = 12 KB raw
        px = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
        rows.append(
            (i, bytearray(multimodal.encode_ppm(px)),
             ("image", "ppm", 64, 64, None))
        )
    frames["ppm_64x64_rgb"] = rows
    return {
        name: spark.createDataFrame(rows, multimodal.media_schema())
        .repartition(32)
        .cache()
        for name, rows in frames.items()
    }


def timed_rate(fn, n: int, repeat: int = 3) -> dict:
    best = min(
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(repeat)
    )
    return {"sec": round(best, 2), "rows_per_sec": round(n / best)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("codec-throughput")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    frames = build_frames(spark, n)
    for df in frames.values():
        df.count()  # materialize cache so generation cost is excluded
    out = {"n_per_format": n, "cores": cores, "ops": {}}
    decoders = {
        "png_64x64_rgb": multimodal.png_decoder(),
        "wav_1s_16k": multimodal.wav_decoder(),
        "ppm_64x64_rgb": multimodal.ppm_decoder(),
    }
    for name, df in frames.items():
        rec = timed_rate(
            lambda: multimodal.extract_features(
                df, decoder=decoders[name]
            ).select(F.sum(F.element_at("features", 1))).collect(),
            n,
        )
        rec["per_core_rows_per_sec"] = round(rec["rows_per_sec"] / cores, 1)
        out["ops"][f"decode:{name}"] = rec
        print(f"decode:{name}: {json.dumps(rec)}", file=sys.stderr)
    # header-only probe and full decode->resample->re-encode, PNG frame
    png = frames["png_64x64_rgb"]
    rec = timed_rate(
        lambda: multimodal.probe_media(png)
        .select(F.sum("meta.width")).collect(),
        n,
    )
    rec["per_core_rows_per_sec"] = round(rec["rows_per_sec"] / cores, 1)
    out["ops"]["probe:png"] = rec
    print(f"probe:png: {json.dumps(rec)}", file=sys.stderr)
    rec = timed_rate(
        lambda: multimodal.resize_media(
            png, 32, 32, resizer=multimodal.image_resizer()
        ).select(F.sum(F.length("payload"))).collect(),
        n,
    )
    rec["per_core_rows_per_sec"] = round(rec["rows_per_sec"] / cores, 1)
    out["ops"]["resize:png_64to32"] = rec
    print(f"resize:png_64to32: {json.dumps(rec)}", file=sys.stderr)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
