#!/usr/bin/env python
"""Scale sweep for the three driver-gated media entries
(media_decode_stats, jpeg_decode_stats, gif_decode_stats) across
sf0.001 / sf0.01 / sf0.1 — the per-pillar 1x -> 100x discipline: the
entries are embarrassingly parallel Arrow-batched decodes, so wall
time should scale ~linearly with row count and per-row cost should be
~constant (no super-linear term means no hidden shuffle/driver
bottleneck at 1000x either).

Usage: python tools/media_scale_sweep_r15.py
Prints one JSON line; snapshot committed as
tools/audits/r15_media_scale_sweep.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import timed  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.queries import QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

ENTRIES = ["media_decode_stats", "jpeg_decode_stats", "gif_decode_stats"]
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    spark = get_spark("media-scale-sweep")
    spark.range(1_000_000).select(F.sum("id")).collect()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        n_docs = load_table(spark, sf_dir, "documents").count()
        row = {"n_docs": n_docs}
        for name in ENTRIES:
            with cache_scope():
                sec = timed(lambda: force(QUERIES[name].fn(spark, sf_dir)), 2)
            row[name] = {
                "sec": sec,
                "us_per_doc": round(sec * 1e6 / max(n_docs, 1), 1),
            }
            print(f"[sweep] {sf} {name}: {sec}s", file=sys.stderr)
        out[sf] = row
    print(json.dumps({"entries": ENTRIES, "sweep": out}))


if __name__ == "__main__":
    main()
