#!/usr/bin/env python
"""Round-8 export-sink sweep: distributed writers at 1/4/10x lineitem.

Input is N unioned scans of sf0.1 lineitem (~600k rows each) — no
checkpoint pinning, because a real export pipeline pays the scan too
and the scan is the part whose partitioning feeds the partition-
parallel writers. min-of-2 wall per (format, scale); output to a
fresh temp dir per run, removed afterwards.

Usage: python tools/export_sweep_r8.py [scales...]   (default 1 4 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exporter_spark.exporter import Exporter  # noqa: E402
from exporter_spark.plans.spec import ExportSpec  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("export-sweep-r8")
    base = load_table(spark, SF_DIR, "lineitem")
    n_base = base.count()

    for scale in scales:
        d = base
        for _ in range(scale - 1):
            d = d.unionByName(load_table(spark, SF_DIR, "lineitem"))
        res = {}
        for fmt in ("csv", "json", "xml", "parquet"):
            best = None
            for _ in range(2):
                out = tempfile.mkdtemp(prefix="export_sweep_")
                try:
                    t0 = time.perf_counter()
                    Exporter(d, fmt, ExportSpec()).write(f"{out}/{fmt}")
                    dt = time.perf_counter() - t0
                finally:
                    shutil.rmtree(out, ignore_errors=True)
                best = dt if best is None else min(best, dt)
            res[fmt] = round(best, 2)
        print(
            f"{scale}x | rows={n_base * scale} | "
            + " ".join(f"{k}={v}s" for k, v in res.items()),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
