#!/usr/bin/env python
"""Standalone host-condition probe: the two bench.py canaries without
the corpus. ~30s. Prints one JSON line {"host_canary_sec": ...,
"io_canary_sec": ...}.

Use before/after an isolated measurement, or standalone to grow the
io_canary band (BASELINE.md round-9 adjudication rule). Identical
workloads to bench.py's canaries — fixed 32 partitions, same ~100 MB
parquet write+read through the same temp filesystem — so readings are
comparable with every BENCH record.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.session import get_spark  # noqa: E402

REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))


def main() -> None:
    spark = get_spark("exporter_spark-canary-probe")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm

    def timed(fn, n=REPEAT):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    host = timed(
        lambda: spark.range(0, 400_000_000, 1, 32)
        .select(F.sum(F.col("id") % 7))
        .collect()
    )

    def _io_probe():
        d = tempfile.mkdtemp(prefix="exporter_spark_iocanary_")
        try:
            p = f"{d}/t"
            spark.range(0, 12_500_000, 1, 32).withColumn(
                "pad", F.col("id") % 997
            ).write.mode("overwrite").parquet(p)
            spark.read.parquet(p).select(F.sum("pad")).collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    io = timed(_io_probe)
    print(json.dumps({"host_canary_sec": host, "io_canary_sec": io}))


if __name__ == "__main__":
    main()
