#!/usr/bin/env python
"""Standalone host-condition probe: the two bench.py canaries without
the corpus. ~30s. Prints one JSON line {"host_canary_sec": ...,
"io_canary_sec": ...}.

Use before/after an isolated measurement, or standalone to grow the
io_canary band (BASELINE.md round-9 adjudication rule). The canary
workloads live in exporter_spark/benchlib.py, SHARED with bench.py —
readings are comparable with every BENCH record by construction.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import cpu_canary, io_canary  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402

REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))


def main() -> None:
    spark = get_spark("exporter_spark-canary-probe")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    print(
        json.dumps(
            {
                "host_canary_sec": cpu_canary(spark, REPEAT),
                "io_canary_sec": io_canary(spark, REPEAT),
            }
        )
    )


if __name__ == "__main__":
    main()
