#!/usr/bin/env python
"""Round-16 adjudications (VERDICT r15 #1 and #8): isolated min-of-3
readings for the two open bench movers, bracketed by both canaries.

* semdedup_survivors — BENCH_r15 read 1.388 vs BENCH_r14 1.049
  (1.32x) in an elevated-io session; the repo's standard is
  adjudication, not analogy to the r15 embdup A/B.
* export_json — 1.35x vs the round-1 baseline table, the last entry
  above it in the comparable-16.

Protocol (BASELINE.md round-9 rule + round-14 amendment): quiet
window, canaries before and after, min-of-3 per entry with the same
timing semantics as bench.py (cache_scope per entry, _force
materialization). Prints one JSON line; commit to tools/audits/.

Usage: python tools/adjudicate_r16.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exporter_spark import Exporter, ExportSpec  # noqa: E402
from exporter_spark.benchlib import cpu_canary, io_canary  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.queries import QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 3


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, n=N) -> list[float]:
    out = []
    for _ in range(n):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    return out


def main() -> None:
    spark = get_spark(
        "adjudicate_r16",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.sum("id")).collect()  # warm

    report: dict = {"sf_dir": SF_DIR}
    report["canary_before"] = {
        "cpu": cpu_canary(spark),
        "io": io_canary(spark),
    }

    with cache_scope():
        runs = timed(lambda: _force(QUERIES["semdedup_survivors"].fn(spark, SF_DIR)))
    report["semdedup_survivors"] = {"runs": runs, "min": min(runs)}

    li = load_table(spark, SF_DIR, "lineitem")
    out_root = tempfile.mkdtemp(prefix="adjudicate_r16_")
    try:
        runs = timed(
            lambda: Exporter(li, "json", ExportSpec()).write(f"{out_root}/json")
        )
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    report["export_json"] = {"runs": runs, "min": min(runs)}

    report["canary_after"] = {
        "cpu": cpu_canary(spark),
        "io": io_canary(spark),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
