#!/usr/bin/env python
"""Isolated export-entry timing with bench.py's exact methodology
(min-of-3, same writers, same temp-dir layout, canaries printed) —
the round-17 optimization A/B harness for the export family."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark import Exporter, ExportSpec  # noqa: E402
from exporter_spark.benchlib import cpu_canary, io_canary, timed  # noqa: E402
from exporter_spark.formatters.json import JSONFormatter  # noqa: E402
from exporter_spark.formatters.xml import XMLFormatter  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))


def main() -> int:
    spark = get_spark("exporter_spark-export-ab")
    spark.range(1_000_000).select(F.sum("id")).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    li.limit(1000).count()
    print(f"cpu_canary {cpu_canary(spark, N)}")
    print(f"io_canary {io_canary(spark, N)}")
    out_root = tempfile.mkdtemp(prefix="export_ab_")
    try:
        for fmt in ("csv", "json", "xml", "parquet"):
            t = timed(
                lambda fmt=fmt: Exporter(li, fmt, ExportSpec()).write(
                    f"{out_root}/{fmt}"
                ),
                N,
            )
            print(f"export_{fmt} {t}")
        t = timed(
            lambda: XMLFormatter(ExportSpec()).write(
                li, f"{out_root}/xml_docs", documents=True
            ),
            N,
        )
        print(f"export_xml_docs {t}")
        t = timed(
            lambda: JSONFormatter(ExportSpec()).write_array_file(
                li, f"{out_root}/li_arr.json"
            ),
            N,
        )
        print(f"export_json_array {t}")
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
