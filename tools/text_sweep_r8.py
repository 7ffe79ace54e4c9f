#!/usr/bin/env python
"""Round-8 text-pillar sweep to 100x (r04/r05 stopped at 30x).

Same rotated-disjoint-replica protocol as `scale_sweep_r8.py` (per-
copy bijective CJK blocks, within-copy structure exact, cross-copy
overlap zero, localCheckpoint-pinned), min-of-2 wall on:

  * winnow_fingerprints — count() forces selection end-to-end (the
    per-doc window sort is the dominant term);
  * gopher_signals (java kernel) — aggregated via a checksum over two
    signal columns so every row is computed;
  * bm25_topk — fixed 3-term query, k=10;
  * dsir_weights — 64 buckets, sum(weight) forces the full join.

Usage: python tools/text_sweep_r8.py [scales...]   (default 1 10 30 100)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.operators import retrieval, sampling, text  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402
from scale_sweep_r8 import replicate_rotated, timed  # noqa: E402


def main():
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark("text-sweep-r8")
    docs = load_table(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ), "documents").select("doc_id", "text")

    for scale in scales:
        d = replicate_rotated(docs, scale, spark)
        n = d.count()
        res = {}

        def run(name, fn):
            with cache_scope():
                res[name] = timed(fn, 2)

        run("winnow", lambda: text.winnow_fingerprints(d).count())
        run(
            "gopher",
            lambda: text.gopher_signals(d, kernel="java")
            .agg(F.sum("word_cnt"), F.sum("dup_word_frac"))
            .collect(),
        )
        run(
            "bm25",
            lambda: retrieval.bm25_topk(
                d, ["data", "model", "training"], k=10
            ).count(),
        )
        run(
            "dsir",
            lambda: sampling.dsir_weights(d, F.col("doc_id") % 7 == 0)
            .agg(F.sum("dsir_weight"))
            .collect(),
        )
        print(
            f"{scale}x | docs={n} | "
            + " ".join(f"{k}={v}s" for k, v in res.items()),
            flush=True,
        )
        d.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
