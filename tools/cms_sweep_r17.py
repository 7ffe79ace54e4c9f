#!/usr/bin/env python
"""Round-17 count-min-sketch corpus-scale sweep.

Claim under test: the sketch-build shuffle is bounded by the GRID
(depth x width cells per map partition), independent of corpus size
AND vocabulary size — the point of sketching token statistics at
100 TB, where the exact count it replaces shuffles one key per
DISTINCT token.

The sf0.1 documents corpus has a 31-token vocabulary, which INVERTS
that comparison (an exact agg over 31 keys is trivially cheaper than
a 13,595-cell grid) — so this sweep uses a synthetic token stream in
the regime the sketch exists for: vocabulary growing with the corpus
(V = n/10 distinct tokens, 30% of traffic concentrated on 100 hot
tokens), n = 2M x scale occurrences. Recorded per scale:

* build: sketch-build shuffle bytes + wall (expect ~flat — grid-
  bounded — while corpus and vocab grow 25x);
* exact_agg: the exact groupBy(token) it replaces (expect shuffle
  bytes growing with VOCABULARY);
* estimate200: grid build + broadcast-estimate of a fixed 200-token
  candidate set;
* identity checks: sketch total == depth x n (every occurrence lands
  in every row), cell count <= grid cap, and cms_merge of two half-
  corpus sketches == the monolithic sketch's total.

Prints one JSON line; commit to tools/audits/r17_cms_sweep.json.
Usage: python tools/cms_sweep_r17.py [scales...]   (default 1 5 25)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import shuffle_since, stage_marker  # noqa: E402
from exporter_spark.operators import cms  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402

BASE_N = 2_000_000
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
WIDTH, DEPTH = cms.cms_params(0.001, 0.01)


def _stream(spark, n: int):
    """n token occurrences, vocab n/10, 30% of traffic on 100 hot
    tokens — md5-scrambled ids so tokens are realistic short strings
    and the hot set is spread over the hash space."""
    v = max(1000, n // 10)
    # NOTE: no repartition — spark.range is already parallel, and a
    # repartition here would shuffle the raw id stream inside every
    # measured run, swamping the grid-bounded agg shuffle under test
    return (
        spark.range(n, numPartitions=32)
        .select(
            F.when(
                F.col("id") % 10 < 3,
                F.concat(F.lit("hot"), (F.col("id") % 100).cast("string")),
            )
            .otherwise(
                F.concat(F.lit("t"), (F.col("id") % v).cast("string"))
            )
            .alias("tok")
        )
    )


def _timed(spark, fn, n=REPEAT):
    best = wbytes = rbytes = None
    for i in range(n):
        with cache_scope():
            marker = stage_marker(spark)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
        if i == 0:
            wbytes, rbytes = shuffle_since(spark, marker)
        best = dt if best is None else min(best, dt)
    return round(best, 3), wbytes, rbytes


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    spark = get_spark(
        "exporter_spark-cmssweep-r17",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    cand = (
        spark.range(200)
        .select(F.concat(F.lit("hot"), (F.col("id") % 100).cast("string")).alias("tok"))
        .distinct()
        .cache()
    )
    cand.count()
    results: dict = {
        "base_n": BASE_N,
        "width": WIDTH,
        "depth": DEPTH,
        "grid_cap": DEPTH * WIDTH,
        "repeat": REPEAT,
        "scales": {},
    }
    for scale in scales:
        n = BASE_N * scale
        toks = _stream(spark, n)

        def run_build():
            return cms.cms_build(toks, "tok", depth=DEPTH, width=WIDTH).count()

        def run_estimate():
            sk = cms.cms_build(toks, "tok", depth=DEPTH, width=WIDTH)
            return cms.cms_estimate(
                cand, sk, "tok", depth=DEPTH, width=WIDTH
            ).count()

        def run_exact():
            return toks.groupBy("tok").agg(F.count("*")).count()

        wall_b, w_b, r_b = _timed(spark, run_build)
        wall_e, w_e, r_e = _timed(spark, run_estimate)
        wall_x, w_x, r_x = _timed(spark, run_exact)
        with cache_scope():
            sk = cms.cms_build(toks, "tok", depth=DEPTH, width=WIDTH)
            n_cells = sk.count()
            total = sk.agg(F.sum("cnt")).collect()[0][0]
            half = n // 2
            a = cms.cms_build(
                _stream(spark, n).where(F.spark_partition_id() % 2 == 0),
                "tok", depth=DEPTH, width=WIDTH,
            )
            b = cms.cms_build(
                _stream(spark, n).where(F.spark_partition_id() % 2 == 1),
                "tok", depth=DEPTH, width=WIDTH,
            )
            merged_total = (
                cms.cms_merge(a, b).agg(F.sum("cnt")).collect()[0][0]
            )
        results["scales"][str(scale)] = {
            "occurrences": n,
            "vocab_approx": max(1000, n // 10) + 100,
            "sketch_cells": n_cells,
            "build": {"wall_s": wall_b, "shuffle_w": w_b, "shuffle_r": r_b},
            "estimate200": {
                "wall_s": wall_e, "shuffle_w": w_e, "shuffle_r": r_e,
            },
            "exact_agg": {
                "wall_s": wall_x, "shuffle_w": w_x, "shuffle_r": r_x,
            },
            "sketch_total_is_depth_x_n": total == DEPTH * n,
            "merge_total_matches": merged_total == total,
            "cells_within_grid_cap": n_cells <= DEPTH * WIDTH,
        }
        del half
    spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
