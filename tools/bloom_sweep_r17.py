#!/usr/bin/env python
"""Round-17 bloom-screen store-scale sweep (VERDICT r16 #5).

Claim under test: with the Bloom sidecar PERSISTED (the production
path — built once, OR-merged per append via bloom_union), the
per-increment cost of the screened face is delta-sized at ANY store
scale:

* probe+confirm shuffle bytes must be ~constant from 1x to 100x
  store (the blocks table broadcasts; only the delta and its
  maybe-set shuffle);
* the sidecar append (bloom_union of a delta-built filter) is
  bounded by the BLOCKS table (num_bits/32 rows — it grows with
  fill until saturation, then plateaus), never by store rows;
* survivors must equal incremental_exact_dedup's at every scale
  (the no-false-negatives guarantee, checked not assumed).

The store is synthetic digest rows (the screen operates on the store
SCHEMA — a single digest column — so corpus text is irrelevant
here); the delta is 500 digests, half present in the store at every
scale, half new. Prints one JSON line; commit to
tools/audits/r17_bloom_sweep.json.

Usage: python tools/bloom_sweep_r17.py [scales...]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import shuffle_since, stage_marker  # noqa: E402
from exporter_spark.operators import bloom  # noqa: E402
from exporter_spark.operators.incremental import (  # noqa: E402
    DIGEST_COL,
    incremental_exact_dedup,
)
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402

REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
BASE_STORE = 20_000
DELTA_N = 500
# production-shaped sizing for the 100x store (2M digests):
# ~10 bits/doc at the LARGEST scale, shared across scales so the
# blocks table is identical work everywhere
NUM_BITS, NUM_HASHES = bloom.bloom_params(BASE_STORE * 100, 0.01)


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
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        "exporter_spark-bloomsweep-r17",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    root = tempfile.mkdtemp(prefix="bloomsweep_r17_")

    # delta: half store members (tag s, ids 0..249 — present at every
    # scale), half new (tag x)
    delta_rows = [
        (i, hashlib.sha256(f"s{i}".encode()).hexdigest())
        for i in range(DELTA_N // 2)
    ] + [
        (10_000_000 + i, hashlib.sha256(f"x{i}".encode()).hexdigest())
        for i in range(DELTA_N // 2)
    ]
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")
    # the sweep keys dedup on "text" holding the digest itself —
    # content_digest is injective, so survivor comparisons are exact
    results: dict = {
        "base_store": BASE_STORE,
        "delta_rows": DELTA_N,
        "num_bits": NUM_BITS,
        "num_hashes": NUM_HASHES,
        "repeat": REPEAT,
        "scales": {},
    }
    try:
        for scale in scales:
            n = BASE_STORE * scale
            store_path = os.path.join(root, f"store_{scale}.parquet")
            # the persisted digest store: delta's member digests are
            # the CONTENT-digests of texts "s0".."s249"; store rows
            # must be content_digest(text) of those texts, so build
            # the store from the same text space
            texts = spark.range(n).select(
                F.sha2(
                    F.concat(F.lit("s"), F.col("id").cast("string")), 256
                ).alias("text")
            )
            tagged = texts.withColumn(
                DIGEST_COL,
                F.sha2(
                    F.concat(
                        F.lit("v"),
                        F.length("text").cast("string"),
                        F.lit(":"),
                        F.col("text"),
                    ),
                    256,
                ),
            )
            tagged.select(DIGEST_COL).write.mode("overwrite").parquet(store_path)
            store = spark.read.parquet(store_path)
            # sidecar: built once per store (production: OR-merged per
            # append), persisted like the digest store
            sidecar_path = os.path.join(root, f"bloom_{scale}.parquet")
            bloom.bloom_build(
                store, num_bits=NUM_BITS, num_hashes=NUM_HASHES
            ).write.mode("overwrite").parquet(sidecar_path)
            sidecar = spark.read.parquet(sidecar_path)
            n_blocks = sidecar.count()

            # delta texts: member half already holds the same
            # "s{i}" sha-strings the store was built from (python-
            # side), so its content digests hit store rows exactly
            sdelta = delta

            def run_screened():
                surv, _ = bloom.incremental_bloom_dedup(
                    sdelta, ["text"], "doc_id", seen_digests=store,
                    seen_bloom=sidecar, num_bits=NUM_BITS,
                    num_hashes=NUM_HASHES,
                )
                return surv.count()

            def run_exact():
                surv, _ = incremental_exact_dedup(
                    sdelta, ["text"], "doc_id", seen_digests=store
                )
                return surv.count()

            def run_append():
                delta_filter = bloom.bloom_build(
                    sdelta.select(
                        F.sha2(
                            F.concat(
                                F.lit("v"),
                                F.length("text").cast("string"),
                                F.lit(":"),
                                F.col("text"),
                            ),
                            256,
                        ).alias(DIGEST_COL)
                    ),
                    num_bits=NUM_BITS,
                    num_hashes=NUM_HASHES,
                )
                return bloom.bloom_union(sidecar, delta_filter).count()

            with cache_scope():
                n_screen = run_screened()
                n_exact = run_exact()
            wall_s, w_s, r_s = _timed(spark, run_screened)
            wall_e, w_e, r_e = _timed(spark, run_exact)
            wall_a, w_a, r_a = _timed(spark, run_append)
            results["scales"][str(scale)] = {
                "store_rows": n,
                "bloom_blocks": n_blocks,
                "screened_survivors": n_screen,
                "exact_survivors": n_exact,
                "survivors_match": n_screen == n_exact == DELTA_N // 2,
                "screened": {"wall_s": wall_s, "shuffle_w": w_s, "shuffle_r": r_s},
                "exact": {"wall_s": wall_e, "shuffle_w": w_e, "shuffle_r": r_e},
                "sidecar_append": {
                    "wall_s": wall_a, "shuffle_w": w_a, "shuffle_r": r_a,
                },
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
