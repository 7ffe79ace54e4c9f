#!/usr/bin/env python
"""Round-8 ANN-tier sweep to 100x (r05 stopped at 10x).

Protocol (same as the r05 similarity-pillar sweep): replicas are
per-copy INDEPENDENT pseudo-random unit-range vectors — identical
copies would explode near-dup output quadratically and measure output
volume, not engine throughput. Copy 0 is the real sf0.1 embeddings
table; copy i>0 derives value (vec_id, i, j) from xxhash64, mapped
into [-1, 1]. Pinned via localCheckpoint; min-of-2 wall.

Tiers: cosine_topk_scan (exact, the 100 TB shape), lsh_topk,
ivf_fixed_topk (deterministic quantizer), embedding_near_dup_banded,
semdedup(greedy).

The banded/semdedup tiers follow the log2(n) signature-sizing rule
(SCALE.md round-8 ANN section): bucket count is 2^bits, so FIXED bits
let buckets — and the per-bucket all-pairs verify — grow with the
corpus. The fixed-bits variant measured the quadratic bend (banded
1.71/8.96/46.8s at 1/10/30x); this harness sizes bits for a ~500-max
expected bucket at each scale, which is what a 100 TB caller must do.

Usage: python tools/ann_sweep_r8.py [scales...]   (default 1 10 30 100)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.operators import similarity  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIMS = 64


def replicate(emb, n, spark):
    parts = [emb.select("vec_id", "embedding")]
    for i in range(1, n):
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(DIMS - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i), j), F.lit(20001))
                / 10000.0
                - 1.0
            ).cast("float"),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                vec.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.repartition(spark.sparkContext.defaultParallelism)
    pinned = out.localCheckpoint()
    pinned.count()
    return pinned


def timed(fn, repeats=2):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main():
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark("ann-sweep-r8")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    queries.cache().count()
    centroid_ids = [r[0] for r in emb.filter("vec_id % 125 = 7").select("vec_id").collect()][:16]

    for scale in scales:
        d = replicate(emb, scale, spark)
        n = d.count()
        res = {}

        def run(name, fn):
            with cache_scope():
                res[name] = timed(lambda: fn().count())

        run("scan", lambda: similarity.cosine_topk_scan(d, queries, 10))
        run("lsh", lambda: similarity.lsh_topk(d, queries, 10, dims=DIMS))
        run(
            "ivf",
            lambda: similarity.ivf_fixed_topk(
                d, queries, 10, centroid_ids=centroid_ids
            ),
        )
        # signature-sizing rule: expected bucket ~ n / 2^bits <= 500
        bits = max(4, math.ceil(math.log2(n / 500)))
        run(
            "banded",
            lambda: similarity.embedding_near_dup_banded(
                d, dims=DIMS, planes_per_table=bits
            ),
        )
        run(
            "semdedup",
            lambda: similarity.semdedup(d, dims=DIMS, planes=max(8, bits)),
        )
        print(
            f"{scale}x | vecs={n} | bits={bits} | "
            + " ".join(f"{k}={v}s" for k, v in res.items()),
            flush=True,
        )
        d.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
