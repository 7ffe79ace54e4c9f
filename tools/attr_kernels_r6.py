#!/usr/bin/env python
"""Round-6 CPU attribution for the remaining Python compute in
flagship paths (VERDICT r05 item 3), using the same methodology as
the round-5 Gopher go/no-go (SCALE.md): localCheckpoint-pinned input
replicated 1x/10x/30x, min-of-3 wall per variant, and per kernel
three variants that partition the time:

  * full    — the real kernel
  * arrow   — a no-op pandas UDF with the same output type (isolates
              Arrow transfer + Python-worker overhead)
  * jvm     — a cheap JVM expression over the same scan (isolates
              scan + plan fixed costs)

python-compute share = (full - arrow) / full at each scale; a kernel
is a JVM-twin GO only if that share dominates at 10-30x the way
Gopher's 75% did.

Kernels measured:
  1. simhash32 fingerprint UDF (dedup._simhash32_fast) over documents
  2. LSH hyperplane signature UDF (similarity._make_sig_udf) over
     embeddings
  3. numpy dot+norm kernels vs their SQL HOF twins (cosine scoring)
  4. cosine_topk_scan's mapInPandas scan kernel vs a pass-through
     mapInPandas

Usage: python tools/attr_kernels_r6.py [sf_dir] [repeat]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
from pyspark.sql.types import DoubleType, LongType  # noqa: E402

from bench import _force  # noqa: E402 — the canonical plan-forcing strategy
from exporter_spark.operators import dedup, similarity  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SCALES = (1, 10, 30)


def timed(fn):
    best = None
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


@pandas_udf(LongType())
def _noop_long(s: pd.Series) -> pd.Series:
    return pd.Series([0] * len(s))


@pandas_udf(DoubleType())
def _noop_double(s: pd.Series) -> pd.Series:
    return pd.Series([0.0] * len(s))


def replicate(df, n, spark):
    if n == 1:
        out = df
    else:
        out = df
        for _ in range(n - 1):
            out = out.union(df)
    out = out.repartition(spark.sparkContext.defaultParallelism)
    pinned = out.localCheckpoint()
    return pinned


def report(name, rows):
    print(f"\n== {name} ==")
    print("scale | full | arrow(noop-udf) | jvm | python-share")
    for scale, full, arrow, jvm in rows:
        share = max(0.0, (full - arrow) / full) if full else 0.0
        print(f"{scale}x | {full}s | {arrow}s | {jvm}s | {share:.0%}")


def main():
    spark = get_spark("attr-kernels-r6")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")

    # 1. simhash fingerprint UDF
    rows = []
    for scale in SCALES:
        d = replicate(docs, scale, spark)
        udf = dedup._simhash32_fast()
        full = timed(lambda: _force(d.select(udf(F.col("text")).alias("h"))))
        arrow = timed(lambda: _force(d.select(_noop_long(F.col("text")).alias("h"))))
        jvm = timed(lambda: _force(d.select(F.xxhash64("text").alias("h"))))
        rows.append((scale, full, arrow, jvm))
        d.unpersist(True)
    report("simhash32 fingerprint UDF (documents.text)", rows)

    # 2. LSH hyperplane signature UDF (production _NEARDUP shape)
    from exporter_spark.queries import _NEARDUP

    dims, planes = _NEARDUP["dims"], _NEARDUP["planes"]
    H = [
        [similarity.hyperplane_component(p, j) for j in range(dims)]
        for p in range(planes)
    ]
    rows = []
    for scale in SCALES:
        e = replicate(emb, scale, spark)
        udf = similarity._make_sig_udf(H)
        full = timed(lambda: _force(e.select(udf(F.col("embedding")).alias("s"))))
        arrow = timed(
            lambda: _force(e.select(_noop_long(F.col("embedding")).alias("s")))
        )
        jvm = timed(lambda: _force(e.select(F.size("embedding").alias("s"))))
        rows.append((scale, full, arrow, jvm))
        e.unpersist(True)
    report(f"LSH signature UDF (dims={dims}, planes={planes})", rows)

    # 3. numpy norm kernel vs SQL HOF twin (per-vector work)
    rows = []
    for scale in SCALES:
        e = replicate(emb, scale, spark)
        full = timed(
            lambda: _force(e.select(similarity.norm_fast("embedding").alias("n")))
        )
        arrow = timed(
            lambda: _force(e.select(_noop_double(F.col("embedding")).alias("n")))
        )
        jvm = timed(
            lambda: _force(e.select(similarity.norm("embedding").alias("n")))
        )
        rows.append((scale, full, arrow, jvm))
        e.unpersist(True)
    report("numpy norm kernel (jvm column = SQL HOF twin)", rows)

    # 4. cosine_topk_scan mapInPandas kernel vs pass-through mapInPandas
    rows = []
    for scale in SCALES:
        e = replicate(emb, scale, spark)
        base = load_table(spark, SF_DIR, "embeddings")
        q = base.limit(5).select("vec_id", "embedding")
        full = timed(
            lambda: _force(
                similarity.cosine_topk_scan(
                    e, q, id_col="vec_id", vec_col="embedding", k=5
                )
            )
        )

        def passthrough(it):
            for pdf in it:
                yield pdf[["vec_id"]]

        arrow = timed(
            lambda: _force(e.mapInPandas(passthrough, schema="vec_id long"))
        )
        jvm = timed(lambda: _force(e.select(F.size("embedding").alias("s"))))
        rows.append((scale, full, arrow, jvm))
        e.unpersist(True)
    report("cosine_topk_scan mapInPandas kernel (5 queries, k=5)", rows)


if __name__ == "__main__":
    main()
