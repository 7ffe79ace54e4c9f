#!/usr/bin/env python
"""Round-8 100x scale sweep for the two heaviest bench entries.

Protocol (same family as the r04/r05 sweeps, extended to 100x):
sf0.1 documents replicated Nx with each copy's lowercase alphabet
substituted into a DISJOINT 26-char CJK block (bijective per copy, so
within-copy duplicate structure — char shingles AND token grams — is
preserved exactly, while cross-copy overlap is zero for ALL copies;
the r04 rotation collides again at copy 26, this one never does).
Input pinned via localCheckpoint so only the operator is timed.

Observables per scale, min-of-R wall:
  * minhash_dedup_survivors — pairs -> connected_components -> anti
    join; also records CC rounds-to-converge (stats= hook), the
    leading indicator of diameter growth.
  * exact_substring_strip — span detection + cut + reassembly; forced
    through sum(length(clean_text)) so reassembly actually runs.

Usage: python tools/scale_sweep_r8.py [scales...]   (default 1 10 30 100)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.operators import dedup  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_MINHASH = dict(num_hashes=32, bands=8, shingle_n=8, threshold=0.7)
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def replicate_rotated(docs, n, spark):
    """n copies, copy i's letters mapped into CJK block i (copy 0 is
    the original); doc_ids re-keyed disjointly; pinned."""
    parts = [docs]
    for i in range(1, n):
        block = "".join(chr(0x4E00 + 26 * i + j) for j in range(26))
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate("text", _LOWER, block).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.repartition(spark.sparkContext.defaultParallelism)
    pinned = out.localCheckpoint()
    pinned.count()
    return pinned


def timed(fn, repeats):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main():
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark("scale-sweep-r8")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    print(f"# sweep at {SF_DIR}, scales {scales}")
    for scale in scales:
        d = replicate_rotated(docs, scale, spark)
        n_docs = d.count()
        repeats = 2 if scale <= 30 else 2

        rounds_seen = []

        def survivors():
            stats: dict = {}
            with cache_scope():
                pairs = dedup.minhash_dedup_pairs(d, "doc_id", "text", **_MINHASH)
                labels = dedup.connected_components(pairs, stats=stats)
                drop = labels.filter(F.col("id") != F.col("component")).select("id")
                n = d.join(drop, d["doc_id"] == drop["id"], "left_anti").count()
            rounds_seen.append(stats.get("rounds"))
            return n

        t_surv = timed(survivors, repeats)

        def strip():
            with cache_scope():
                out = dedup.strip_duplicate_spans(d, k=10, min_count=2)
                out.agg(F.sum(F.length("clean_text"))).collect()

        t_strip = timed(strip, repeats)
        print(
            f"{scale}x | docs={n_docs} | survivors={t_surv}s "
            f"(cc_rounds={rounds_seen}) | strip={t_strip}s",
            flush=True,
        )
        d.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
