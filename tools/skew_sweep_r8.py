#!/usr/bin/env python
"""Round-8 SKEWED 100x sweep — duplication-heavy corpora.

The plain 100x sweep (`scale_sweep_r8.py`) replicates with DISJOINT
alphabets: zero cross-copy duplication, so it exercises volume, not
skew. This harness holds total volume at ~100x sf0.1 (500k docs) and
varies the duplication factor K: the corpus is R rotated (disjoint)
blocks x K IDENTICAL copies each, K in {1, 10, 50}.

K identical copies are the k²-blowup scenario `collapse_exact` exists
for (dedup.py `minhash_dedup_pairs`): without the collapse, candidate
pairs multiply by K² inside every LSH bucket; with it, the LSH stage
sees only the R-block distinct corpus and the K-expansion happens on
the OUTPUT pairs, which genuinely number ~K²/2 per exact group (they
exist in the answer, so emitting them is output cost, not waste).

Observables per shape, min-of-2 wall on the survivors pipeline
(pairs -> connected_components -> anti join):
  * wall time — must stay in the same band as the unskewed (R=100,
    K=1) point, never blow up with K;
  * survivors — must equal R x s1 (s1 = per-block survivors), the
    structural invariant that proves the collapse is value-exact at
    this scale, not just at the r04 3x proof.

Usage: python tools/skew_sweep_r8.py   (shapes fixed: 100x1, 10x10, 2x50)
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


def build(docs, r_blocks, k_copies, spark):
    """R disjoint rotated blocks x K identical copies each; doc_ids
    globally unique; pinned."""
    parts = []
    for i in range(r_blocks):
        block = "".join(chr(0x4E00 + 26 * i + j) for j in range(26))
        rotated = docs.select(
            F.col("doc_id"),
            (F.translate("text", _LOWER, block) if i else F.col("text")).alias(
                "text"
            ),
        )
        for k in range(k_copies):
            parts.append(
                rotated.select(
                    (
                        F.col("doc_id")
                        + F.lit((i * k_copies + k) * 10_000_000)
                    ).alias("doc_id"),
                    "text",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.repartition(spark.sparkContext.defaultParallelism)
    pinned = out.localCheckpoint()
    pinned.count()
    return pinned


def main():
    spark = get_spark("skew-sweep-r8")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    shapes = [(100, 1), (10, 10), (2, 50)]
    s1 = None
    for r_blocks, k_copies in shapes:
        d = build(docs, r_blocks, k_copies, spark)
        n_docs = d.count()

        def survivors():
            with cache_scope():
                pairs = dedup.minhash_dedup_pairs(d, "doc_id", "text", **_MINHASH)
                labels = dedup.connected_components(pairs)
                drop = labels.filter(F.col("id") != F.col("component")).select("id")
                return d.join(
                    drop, d["doc_id"] == drop["id"], "left_anti"
                ).count()

        best, surv = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            surv = survivors()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if s1 is None:
            s1 = surv // r_blocks  # per-block survivors from the K=1 shape
        expected = r_blocks * s1
        ok = "OK" if surv == expected else f"MISMATCH (want {expected})"
        print(
            f"R={r_blocks} K={k_copies} | docs={n_docs} | wall={best:.2f}s "
            f"| survivors={surv} -> {ok}",
            flush=True,
        )
        d.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
