#!/usr/bin/env python
"""Round-11 scale sweep for incremental (delta-vs-store) dedup.

The operator's entire reason to exist is "admit a fixed-size delta
without re-shuffling the corpus" (operators/incremental.py) — this
sweep proves it with numbers instead of design prose (VERDICT r10
item 4). Protocol:

* STORE SCALE K in {1, 10, 30, 100}: the sf0.1 documents table
  replicated Kx with scale_sweep_r8's protocol (disjoint doc_id
  strides, per-copy CJK letter rotation → zero cross-copy text
  overlap), signatures/digests written to REAL PARQUET per scale —
  an increment reads a store, not a lineage. The store holds ALL
  corpus docs' signatures (upper bound: a real store holds only
  survivors, which is smaller).
* FIXED DELTA at every scale: 500 docs — 250 exact copies of copy-0
  store content (re-keyed), which must be caught by the against-store
  band join, and 250 rotated into a fresh CJK block (novel), which
  must pass and be appended. Both sides of the increment contract are
  exercised at every scale.
* MEASURED per (scale, operator): min-of-N wall seconds and exact
  runtime shuffle bytes (benchlib stage_marker/shuffle_since — the
  eviction-immune protocol) for
    - the INCREMENT: incremental_{exact,minhash}_dedup(delta, store),
      forcing BOTH outputs (survivors + store append), vs
    - the BATCH RERUN equivalent: the full batch pipeline over
      corpus ∪ delta (hash_dedup resp. minhash pairs +
      keep-representatives), i.e. what admitting the delta costs
      when no store is kept.

Expected shape (the SCALE.md "done" bar): increment cost
flat-to-sublinear in K — the only store-size-dependent work is the
map-side signature scan + the banded join against it — while the
batch rerun grows ~linearly in K because the corpus itself re-runs
the whole pipeline.

Usage: python tools/incremental_sweep_r11.py [scales...]
       (default 1 10 30 100; SPARK_GRAFT_BENCH_REPEAT, default 2)
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import shuffle_since, stage_marker  # noqa: E402
from exporter_spark.operators.dedup import (  # noqa: E402
    content_digest,
    dedup_keep_representatives,
    hash_dedup,
    minhash_dedup_pairs,
)
from exporter_spark.operators.incremental import (  # noqa: E402
    incremental_exact_dedup,
    incremental_minhash_dedup,
    minhash_signatures,
)
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.queries import _MINHASH  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_STRIDE = 10_000_000
DELTA_STRIDE = 900_000_000  # far above any replica's id range
_LOWER = string.ascii_lowercase
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
_INC = dict(_MINHASH)  # registry parameters
# The batch-rerun comparison caps at 30x: its growth is already
# super-linear there (65s / 2.8 GB shuffled vs the increment's flat
# 5s / 1.6 MB), and a min-of-1 100x batch run adds ~20 min of wall
# for no new information about the INCREMENT — which is what this
# sweep measures to 100x. Same rationale as the r10 curation sweep's
# pretraining_mix_stats cap.
BATCH_MINHASH_MAX_SCALE = 30


def _block(i: int) -> str:
    return "".join(chr(0x4E00 + 26 * i + j) for j in range(26))


def _replicas(base, scale: int):
    parts = [base]
    for i in range(1, scale):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * DOC_STRIDE)).alias("doc_id"),
                F.translate("text", _LOWER, _block(i)).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _force(*dfs) -> None:
    for df in dfs:
        df.write.format("noop").mode("overwrite").save()


def _timed_with_bytes(spark, build_and_force, n: int = REPEAT):
    """(min wall sec, shuffle write bytes, shuffle read bytes) — bytes
    from the FIRST timed run (deterministic; repeats only tighten the
    wall reading). Marker taken BEFORE the builder runs: operators
    with eager internal jobs (connected_components pins its edge set
    at plan-construction time) shuffle inside the builder, not the
    noop write."""
    best = wbytes = rbytes = None
    for i in range(n):
        with cache_scope():
            marker = stage_marker(spark)
            t0 = time.perf_counter()
            build_and_force()
            dt = time.perf_counter() - t0
        if i == 0:
            wbytes, rbytes = shuffle_since(spark, marker)
        best = dt if best is None else min(best, dt)
    return round(best, 3), wbytes, rbytes


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 30, 100]
    spark = get_spark("exporter_spark-incsweep-r11")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    root = tempfile.mkdtemp(prefix="incsweep_r11_")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()

    # the fixed delta: 250 exact copies of copy-0 content + 250 novel
    head = base.filter(F.col("doc_id") < 500)
    delta = (
        head.filter(F.col("doc_id") < 250)
        .select((F.col("doc_id") + DELTA_STRIDE).alias("doc_id"), "text")
        .unionByName(
            head.filter(F.col("doc_id") >= 250).select(
                (F.col("doc_id") + DELTA_STRIDE).alias("doc_id"),
                F.translate("text", _LOWER, _block(399)).alias("text"),
            )
        )
    )
    delta_path = os.path.join(root, "delta.parquet")
    delta.write.mode("overwrite").parquet(delta_path)

    results: dict = {"sf_dir": SF_DIR, "n_base_docs": n_base, "scales": {}}
    try:
        for scale in scales:
            corpus = _replicas(base, scale)
            corpus_path = os.path.join(root, f"corpus_x{scale}.parquet")
            corpus.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(corpus_path)
            corpus_pq = spark.read.parquet(corpus_path)

            # store construction is amortized history at 100 TB —
            # built once per scale, untimed, persisted as parquet
            sig_path = os.path.join(root, f"sigs_x{scale}.parquet")
            minhash_signatures(
                corpus_pq, "doc_id", "text",
                num_hashes=_INC["num_hashes"], shingle_n=_INC["shingle_n"],
            ).write.mode("overwrite").parquet(sig_path)
            dig_path = os.path.join(root, f"digs_x{scale}.parquet")
            corpus_pq.select(
                content_digest(["text"]).alias("__digest__")
            ).write.mode("overwrite").parquet(dig_path)

            delta_pq = spark.read.parquet(delta_path)
            sigs_pq = spark.read.parquet(sig_path)
            digs_pq = spark.read.parquet(dig_path)
            row: dict = {"n_store_docs": n_base * scale}

            def inc_exact():
                surv, app = incremental_exact_dedup(
                    delta_pq, ["text"], "doc_id", seen_digests=digs_pq
                )
                _force(surv, app)

            row["inc_exact"] = _timed_with_bytes(spark, inc_exact)

            def batch_exact():
                _force(
                    hash_dedup(
                        corpus_pq.unionByName(delta_pq), ["text"], "doc_id"
                    )
                )

            row["batch_exact"] = _timed_with_bytes(
                spark, batch_exact, 1 if scale >= 30 else REPEAT
            )

            def inc_minhash():
                surv, app = incremental_minhash_dedup(
                    delta_pq, "doc_id", "text", sigs_pq, **_INC
                )
                _force(surv, app)

            row["inc_minhash"] = _timed_with_bytes(spark, inc_minhash)

            def batch_minhash():
                alld = corpus_pq.unionByName(delta_pq)
                pairs = minhash_dedup_pairs(alld, "doc_id", "text", **_INC)
                _force(dedup_keep_representatives(alld, pairs, "doc_id"))

            if scale <= BATCH_MINHASH_MAX_SCALE:
                row["batch_minhash"] = _timed_with_bytes(
                    spark, batch_minhash, 1 if scale >= 30 else REPEAT
                )

            results["scales"][scale] = row
            # incremental emission: a killed run still leaves every
            # completed scale's numbers parseable from stderr
            print(f"[incsweep] x{scale}: {json.dumps(row)}", file=sys.stderr)
            for p in (corpus_path, sig_path, dig_path):
                shutil.rmtree(p, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
