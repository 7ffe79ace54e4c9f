#!/usr/bin/env python
"""Round-10 scale sweep for the sampling/curation + multimodal family.

Completes the per-pillar curve matrix (r08: dedup/text/ANN/streaming/
exports/skew; r09: TPC-H joins + events/window family): the
sampling/mixture operators — hash-threshold stratified sampling,
train/test split, per-source caps, mixture rebalancing, temperature
sampling, deterministic shuffle, chunk packing, token budgets, and the
pretraining_mix_stats composition — plus the multimodal Arrow path
never had their own curve.

Scaling direction matches how a curation corpus actually grows at
100 TB: MORE DOCUMENTS per stratum at constant stratum cardinality
(sources stay 20, langs stay 5; rows per group grow Kx). Each copy
re-keys ``doc_id`` by a disjoint stride and rotates the text's ASCII
letters into a per-copy CJK block (scale_sweep_r8's protocol), so:

  * group structure is preserved exactly — the mixture/threshold
    arithmetic sees the same per-source shares at every scale;
  * cross-copy text overlap is ZERO — pretraining_mix_stats' embedded
    ExactSubstr strip keeps its within-copy duplicate structure
    instead of degenerating to "everything is duplicated Kx";
  * hash-threshold selections (doc_id-salted md5) draw fresh,
    well-mixed keys per copy.

Each scale is real parquet in a temp dir with the other tables
symlinked; the REGISTRY functions run unmodified — the curve measures
exactly the code the driver verifies.

Usage: python tools/curation_sweep_r10.py [scales...] (default 1 10 50 100)
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

from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.queries import QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# (query, max_scale) — pretraining_mix_stats caps at 50x: its dominant
# term (ExactSubstr span stripping) already has a dedicated 100x curve
# in the r08 dedup sweep, and min-of-2 at 100x would add ~10 min of
# wall for no new information about the composition glue.
SWEEP_QUERIES = (
    ("docs_stratified_sample", 100),
    ("docs_train_test_split", 100),
    ("docs_capped_per_source", 100),
    ("docs_rebalanced_mixture", 100),
    ("temperature_mixture_docs", 100),
    ("training_shuffle_docs", 100),
    ("pack_chunks_docs", 100),
    ("lang_token_budget", 100),
    ("pretraining_mix_stats", 50),
    ("multimodal_feature_stats", 100),
)
OTHER_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)
DOC_STRIDE = 10_000_000
_LOWER = string.ascii_lowercase
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))


def build_scaled_dir(spark, scale: int, root: str) -> str:
    d = os.path.join(root, f"x{scale}")
    os.makedirs(d, exist_ok=True)
    for t in OTHER_TABLES:
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    base = load_table(spark, SF_DIR, "documents")
    parts = [base]
    for i in range(1, scale):
        block = "".join(chr(0x4E00 + 26 * i + j) for j in range(26))
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * DOC_STRIDE)).alias("doc_id"),
                F.translate("text", _LOWER, block).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 50, 100]
    spark = get_spark("exporter_spark-curationsweep-r10")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    root = tempfile.mkdtemp(prefix="curationsweep_r10_")
    results: dict[str, dict] = {}
    try:
        for scale in scales:
            d = build_scaled_dir(spark, scale, root)
            for name, max_scale in SWEEP_QUERIES:
                if scale > max_scale:
                    continue
                best = None
                with cache_scope():
                    # one untimed pass: plan compile + codegen + file
                    # listing are per-(plan, dir) costs that dominated
                    # 1x readings in the r9 sweeps
                    _force(QUERIES[name].fn(spark, d))
                    for _ in range(REPEAT):
                        t0 = time.perf_counter()
                        _force(QUERIES[name].fn(spark, d))
                        dt = time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                results.setdefault(name, {})[scale] = round(best, 3)
                print(
                    f"[curationsweep] x{scale} {name}: {best:.3f}s",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
