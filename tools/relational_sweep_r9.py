#!/usr/bin/env python
"""Round-9 scale sweep for the TPC-H relational block under the
runtime-stats broadcast policy.

The r08 sweeps measured dedup/text/ANN/streaming/exports to 100x; the
relational join block never got its own curve, and it is exactly the
block the r08 broadcast-policy change touches. This sweep:

  * replicates sf0.1 ``lineitem`` + ``orders`` Kx with DISJOINT
    re-keyed orderkeys (stride 10M >> max key 149,999) — foreign keys
    into the fixed dims stay valid, so every registry query runs
    UNMODIFIED ("more orders from the same customers");
  * materializes each scale as real parquet in a temp dir with the
    dims symlinked, so filters/pruning hit a genuine file scan and
    file-split parallelism grows with the data (what a cluster sees),
    rather than timing against an in-memory checkpoint;
  * runs the REGISTRY functions (q1/q3/q4/q5) against that dir,
    min-of-R wall via collect() — results are ≤10 rows, so collect
    both is safe and yields the FINAL adaptive plan;
  * records the BroadcastHashJoin / SortMergeJoin counts of the final
    plan per scale — the direct observable of the policy doing its
    job: AQE broadcasts from EXACT runtime sizes while sides fit and
    degrades to sort-merge when they don't, with no estimate cliff.

Usage: python tools/relational_sweep_r9.py [scales...]  (default 1 10 50)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.queries import QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SWEEP_QUERIES = (
    "q1_pricing_summary",
    "q3_top_orders",
    "q4_priority_returns",
    "q5_region_revenue",
)
DIMS = ("region", "nation", "customer", "supplier", "part")
KEY_STRIDE = 10_000_000
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))


def build_scaled_dir(spark, scale: int, root: str) -> str:
    """{root}/x{scale} with lineitem/orders replicated ``scale`` times
    (orderkeys re-keyed disjointly) and the dim tables symlinked."""
    d = os.path.join(root, f"x{scale}")
    os.makedirs(d, exist_ok=True)
    for t in DIMS:
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        base = load_table(spark, SF_DIR, t)
        parts = [base]
        for i in range(1, scale):
            parts.append(
                base.withColumn(key, F.col(key) + F.lit(i * KEY_STRIDE))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(spark.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    return d


def join_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "final": "isFinalPlan=true" in plan,
    }


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark("exporter_spark-relsweep-r9")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    root = tempfile.mkdtemp(prefix="relsweep_r9_")
    results: dict[str, dict] = {}
    try:
        for scale in scales:
            d = build_scaled_dir(spark, scale, root)
            for name in SWEEP_QUERIES:
                best, jc = None, None
                for _ in range(REPEAT):
                    df = QUERIES[name].fn(spark, d)
                    t0 = time.perf_counter()
                    n = len(df.collect())
                    dt = time.perf_counter() - t0
                    if best is None or dt < best:
                        best = dt
                        jc = join_counts(df)
                results.setdefault(name, {})[scale] = {
                    "sec": round(best, 3),
                    "rows": n,
                    **jc,
                }
                print(
                    f"[relsweep] x{scale} {name}: {best:.3f}s rows={n} "
                    f"BHJ={jc['bhj']} SMJ={jc['smj']} final={jc['final']}",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
