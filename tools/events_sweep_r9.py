#!/usr/bin/env python
"""Round-9 scale sweep for the window/sessionization/events family.

Completes the per-pillar curve set (r08: dedup/text/ANN/streaming/
exports; r09 earlier: TPC-H joins): the window-function family —
sessionization via lag/cumsum, event-time aggregation, cohort
retention, percentile aggregates, self-window error adjacency — never
had its own curve.

Scaling direction matches how an events table actually grows at
100 TB: MORE USERS at constant per-user density. Each copy shifts
``user_id`` (and re-keys ``event_id``) by a disjoint stride, so
per-user session structure, cohort shapes, and funnel rates are
preserved exactly while the partition-key cardinality grows Kx —
the regime Spark window functions must scale in (state per key
constant, keys grow). Each scale is real parquet in a temp dir with
the other tables symlinked; the REGISTRY functions run unmodified.

Usage: python tools/events_sweep_r9.py [scales...]   (default 1 10 50)
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

from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.queries import QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SWEEP_QUERIES = (
    "events_hourly",
    "events_sessions",
    "value_percentiles",
    "conversion_funnel",
    "retention_cohorts",
    "purchases_near_errors",
)
OTHER_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
)
USER_STRIDE = 10_000_000
EVENT_STRIDE = 1_000_000_000
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))


def build_scaled_dir(spark, scale: int, root: str) -> str:
    d = os.path.join(root, f"x{scale}")
    os.makedirs(d, exist_ok=True)
    for t in OTHER_TABLES:
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    base = load_table(spark, SF_DIR, "events")
    parts = [base]
    for i in range(1, scale):
        parts.append(
            base.withColumn("user_id", F.col("user_id") + F.lit(i * USER_STRIDE))
            .withColumn("event_id", F.col("event_id") + F.lit(i * EVENT_STRIDE))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))
    return d


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark("exporter_spark-eventsweep-r9")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    root = tempfile.mkdtemp(prefix="eventsweep_r9_")
    results: dict[str, dict] = {}
    try:
        for scale in scales:
            d = build_scaled_dir(spark, scale, root)
            for name in SWEEP_QUERIES:
                best = None
                with cache_scope():
                    # one untimed pass: plan compile + codegen + file
                    # listing are per-(plan, dir) costs that dominated
                    # 1x readings and flattened the curve
                    _force(QUERIES[name].fn(spark, d))
                    for _ in range(REPEAT):
                        t0 = time.perf_counter()
                        _force(QUERIES[name].fn(spark, d))
                        dt = time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                results.setdefault(name, {})[scale] = round(best, 3)
                print(
                    f"[eventsweep] x{scale} {name}: {best:.3f}s",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
