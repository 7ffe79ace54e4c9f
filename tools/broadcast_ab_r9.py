#!/usr/bin/env python
"""Round-9 per-entry broadcast-policy A/B on the TPC-H join block.

VERDICT r08 flagged that q3/q4/q5/top_customers_per_nation drifted
1.5-2.25x between BENCH_r07 and BENCH_r08 while the uniform host
signature was 1.25x, and the runtime-stats broadcast policy
(session.py) is the only r08 change that touches join planning.  The
r08 A/B evidence was total-level; this tool settles it per-entry:

  * each policy runs in its OWN subprocess (the policy is a session
    config read from $SPARK_GRAFT_STATIC_BROADCAST_BYTES at JVM
    start, so it cannot be toggled inside one session);
  * policies are INTERLEAVED (runtime, static, runtime, static, ...)
    so slow host windows hit both arms;
  * every child run brackets its measurements with the same pure-CPU
    canary bench.py records, so readings can be drift-normalized;
  * per entry we report min-of-3 within each child and the min across
    the children of each arm.

Usage:
  python tools/broadcast_ab_r9.py            # parent: full A/B
  python tools/broadcast_ab_r9.py --reps 3   # more interleave rounds
  (child mode is internal: --child <policy>)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ENTRIES = [
    "q3_top_orders",
    "q4_priority_returns",
    "q5_region_revenue",
    "top_customers_per_nation",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Spark's historical default static threshold — the policy round 8
# turned off.  The A/B arm labelled "static" restores exactly it.
STATIC_BYTES = str(10 * 1024 * 1024)


def child(policy: str) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from exporter_spark.benchlib import cpu_canary, timed
    from exporter_spark.operators.partitioning import cache_scope
    from exporter_spark.queries import QUERIES
    from exporter_spark.session import get_spark
    from exporter_spark.sources.files import load_table

    spark = get_spark(f"broadcast-ab-{policy}")

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM/codegen init + one scan
    spark.range(1_000_000).select(F.sum("id")).collect()
    load_table(spark, SF_DIR, "lineitem").limit(1000).count()

    canary_pre = cpu_canary(spark)
    timings = {}
    for name in ENTRIES:
        with cache_scope():
            timings[name] = timed(lambda: _force(QUERIES[name].fn(spark, SF_DIR)))
    canary_post = cpu_canary(spark)
    print(
        json.dumps(
            {
                "policy": policy,
                "canary_pre": canary_pre,
                "canary_post": canary_post,
                "timings": timings,
            }
        )
    )


def parent(reps: int) -> None:
    runs: list[dict] = []
    for rep in range(reps):
        for policy in ("runtime", "static"):
            env = dict(os.environ)
            if policy == "static":
                env["SPARK_GRAFT_STATIC_BROADCAST_BYTES"] = STATIC_BYTES
            else:
                env.pop("SPARK_GRAFT_STATIC_BROADCAST_BYTES", None)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", policy],
                capture_output=True,
                text=True,
                env=env,
                cwd=REPO,
                check=True,
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            rec["rep"] = rep
            runs.append(rec)
            print(
                f"[ab] rep{rep} {policy}: canary {rec['canary_pre']}/"
                f"{rec['canary_post']} {rec['timings']}",
                file=sys.stderr,
            )
    result = {"entries": ENTRIES, "sf_dir": SF_DIR, "runs": runs, "best": {}}
    for policy in ("runtime", "static"):
        sel = [r for r in runs if r["policy"] == policy]
        result["best"][policy] = {
            e: min(r["timings"][e] for r in sel) for e in ENTRIES
        }
        result["best"][policy]["canary_min"] = min(
            min(r["canary_pre"], r["canary_post"]) for r in sel
        )
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None)
    ap.add_argument("--reps", type=int, default=2)
    a = ap.parse_args()
    if a.child:
        child(a.child)
    else:
        parent(a.reps)
