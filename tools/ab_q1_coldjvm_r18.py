#!/usr/bin/env python
"""Cold-JVM A/B for q1_pricing_summary's spread (VERDICT r17 #1).

The r17 builder's warm interleaved A/B said the spread wins 1.42x; the
driver's single cold bench run said 0.89x. This tool replicates the
DRIVER's methodology exactly — fresh JVM, bench.py's warmup actions,
cpu canary, then q1 timed min-of-3 with the noop sink under
cache_scope (q1 is the first timed entry of a bench run, so this is
its bench position) — one MODE per process:

    python tools/ab_q1_coldjvm_r18.py spread      # current code
    python tools/ab_q1_coldjvm_r18.py nospread    # spread() patched out

Interleave invocations (spread/nospread alternating) from a shell loop
and compare per-pair at like canary. Prints one line:
    q1 <mode> <sec> canary <cpu_canary>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import cpu_canary, timed  # noqa: E402
from exporter_spark.operators import partitioning  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "spread"
    if mode not in ("spread", "nospread"):
        print("usage: ab_q1_coldjvm_r18.py {spread|nospread}", file=sys.stderr)
        return 2
    if mode == "nospread":
        # q1 imports spread from partitioning inside its body; identity
        # here reverts exactly the one optimization under adjudication
        partitioning.spread = lambda df, *k: df

    spark = get_spark("exporter_spark-ab-q1")
    # bench.py's warmup, verbatim
    spark.range(1_000_000).select(F.sum("id")).collect()
    load_table(spark, SF_DIR, "lineitem").limit(1000).count()
    canary = cpu_canary(spark, REPEAT)

    from exporter_spark.queries import QUERIES

    def _force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    with cache_scope():
        t = timed(
            lambda: _force(QUERIES["q1_pricing_summary"].fn(spark, SF_DIR)), REPEAT
        )
    print(f"q1 {mode} {t} canary {canary}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
