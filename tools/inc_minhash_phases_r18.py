#!/usr/bin/env python
"""Phase-level timing of incremental_minhash_survivors (VERDICT r17
#2): where do the ~5s go? Times, under one cache_scope like the bench
entry, with the noop sink:

  A. store-half bootstrap alone (force the returned sig store)
  B. the full entry (store half + delta half + probe), fresh scope
  C. the delta half's in-batch pipeline alone (pairs+sigs forced)
  D. minhash_dedup_pairs over the SAME delta half (LSH+verify only)

Each phase is min-of-N (SPARK_GRAFT_BENCH_REPEAT, default 3) in its
own cache_scope. Canary printed for regime context.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import cpu_canary, timed  # noqa: E402
from exporter_spark.operators import incremental  # noqa: E402
from exporter_spark.operators.dedup import minhash_dedup_pairs  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope, materialize  # noqa: E402
from exporter_spark.queries import _MINHASH, QUERIES  # noqa: E402
from exporter_spark.queries.dedup import _INC_SPLIT_SPARK  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    spark = get_spark("exporter_spark-incphases")
    spark.range(1_000_000).select(F.sum("id")).collect()
    load_table(spark, SF_DIR, "lineitem").limit(1000).count()
    print(f"canary {cpu_canary(spark, REPEAT)}")

    d = load_table(spark, SF_DIR, "documents")
    split = F.expr(_INC_SPLIT_SPARK)

    def phase_a():
        _, store = incremental.incremental_minhash_dedup(
            d.filter(split), "doc_id", "text", **_MINHASH
        )
        _force(store)

    def phase_c():
        pairs, sigs = incremental.incremental_minhash_dedup(
            d.filter(~split), "doc_id", "text", **_MINHASH
        )
        _force(pairs)
        _force(sigs)

    def phase_d():
        _force(
            minhash_dedup_pairs(d.filter(~split), "doc_id", "text", **_MINHASH)
        )

    def phase_b():
        _force(QUERIES["incremental_minhash_survivors"].fn(spark, SF_DIR))

    for tag, fn in (("A_store_bootstrap", phase_a), ("B_full_entry", phase_b),
                    ("C_delta_inbatch", phase_c), ("D_delta_pairs_only", phase_d)):
        with cache_scope():
            t = timed(fn, REPEAT)
        print(f"{tag} {t}")
    print(f"canary_end {cpu_canary(spark, REPEAT)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
