#!/usr/bin/env python
"""Round-10 A/B: oracle hash family (md5) vs production family
(xxhash64) on the minhash/ExactSubstr flagship entries.

The registry queries deliberately run the md5 family so DuckDB can
verify them value-for-value (operators/dedup.py:120), and BENCH
therefore carries md5's cost: one hex md5 per shingle plus hex-string
band keys. The production family — Spark-native xxhash64 signatures
and bigint band keys — is pinned output-identical at two SFs by
tools/pin_production_families.py, but its TIME had never been
recorded. This tool measures the oracle tax so BASELINE.md can state
what the 100 TB configuration actually costs relative to the numbers
the driver benches.

Protocol note (round-10 finding, recorded in BASELINE.md): a naive
per-family block A/B in a fresh session read md5 1.8x slower than
xxhash64 on the pairs entry — almost entirely SESSION JIT WARM-UP,
not hashing. Whole-stage-codegen classes are C2-compiled as the
session runs, so whichever family executes first in a fresh JVM pays
the compilation; a per-entry untimed warm pass does not amortize it.
The fix here: families run INTERLEAVED (md5, xx, md5, xx, ...) and
each family's reading is the min over its late repetitions — the same
reasoning as BASELINE.md's interleaved same-code drift protocol.

``--scale K`` replicates the corpus Kx with scale_sweep_r8's
rotated-disjoint protocol before timing: at sf0.1's 5k docs the hash
term is a minor part of each entry's wall, so the family delta is
single-digit percent; scaling grows the hash term linearly while the
fixed overheads stay, exposing the asymptotic tax the 100 TB
configuration actually avoids.

Usage: python tools/prod_family_ab_r10.py [repeats] [--scale K]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import cpu_canary  # noqa: E402
from exporter_spark.operators import dedup  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# the registry's _MINHASH parameters (queries.py) — the A/B must time
# exactly the benched configuration, family aside
MINHASH = dict(num_hashes=32, bands=8, shingle_n=8, threshold=0.7)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import time

    args = [a for a in sys.argv[1:]]
    scale = 1
    if "--scale" in args:
        i = args.index("--scale")
        scale = int(args[i + 1])
        del args[i : i + 2]
    repeats = int(args[0]) if args else 3

    spark = get_spark("exporter_spark-prodfamily-ab-r10")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    d = load_table(spark, SF_DIR, "documents")
    if scale > 1:
        from scale_sweep_r8 import replicate_rotated

        d = replicate_rotated(d.select("doc_id", "text"), scale, spark)
        d = d.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        )

    def pairs(family):
        return dedup.minhash_dedup_pairs(
            d, "doc_id", "text", family=family, **MINHASH
        )

    def survivors(family):
        p = pairs(family)
        clusters = dedup.connected_components(p)
        drop = clusters.filter(F.col("id") != F.col("component")).select("id")
        return d.join(drop, d["doc_id"] == drop["id"], "left_anti").select(
            "doc_id"
        )

    def strip(family):
        return dedup.strip_duplicate_spans(
            d, k=10, min_count=2, family=family
        )

    entries = {
        "minhash_near_dup_pairs": pairs,
        "minhash_dedup_survivors": survivors,
        "exact_substring_strip": strip,
    }

    out = {"sf_dir": SF_DIR, "repeats": repeats, "scale": scale}
    out["cpu_canary_pre"] = round(cpu_canary(spark), 3)
    results: dict[str, dict] = {}
    for name, builder in entries.items():
        best = {"md5": None, "xxhash64": None}
        # interleaved: one untimed warm pair, then `repeats` timed
        # pairs; min per family lands on late (JIT-warm) repetitions
        for family in ("md5", "xxhash64"):
            with cache_scope():
                _force(builder(family))
        for _ in range(repeats):
            for family in ("md5", "xxhash64"):
                with cache_scope():
                    t0 = time.perf_counter()
                    _force(builder(family))
                    dt = time.perf_counter() - t0
                b = best[family]
                best[family] = dt if b is None else min(b, dt)
        results[name] = {k: round(v, 3) for k, v in best.items()}
        results[name]["xx_over_md5"] = round(
            best["xxhash64"] / best["md5"], 3
        )
        print(
            f"[prodfamily] {name}: md5 {best['md5']:.3f}s"
            f" xxhash64 {best['xxhash64']:.3f}s",
            file=sys.stderr,
        )
    out["cpu_canary_post"] = round(cpu_canary(spark), 3)
    out["results"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
