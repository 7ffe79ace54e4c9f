"""Memory-pressure validation of the dedup pillar (round 13, VERDICT
r12 missing #2).

Every prior scale claim rode shuffle-byte/plan-shape sweeps at
test-data sizes (17 MB tops) that never pressure executor memory.
This harness generates a corpus large enough that the minhash pair
stage's per-task working set outgrows a FIXED, documented heap, runs
the exact production pillar (minhash_dedup_pairs → connected
components → anti join, registry parameters), and records
wall/shuffle/spill plus a planted-duplicate correctness pin — so the
snapshot shows either 0-spill headroom at N× the test corpus or a
GRACEFUL spill (completes, value-correct) rather than an assumption.

Corpus: deterministic md5-chain docs of ~1 KB; in every group of 20
consecutive ids, members 0 and 1 share a 960-char body and differ in a
32-char tail (exact-Jaccard ≈ 0.92 ⇒ a guaranteed near-dup pair), the
other 18 are unique. Expected survivors are therefore EXACTLY
N - N/20 — an end-to-end value pin that holds with or without spill.

Each rung runs in its own subprocess so the JVM heap
(--driver-memory, which is the executor heap too under local[*]) is
pinned per rung. Corpus parquet is cached per size under /tmp and
never committed; the committed artifact is the JSON snapshot
(tools/audits/r13_memory_pressure.json) + the SCALE.md analysis.

Usage:
  python tools/memory_pressure_r13.py            # full ladder
  python tools/memory_pressure_r13.py --rung N HEAP   # one rung (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_ROOT = "/tmp/spark_graft_memtest"
GROUP = 20
CHUNKS = 30  # 30 md5 hex chunks = 960-char shared body per group pair

# (n_docs, heap, adaptive_broadcast): the heap axis finds the loud
# failure point under the default config; the broadcast axis tests
# Spark's own suggested mitigation (runtime broadcast off -> the
# joins sort-merge and SPILL instead of failing the broadcast build);
# the final headroom rung cross-checks value identity.
LADDER = [
    (25_000, "4g", True),
    (25_000, "4g", False),
    (25_000, "8g", True),
    (50_000, "8g", True),
    (100_000, "8g", True),
    (100_000, "8g", False),
    (100_000, "16g", True),
]


def _gen_corpus(spark, n_docs: int) -> str:
    """Deterministic generated corpus (never committed): ~1 KB text
    per doc, planted near-dup pair per 20-id group."""
    from pyspark.sql import functions as F

    path = f"{DATA_ROOT}/docs_{n_docs}"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    base = F.col("id") - (F.col("id") % GROUP)
    member = F.col("id") % GROUP

    def body(seed_col, tag):
        return F.concat(
            *[
                F.md5(F.concat(F.lit(f"{tag}:"), seed_col.cast("string"), F.lit(f":{j}")))
                for j in range(CHUNKS)
            ]
        )

    near = F.concat(
        body(base, "grp"),
        F.md5(F.concat(F.lit("tail:"), F.col("id").cast("string"))),
    )
    unique = F.concat(
        body(F.col("id"), "uniq"),
        F.md5(F.concat(F.lit("tail:"), F.col("id").cast("string"))),
    )
    df = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(member < 2, near).otherwise(unique).alias("text"),
    )
    df.write.mode("overwrite").parquet(path)
    return path


def run_rung(n_docs: int, heap: str, bcast: bool) -> None:
    """Executed inside the per-rung subprocess (heap pinned via
    SPARK_DRIVER_MEMORY, runtime-broadcast toggle via
    SPARK_GRAFT_ADAPTIVE_BROADCAST_BYTES — both read by
    exporter_spark.session.get_spark, the production entry point)."""
    import time

    from pyspark.sql import functions as F

    from exporter_spark.benchlib import (
        shuffle_since,
        spill_totals,
        stage_marker,
    )
    from exporter_spark.operators import dedup
    from exporter_spark.session import get_spark

    spark = get_spark(f"memory-pressure-{n_docs}-{heap}-b{int(bcast)}")
    path = _gen_corpus(spark, n_docs)
    d = spark.read.parquet(path)

    marker = stage_marker(spark)
    t0 = time.perf_counter()
    pairs = dedup.minhash_dedup_pairs(
        d, "doc_id", "text", num_hashes=32, bands=8, shingle_n=8,
        threshold=0.7,
    )
    clusters = dedup.connected_components(pairs)
    drop = clusters.filter(F.col("id") != F.col("component")).select("id")
    survivors = d.join(
        drop, d["doc_id"] == drop["id"], "left_anti"
    ).count()
    wall = time.perf_counter() - t0
    sh_write, sh_read = shuffle_since(spark, marker)
    mem_spill, disk_spill = spill_totals(spark)
    expected = n_docs - n_docs // GROUP
    print(
        "RUNG_JSON "
        + json.dumps(
            {
                "n_docs": n_docs,
                "heap": heap,
                "adaptive_broadcast": bcast,
                "text_mb": round(n_docs * (CHUNKS * 32 + 32) / 1e6, 1),
                "wall_sec": round(wall, 1),
                "shuffle_write_bytes": sh_write,
                "shuffle_read_bytes": sh_read,
                "memory_spill_bytes": mem_spill,
                "disk_spill_bytes": disk_spill,
                "survivors": survivors,
                "expected_survivors": expected,
                "value_correct": survivors == expected,
            },
            sort_keys=True,
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--rung":
        run_rung(int(sys.argv[2]), sys.argv[3], sys.argv[4] == "1")
        return
    os.makedirs(f"{REPO}/tools/audits", exist_ok=True)
    results = []
    for n_docs, heap, bcast in LADDER:
        env = dict(os.environ)
        env["SPARK_DRIVER_MEMORY"] = heap
        if not bcast:
            env["SPARK_GRAFT_ADAPTIVE_BROADCAST_BYTES"] = "-1"
        else:
            env.pop("SPARK_GRAFT_ADAPTIVE_BROADCAST_BYTES", None)
        print(
            f"=== rung: {n_docs} docs @ {heap}"
            f" adaptive_broadcast={bcast} ===",
            flush=True,
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--rung",
             str(n_docs), heap, "1" if bcast else "0"],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines()
             if ln.startswith("RUNG_JSON ")),
            None,
        )
        if line is None:
            err = next(
                (ln.strip() for ln in proc.stderr.splitlines()
                 if "SparkException" in ln or "OutOfMemoryError" in ln),
                (proc.stderr.splitlines() or ["<no stderr>"])[-1][:300],
            )
            results.append(
                {"n_docs": n_docs, "heap": heap,
                 "adaptive_broadcast": bcast, "failed": True,
                 "error": err[:400]}
            )
            print(f"rung FAILED (rc={proc.returncode}): {err[:200]}",
                  flush=True)
            continue
        rec = json.loads(line[len("RUNG_JSON "):])
        results.append(rec)
        print(json.dumps(rec, sort_keys=True), flush=True)
    out = f"{REPO}/tools/audits/r13_memory_pressure.json"
    with open(out, "w") as fh:
        json.dump({"group": GROUP, "ladder": results}, fh, indent=2,
                  sort_keys=True)
        fh.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
