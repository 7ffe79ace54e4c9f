#!/usr/bin/env python
"""Round-12 streaming-incremental-dedup sweep: per-batch cost as the
STORE GROWS across micro-batches.

The batch-side evidence (tools/incremental_sweep_r12.py) pins one
increment against pre-built stores at 1x/10x/100x scale; this sweep
pins the STREAMING faces' steady-state shape: feed N waves of mostly
novel documents through ``streaming_incremental_dedup`` /
``streaming_incremental_minhash_dedup`` one file per trigger, so the
persistent store grows by ~one wave per micro-batch, and read each
batch's duration from the query progress telemetry. The claim under
test is the one that matters for an unbounded run: per-batch wall
stays FLAT as the store grows (the store is scanned map-side once per
batch; nothing store-sized shuffles), so batch N costs the same as
batch 1.

Wave construction: the sf0.1 documents table's first ``WAVE_DOCS``
rows, re-keyed per wave with disjoint id strides and rotated into a
per-wave CJK block (zero cross-wave text overlap — every wave is
novel, maximizing store growth), plus a 10% slice duplicated from
wave 0 so the against-store drop path stays exercised in every batch.

Observables per wave: batch duration (progress ``triggerExecution``),
input rows, survivors written, store rows after the run. Printed as
one JSON line; stderr carries per-wave progress.

Usage: python tools/stream_inc_sweep_r12.py [n_waves]   (default 24)
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

from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402
from exporter_spark.streaming import stream as ss  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WAVE_DOCS = 2000
DUP_DOCS = 200  # per wave, copied from wave 0 -> must drop against store
STRIDE = 10_000_000
_LOWER = string.ascii_lowercase


def _block(i: int) -> str:
    return "".join(chr(0x4E00 + 26 * i + j) for j in range(26))


def _stage_waves(spark, base, src: str, n_waves: int) -> None:
    head = base.filter(F.col("doc_id") < WAVE_DOCS).select("doc_id", "text")
    for i in range(n_waves):
        novel = head.select(
            (F.col("doc_id") + (2 * i) * STRIDE).alias("doc_id"),
            F.translate("text", _LOWER, _block(i)).alias("text"),
        )
        wave = novel
        if i > 0:
            dup = head.filter(F.col("doc_id") < DUP_DOCS).select(
                (F.col("doc_id") + (2 * i + 1) * STRIDE).alias("doc_id"),
                F.translate("text", _LOWER, _block(0)).alias("text"),
            )
            wave = novel.unionByName(dup)
        wave.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)  # distinct mtimes -> stable batch order


def _drive(spark, face, src: str, root: str, tag: str, n_waves: int, **kw):
    out = os.path.join(root, f"{tag}_out")
    store = os.path.join(root, f"{tag}_store")
    stream = ss.stream_from_files(
        spark, src, "parquet", schema="doc_id long, text string",
        maxFilesPerTrigger=1,
    )
    t0 = time.perf_counter()
    q = face(
        stream,
        store_path=store, output_path=out,
        checkpoint=os.path.join(root, f"{tag}_ck"),
        **kw,
    )
    q.processAllAvailable()
    wall = time.perf_counter() - t0
    batches = []
    for p in q.recentProgress:
        if p["numInputRows"] > 0:
            batches.append(
                {
                    "batch": p["batchId"],
                    "rows": p["numInputRows"],
                    "sec": round(p["durationMs"]["triggerExecution"] / 1000, 3),
                }
            )
    q.stop()
    survivors = spark.read.parquet(out).count()
    store_rows = spark.read.parquet(store).count()
    secs = [b["sec"] for b in batches]
    half = len(secs) // 2
    row = {
        "wall_sec": round(wall, 1),
        "n_batches": len(batches),
        "survivors": survivors,
        "store_rows": store_rows,
        "batch_sec_first_half_avg": round(sum(secs[:half]) / max(1, half), 3),
        "batch_sec_second_half_avg": round(
            sum(secs[half:]) / max(1, len(secs) - half), 3
        ),
        "batch_sec_min": min(secs),
        "batch_sec_max": max(secs),
        "batches": batches,
    }
    print(f"[stream-inc] {tag}: {json.dumps({k: v for k, v in row.items() if k != 'batches'})}",
          file=sys.stderr)
    return row


def main() -> None:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    spark = get_spark("exporter_spark-streaminc-r12")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    base = load_table(spark, SF_DIR, "documents")
    root = tempfile.mkdtemp(prefix="streaminc_r12_")
    results = {"sf_dir": SF_DIR, "n_waves": n_waves, "wave_docs": WAVE_DOCS,
               "dup_docs_per_wave": DUP_DOCS}
    try:
        src = os.path.join(root, "src")
        _stage_waves(spark, base, src, n_waves)
        results["exact"] = _drive(
            spark, ss.streaming_incremental_dedup, src, root, "exact",
            n_waves, cols=["text"], order_col="doc_id",
        )
        results["minhash"] = _drive(
            spark, ss.streaming_incremental_minhash_dedup, src, root,
            "minhash", n_waves, id_col="doc_id", text_col="text",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
