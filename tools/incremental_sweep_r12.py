#!/usr/bin/env python
"""Round-12 incremental-dedup scale sweep: compaction folded in
(VERDICT r11 #5) + byte-constancy re-pin on the one-pass rewrite
(VERDICT r11 #4).

Extends the r11 protocol (tools/incremental_sweep_r11.py — store
replicated Kx with disjoint ids + CJK letter rotation, fixed 500-doc
delta: 250 exact copies of stored content, 250 novel). What round 12
adds:

* The store is written the way production writes it: FRAGMENTED into
  64 ``__increment__=<id>`` partition directories (the streaming
  sinks append one per micro-batch), not one flat parquet.
* ``compact_increment_store`` is MEASURED per scale (wall + shuffle
  bytes — it repartitions the whole store, so linear-in-store cost is
  the expected, documented shape for this offline helper).
* Post-compaction increment EQUALITY is pinned at every scale: the
  same delta against the fragmented store and against its compacted
  rewrite must keep exactly the same survivor ids and append exactly
  the same number of store rows (the sf-tiny pytest pin, re-proven at
  100x store scale).
* The increments themselves are re-measured on the ROUND-12 code
  (one-tokenization-pass incremental_minhash_dedup, manifest-verified
  store side): per-increment shuffle bytes must still be
  store-size-constant, the r11 headline.

Usage: python tools/incremental_sweep_r12.py [scales...]
       (default 1 10 100; SPARK_GRAFT_BENCH_REPEAT, default 2)
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
from exporter_spark.operators.dedup import content_digest  # noqa: E402
from exporter_spark.operators.incremental import (  # noqa: E402
    ensure_store_params,
    incremental_exact_dedup,
    incremental_minhash_dedup,
    minhash_signatures,
)
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.queries import _MINHASH  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402
from exporter_spark.streaming.stream import (  # noqa: E402
    compact_increment_store,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_STRIDE = 10_000_000
DELTA_STRIDE = 900_000_000
_LOWER = string.ascii_lowercase
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
_INC = dict(_MINHASH)
N_FRAGMENTS = 64


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


def _write_fragmented(df, path: str, key_col: str) -> None:
    """Persist a store frame as N_FRAGMENTS __increment__ partition
    directories — the layout a long-running streaming sink leaves
    behind (one directory per micro-batch)."""
    df.withColumn(
        "__increment__",
        F.concat(
            F.lit("r0-"),
            (F.abs(F.xxhash64(key_col)) % N_FRAGMENTS).cast("string"),
        ),
    ).write.partitionBy("__increment__").mode("overwrite").parquet(path)


def _timed_with_bytes(spark, build_and_force, n: int = REPEAT):
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
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("exporter_spark-incsweep-r12")
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    root = tempfile.mkdtemp(prefix="incsweep_r12_")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()

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
            corpus_path = os.path.join(root, f"corpus_x{scale}.parquet")
            _replicas(base, scale).repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(corpus_path)
            corpus_pq = spark.read.parquet(corpus_path)

            # fragmented stores: the production layout under test
            sig_frag = os.path.join(root, f"sigs_x{scale}_frag")
            _write_fragmented(
                minhash_signatures(
                    corpus_pq, "doc_id", "text",
                    num_hashes=_INC["num_hashes"],
                    shingle_n=_INC["shingle_n"],
                ),
                sig_frag, "doc_id",
            )
            ensure_store_params(
                sig_frag,
                num_hashes=_INC["num_hashes"], bands=_INC["bands"],
                shingle_n=_INC["shingle_n"], family=_INC.get("family", "md5"),
                spark=spark,
            )
            dig_frag = os.path.join(root, f"digs_x{scale}_frag")
            _write_fragmented(
                corpus_pq.select(content_digest(["text"]).alias("__digest__")),
                dig_frag, "__digest__",
            )

            delta_pq = spark.read.parquet(delta_path)
            row: dict = {"n_store_docs": n_base * scale}

            def run_inc_minhash(store_path):
                store = spark.read.parquet(store_path).drop("__increment__")
                params = ensure_store_params(
                    store_path,
                    num_hashes=_INC["num_hashes"], bands=_INC["bands"],
                    shingle_n=_INC["shingle_n"],
                    family=_INC.get("family", "md5"), spark=spark,
                ) if os.path.exists(
                    os.path.join(store_path, "_store_params.json")
                ) else None
                with cache_scope():
                    surv, app = incremental_minhash_dedup(
                        delta_pq, "doc_id", "text", store,
                        store_params=params, **_INC,
                    )
                    ids = sorted(r[0] for r in surv.select("doc_id").collect())
                    n_app = app.count()
                return ids, n_app

            def run_inc_exact(store_path):
                store = spark.read.parquet(store_path).drop("__increment__")
                with cache_scope():
                    surv, app = incremental_exact_dedup(
                        delta_pq, ["text"], "doc_id", store
                    )
                    ids = sorted(r[0] for r in surv.select("doc_id").collect())
                    n_app = app.count()
                return ids, n_app

            # timed increments against the FRAGMENTED store (the
            # byte-constancy re-pin on the one-pass code)
            def inc_minhash_frag():
                store = spark.read.parquet(sig_frag).drop("__increment__")
                params = ensure_store_params(
                    sig_frag,
                    num_hashes=_INC["num_hashes"], bands=_INC["bands"],
                    shingle_n=_INC["shingle_n"],
                    family=_INC.get("family", "md5"), spark=spark,
                )
                surv, app = incremental_minhash_dedup(
                    delta_pq, "doc_id", "text", store,
                    store_params=params, **_INC,
                )
                surv.write.format("noop").mode("overwrite").save()
                app.write.format("noop").mode("overwrite").save()

            row["inc_minhash_frag"] = _timed_with_bytes(spark, inc_minhash_frag)

            def inc_exact_frag():
                store = spark.read.parquet(dig_frag).drop("__increment__")
                surv, app = incremental_exact_dedup(
                    delta_pq, ["text"], "doc_id", store
                )
                surv.write.format("noop").mode("overwrite").save()
                app.write.format("noop").mode("overwrite").save()

            row["inc_exact_frag"] = _timed_with_bytes(spark, inc_exact_frag)

            # compaction, timed (expected linear-in-store: it
            # repartitions every stored row once — offline cost)
            sig_comp = os.path.join(root, f"sigs_x{scale}_comp")
            dig_comp = os.path.join(root, f"digs_x{scale}_comp")

            def compact_sigs():
                shutil.rmtree(sig_comp, ignore_errors=True)
                compact_increment_store(spark, sig_frag, sig_comp)

            row["compact_sigs"] = _timed_with_bytes(spark, compact_sigs, 1)

            def compact_digs():
                shutil.rmtree(dig_comp, ignore_errors=True)
                compact_increment_store(spark, dig_frag, dig_comp)

            row["compact_digs"] = _timed_with_bytes(spark, compact_digs, 1)

            # post-compaction equality pin, at scale
            ids_f, napp_f = run_inc_minhash(sig_frag)
            ids_c, napp_c = run_inc_minhash(sig_comp)
            assert ids_f == ids_c and napp_f == napp_c, (
                scale, len(ids_f), len(ids_c), napp_f, napp_c,
            )
            row["minhash_equal_post_compaction"] = {
                "n_survivors": len(ids_f), "n_append": napp_f,
            }
            eids_f, enapp_f = run_inc_exact(dig_frag)
            eids_c, enapp_c = run_inc_exact(dig_comp)
            assert eids_f == eids_c and enapp_f == enapp_c, (
                scale, len(eids_f), len(eids_c), enapp_f, enapp_c,
            )
            row["exact_equal_post_compaction"] = {
                "n_survivors": len(eids_f), "n_append": enapp_f,
            }

            # timed increments against the COMPACTED store (what
            # compaction buys back per increment)
            def inc_minhash_comp():
                store = spark.read.parquet(sig_comp).drop("__increment__")
                params = ensure_store_params(
                    sig_comp,
                    num_hashes=_INC["num_hashes"], bands=_INC["bands"],
                    shingle_n=_INC["shingle_n"],
                    family=_INC.get("family", "md5"), spark=spark,
                )
                surv, app = incremental_minhash_dedup(
                    delta_pq, "doc_id", "text", store,
                    store_params=params, **_INC,
                )
                surv.write.format("noop").mode("overwrite").save()
                app.write.format("noop").mode("overwrite").save()

            row["inc_minhash_comp"] = _timed_with_bytes(spark, inc_minhash_comp)

            results["scales"][scale] = row
            print(f"[incsweep-r12] x{scale}: {json.dumps(row)}", file=sys.stderr)
            for p in (corpus_path, sig_frag, dig_frag, sig_comp, dig_comp):
                shutil.rmtree(p, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
