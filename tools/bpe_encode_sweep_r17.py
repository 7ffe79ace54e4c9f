#!/usr/bin/env python
"""Round-17 BPE ENCODE-face sweep: chain vs dictionary.

Claims under test (operators/bpe.py, apply_bpe vs apply_bpe_dict):

* the CHAIN face is map-only — zero shuffle at any corpus scale —
  but runs the merge chain on every occurrence;
* the DICT face encodes each DISTINCT word once (vocab-priced work)
  and pays one occurrence-level shuffle for per-row reassembly —
  that shuffle scales with the corpus, which is exactly why
  token-level consumers should join `bpe_encode_table` directly
  (the third measurement: encode-table join WITHOUT reassembly,
  whose shuffle is word-table-bounded);
* both faces must produce identical per-corpus token totals at
  every scale (parity beyond the unit tests' row-level pin).

Corpus: sf documents replicated 1x/5x/20x with translated replicas
(the incremental-sweep trick), so occurrences AND the distinct-word
table grow. Merges: 8 (the oracle entry's scale). Prints one JSON
line; commit to tools/audits/r17_bpe_encode_sweep.json.

Usage: python tools/bpe_encode_sweep_r17.py [scales...]
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import shuffle_since, stage_marker  # noqa: E402
from exporter_spark.operators import bpe  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
N_MERGES = 8
_LOWER = string.ascii_lowercase


def _block(i: int) -> str:
    # lowercase-latin translation targets so the corpus stays inside
    # the [a-z]+ word alphabet (rotations of the alphabet)
    return _LOWER[i % 25 + 1 :] + _LOWER[: i % 25 + 1]


def _replicas(base, scale: int):
    parts = [base]
    for i in range(1, scale):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate("text", _LOWER, _block(i)).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _timed(spark, fn, n=REPEAT):
    best = wbytes = rbytes = None
    for i in range(n):
        with cache_scope():
            marker = stage_marker(spark)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
        if i == 0:
            wbytes, rbytes = shuffle_since(spark, marker)
        best = dt if best is None else min(best, dt)
    return round(best, 3), wbytes, rbytes


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark(
        "exporter_spark-bpesweep-r17",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.range(1_000_000).select(F.sum("id")).collect()  # warm
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    with cache_scope():
        merges = bpe.learn_bpe(base, "text", n_merges=N_MERGES)
        merges = merges.localCheckpoint()  # fixed table for all scales
    results: dict = {
        "sf_dir": SF_DIR,
        "n_merges": N_MERGES,
        "repeat": REPEAT,
        "scales": {},
    }
    for scale in scales:
        corpus = _replicas(base, scale)
        n_docs = corpus.count()
        words = corpus.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), bpe.WORD_SPLIT_PATTERN),
                    lambda x: x != F.lit(""),
                )
            ).alias("w")
        )
        n_words = words.count()
        n_distinct = words.distinct().count()

        def run_chain():
            return (
                bpe.apply_bpe(corpus, merges)
                .select(F.size("bpe_tokens").alias("n"))
                .agg(F.sum("n"))
                .collect()[0][0]
            )

        def run_dict():
            return (
                bpe.apply_bpe_dict(corpus, merges, id_col="doc_id")
                .select(F.size("bpe_tokens").alias("n"))
                .agg(F.sum("n"))
                .collect()[0][0]
            )

        def run_table_join():
            dic = bpe.bpe_encode_table(words.distinct(), merges)
            return (
                words.join(dic, "w")
                .select(F.size("bpe_toks").alias("n"))
                .agg(F.sum("n"))
                .collect()[0][0]
            )

        with cache_scope():
            t_chain = run_chain()
            t_dict = run_dict()
            t_join = run_table_join()
        wall_c, w_c, r_c = _timed(spark, run_chain)
        wall_d, w_d, r_d = _timed(spark, run_dict)
        wall_j, w_j, r_j = _timed(spark, run_table_join)
        results["scales"][str(scale)] = {
            "docs": n_docs,
            "word_occurrences": n_words,
            "distinct_words": n_distinct,
            "token_totals_match": t_chain == t_dict == t_join,
            "total_tokens": t_chain,
            "chain": {"wall_s": wall_c, "shuffle_w": w_c, "shuffle_r": r_c},
            "dict_reassembled": {
                "wall_s": wall_d, "shuffle_w": w_d, "shuffle_r": r_d,
            },
            "encode_table_join": {
                "wall_s": wall_j, "shuffle_w": w_j, "shuffle_r": r_j,
            },
        }
    spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
