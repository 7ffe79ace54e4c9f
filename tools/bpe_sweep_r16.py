#!/usr/bin/env python
"""Round-16 BPE merge-learning scale sweep (VERDICT r15 #5 done-bar:
per-iteration shuffle bounded by the distinct-pair count, not corpus
size).

Protocol: the sf0.1 documents corpus is replicated Kx by exploding a
copy index (identical text per copy — deliberately, because the claim
under test is exactly that once the distinct-word table is built, the
iterations never touch the corpus again; identical copies hold the
word/pair tables CONSTANT while the corpus grows Kx, so any
iteration-cost growth would be a leak). Measured per scale:

* the word_frequencies corpus pass (wall + shuffle bytes — expected
  ~linear in K; it is the one corpus-size stage by design), and
* each of 8 merge iterations (wall + shuffle bytes — expected
  K-constant: the pair-count aggregation reads the cached word table
  and shuffles only map-side-combined distinct-pair partials).

Usage: python tools/bpe_sweep_r16.py [scales...]   (default 1 10 100)
Writes tools/audits/r16_bpe_sweep.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import shuffle_since, stage_marker  # noqa: E402
from exporter_spark.operators import bpe  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_MERGES = 8


def run_scale(spark, docs, k: int) -> dict:
    corpus = docs.select("text").withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    out: dict = {"scale": k}

    m = stage_marker(spark)
    t0 = time.time()
    words = bpe.word_frequencies(corpus, "text").cache()
    n_words = words.count()
    out["word_pass"] = {
        "wall_s": round(time.time() - t0, 3),
        "shuffle_write_read": shuffle_since(spark, m),
        "distinct_words": n_words,
    }

    iters = []
    for rank in range(1, N_MERGES + 1):
        m = stage_marker(spark)
        t0 = time.time()
        pairs = bpe.pair_counts(words)
        top = (
            pairs.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        wall = time.time() - t0
        w, r = shuffle_since(spark, m)
        lhs, rhs = top[0]["lhs"], top[0]["rhs"]
        nxt = bpe.merge_pair(words, lhs, rhs).cache()
        nxt.count()  # materialize before dropping the predecessor
        words.unpersist()
        words = nxt
        iters.append(
            {
                "rank": rank,
                "pair": f"{lhs}+{rhs}",
                "cnt": int(top[0]["cnt"]),
                "wall_s": round(wall, 3),
                "shuffle_write": w,
                "shuffle_read": r,
            }
        )
    words.unpersist()
    out["iterations"] = iters
    out["iter_shuffle_write_total"] = sum(i["shuffle_write"] for i in iters)
    return out


def run_vocab_scale(spark, n_words: int) -> dict:
    """Second axis: the synthetic corpus has only 31 distinct words,
    so the corpus sweep alone can't show how iteration cost tracks
    VOCABULARY size. Build the word table directly (md5-derived
    pseudo-words, Zipf-ish freqs) at n_words distinct entries and
    measure one pair-count iteration: shuffle should scale with the
    distinct-pair count and nothing else."""
    words = (
        spark.range(n_words)
        .select(
            F.concat(
                F.lit(" "),
                F.regexp_replace(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                    "(.)",
                    "$1  ",
                ),
            ).alias("rep"),
            (F.lit(1) + F.col("id") % 1000).alias("freq"),
        )
        .cache()
    )
    words.count()
    m = stage_marker(spark)
    t0 = time.time()
    pairs = bpe.pair_counts(words).cache()
    n_pairs = pairs.count()
    top = (
        pairs.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
        .limit(1)
        .collect()
    )
    wall = time.time() - t0
    w, r = shuffle_since(spark, m)
    pairs.unpersist()
    words.unpersist()
    return {
        "n_words": n_words,
        "distinct_pairs": n_pairs,
        "top": f"{top[0]['lhs']}+{top[0]['rhs']}",
        "iter_wall_s": round(wall, 3),
        "iter_shuffle_write": w,
        "iter_shuffle_read": r,
    }


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        "bpe_sweep_r16",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    docs = load_table(spark, SF_DIR, "documents")
    results = [run_scale(spark, docs, k) for k in scales]
    vocab = [run_vocab_scale(spark, n) for n in (10_000, 100_000, 300_000)]
    report = {
        "sf_dir": SF_DIR,
        "n_merges": N_MERGES,
        "scales": results,
        "vocab_scales": vocab,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "audits", "r16_bpe_sweep.json"
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
