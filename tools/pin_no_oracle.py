#!/usr/bin/env python
"""Scale-sweep pins for the registry's perpetual ``oracle=None``
entries — the checks the driver's DuckDB gate cannot express.

* ``semdedup_survivors_greedy``: Spark kept-set vs a pure-python
  sequential scan of the SAME LSH buckets at the production
  parameters (the greedy recursion is order-dependent; exact set
  equality is the pin).
* ``ivf_ann_topk``: determinism across two independent runs (seeded
  KMeans), row count = n_queries x k, and recall vs the exact
  cosine_topk answer at the same k (IVF is approximate BY DESIGN —
  recall is reported, determinism and shape are asserted).

Usage: python tools/pin_no_oracle.py [sf_dir]   (default sf0.1)
Prints one PIN line per check; exit 1 on any assertion failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.operators import similarity  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.queries import _NEARDUP, QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402


def pin_semdedup_greedy(spark, sf_dir) -> bool:
    emb = load_table(spark, sf_dir, "embeddings")
    th, dims, planes = (
        _NEARDUP["threshold"], _NEARDUP["dims"], _NEARDUP["planes"],
    )
    sigs = similarity.with_lsh_signature(
        emb.select(
            F.col("vec_id").alias("__id__"), F.col("embedding").alias("__v__")
        ),
        "__v__", dims, planes,
    ).collect()
    buckets: dict = {}
    for r in sigs:
        buckets.setdefault(r["__sig__"], []).append(
            (r["__id__"], np.array(r["__v__"], dtype=np.float64))
        )
    expect = set()
    for rows in buckets.values():
        rows.sort(key=lambda t: t[0])
        kept = []
        for vid, v in rows:
            nrm = np.linalg.norm(v)
            if nrm == 0 or not np.isfinite(nrm):
                expect.add(vid)  # degenerate: never a near-dup, survives
                continue
            vn = v / nrm
            if not any(
                np.round(float(kn @ vn), 6) >= th for _, kn in kept
            ):
                kept.append((vid, vn))
        expect.update(vid for vid, _ in kept)
    with cache_scope():
        got = {
            r["vec_id"]
            for r in QUERIES["semdedup_survivors_greedy"].fn(spark, sf_dir).collect()
        }
    ok = got == expect
    print(
        f"PIN semdedup_survivors_greedy sf_dir={sf_dir}: python kept "
        f"{len(expect)}, spark kept {len(got)}, symmetric diff "
        f"{len(got ^ expect)} -> {'OK' if ok else 'FAIL'}"
    )
    return ok


def pin_ivf_ann(spark, sf_dir) -> bool:
    def rows():
        with cache_scope():
            return sorted(
                (r["query_id"], r["neighbor_id"], r["sim"])
                for r in QUERIES["ivf_ann_topk"].fn(spark, sf_dir).collect()
            )

    a, b = rows(), rows()
    det = a == b
    n_q = len({q for q, _, _ in a})
    shape_ok = len(a) == n_q * 5  # k=5 per registry entry
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    with cache_scope():
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.cosine_topk(emb, q, k=5).collect()
        }
    approx = {(qq, nn) for qq, nn, _ in a}
    recall = len(approx & exact) / max(1, len(exact))
    ok = det and shape_ok
    print(
        f"PIN ivf_ann_topk sf_dir={sf_dir}: {len(a)} rows "
        f"({n_q} queries x k=5), deterministic={det}, "
        f"recall_vs_exact={recall:.3f} -> {'OK' if ok else 'FAIL'}"
    )
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exporter_spark-pins")
    ok = pin_semdedup_greedy(spark, sf_dir)
    ok = pin_ivf_ann(spark, sf_dir) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
