#!/usr/bin/env python
"""Scale pins for the xxhash64 PRODUCTION hash families — the fast
paths DuckDB can never replay (no XXH64), so the driver's oracle gate
only ever sees their md5 twins. The pytest equivalence tests run at
sf0.001; this runs the same equivalences at real scale so the
production path carries the same evidence as the registry path
(VERDICT r05 item 2).

* ``minhash_dedup_pairs``: banding proposes, exact Jaccard disposes —
  the verified pair set must be IDENTICAL between families.
* ``exact_substring_spans`` / ``strip_duplicate_spans``: the 128-bit
  xxhash64 duplication key must produce IDENTICAL spans and identical
  stripped documents (a difference needs a 128-bit collision).
* ``winnow_fingerprints``: fingerprint VALUES are family-opaque by
  design (which gram a window selects depends on the hash), so
  identical output is NOT the contract — corpora share huge numbers
  of common 8-grams, and pairs-sharing-a-fingerprint differs by tens
  of thousands between families on pure selection noise. The
  family-independent contract IS the winnowing guarantee: any two
  docs sharing a run >= k+w-1 chars share a selected fingerprint, in
  EVERY family. Pin: density ~2/(w+1) for both families, and every
  minhash-VERIFIED near-dup pair (genuine duplicates, exact Jaccard
  >= threshold) is winnow-detected by both families.

Usage: python tools/pin_production_families.py [sf_dir]  (default sf0.1)
Prints one PIN line per check; exit 1 on any assertion failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.operators import dedup, text  # noqa: E402
from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402


def family_source_files() -> list[str]:
    """The sources whose changes invalidate the PARITY.md pins: the
    hash-family operators and every JVM kernel (none of which the
    driver's DuckDB gate can verify)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jdir = os.path.join(root, "exporter_spark", "javakernel")
    files = [
        os.path.join(root, "exporter_spark", "operators", "dedup.py"),
        os.path.join(root, "exporter_spark", "operators", "text.py"),
        # the compile/ADD JAR/UDF-registration wrapper shapes kernel
        # behavior too (compile flags, registered return types) — a
        # change there must also invalidate the pins (round-7 review)
        os.path.join(jdir, "__init__.py"),
    ]
    files += sorted(
        os.path.join(jdir, f) for f in os.listdir(jdir) if f.endswith(".java")
    )
    return files


def family_source_sha() -> str:
    """Content hash over the family/kernel sources, recorded in every
    PARITY.md pin block. tests/test_parity_pins.py recomputes it and
    FAILS if those sources changed without a fresh pin run — the pins
    are the only correctness evidence for paths the oracle gate can
    never replay (VERDICT r06 item 7)."""
    import hashlib

    h = hashlib.sha256()
    for path in family_source_files():
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def pin_minhash(spark, sf_dir) -> bool:
    d = load_table(spark, sf_dir, "documents")
    sets = {}
    for fam in ("md5", "xxhash64"):
        with cache_scope():
            sets[fam] = {
                (r["a_id"], r["b_id"], r["jaccard"])
                for r in dedup.minhash_dedup_pairs(
                    d, "doc_id", "text", family=fam
                ).collect()
            }
    same = sets["md5"] == sets["xxhash64"]
    print(
        f"PIN minhash_dedup_pairs: md5={len(sets['md5'])}"
        f" xxhash64={len(sets['xxhash64'])}"
        f" symdiff={len(sets['md5'] ^ sets['xxhash64'])}"
        f" -> {'OK' if same and sets['md5'] else 'FAIL'}"
    )
    return same and bool(sets["md5"])


def pin_exact_substring(spark, sf_dir) -> bool:
    d = load_table(spark, sf_dir, "documents")
    ok = True
    for op, cols in (
        (dedup.exact_substring_spans, None),
        (dedup.strip_duplicate_spans, None),
    ):
        sets = {}
        for fam in ("md5", "xxhash64"):
            with cache_scope():
                sets[fam] = {
                    tuple(r) for r in op(d, k=10, min_count=2, family=fam).collect()
                }
        same = sets["md5"] == sets["xxhash64"]
        ok = ok and same and bool(sets["md5"])
        print(
            f"PIN {op.__name__}: md5={len(sets['md5'])}"
            f" xxhash64={len(sets['xxhash64'])}"
            f" symdiff={len(sets['md5'] ^ sets['xxhash64'])}"
            f" -> {'OK' if same and sets['md5'] else 'FAIL'}"
        )
    return ok


def pin_winnow(spark, sf_dir) -> bool:
    from exporter_spark.operators.partitioning import materialize

    d = load_table(spark, sf_dir, "documents")
    k = w = 8
    # ground truth: minhash-VERIFIED near-dup pairs (banding proposes,
    # exact Jaccard disposes — these are genuine duplicates)
    with cache_scope():
        truth = {
            (min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"]))
            for r in dedup.minhash_dedup_pairs(d, "doc_id", "text").collect()
        }
    n_grams = (
        d.select(
            F.greatest(
                F.lit(0),
                F.char_length(text.normalize_text(F.col("text"))) - k + 1,
            ).alias("g")
        )
        .agg(F.sum("g"))
        .first()[0]
    )
    ok = bool(truth)
    for fam in ("md5", "xxhash64"):
        with cache_scope():
            fp = materialize(text.winnow_fingerprints(d, k=k, w=w, family=fam))
            n_sel, n_docs = fp.agg(
                F.count("*"), F.countDistinct("doc_id")
            ).first()
            a = fp.select(F.col("doc_id").alias("a"), "fp")
            b = fp.select(F.col("doc_id").alias("b"), "fp")
            detected = {
                (r["a"], r["b"])
                for r in a.join(b, "fp")
                .filter(F.col("a") < F.col("b"))
                .select("a", "b")
                .distinct()
                .collect()
            }
        density = n_sel / max(1, n_grams)
        target = 2.0 / (w + 1)
        in_band = 0.5 * target <= density <= 1.5 * target
        missed = truth - detected
        fam_ok = in_band and not missed
        ok = ok and fam_ok
        print(
            f"PIN winnow[{fam}]: selected={n_sel} docs={n_docs}"
            f" density={density:.4f} (target ~{target:.4f})"
            f" guarantee: detected {len(truth) - len(missed)}/{len(truth)}"
            f" verified near-dup pairs"
            f" -> {'OK' if fam_ok else 'FAIL'}"
        )
        if missed:
            print(f"  missed sample: {sorted(missed)[:10]}")
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pin-production-families")
    results = [
        pin_minhash(spark, sf_dir),
        pin_exact_substring(spark, sf_dir),
        pin_winnow(spark, sf_dir),
    ]
    print(
        f"PIN source-sha: {family_source_sha()}"
        " (record in PARITY.md — tests/test_parity_pins.py enforces"
        " freshness)"
    )
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())
