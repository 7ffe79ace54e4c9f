"""Deterministic sampling / curation operators: reproducibility under
repartitioning, stratum semantics, quota bounds, redaction behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from exporter_spark.operators import sampling, text
from exporter_spark.sources.files import load_table


def test_deterministic_sample_stable_under_repartition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in sampling.deterministic_sample(d, "doc_id", 0.3).select("doc_id").collect()}
    b = {r["doc_id"] for r in sampling.deterministic_sample(d.repartition(13), "doc_id", 0.3).select("doc_id").collect()}
    assert a == b and 0 < len(a) < d.count()
    # monotone: a smaller fraction selects a subset of a larger one
    c = {r["doc_id"] for r in sampling.deterministic_sample(d, "doc_id", 0.1).select("doc_id").collect()}
    assert c <= a


def test_stratified_sample_drops_unknown_strata(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(d, "lang", {"en": 1.0}, "doc_id")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == d.filter(F.col("lang") == "en").count()  # frac 1.0 keeps all


def test_train_test_split_partitions_everything(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = sampling.train_test_split(d, "doc_id", test_fraction=0.2)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == d.count()
    assert set(counts) == {"train", "test"}
    # rerun on reshuffled input: identical assignment
    again = sampling.train_test_split(d.repartition(7), "doc_id", test_fraction=0.2)
    diff = out.select("doc_id", "split").exceptAll(again.select("doc_id", "split"))
    assert diff.count() == 0


def test_cap_per_key_bounds_and_order(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = sampling.cap_per_key(d, "source", 3, [F.desc("n_chars"), F.asc("doc_id")])
    per_key = out.groupBy("source").agg(
        F.count("*").alias("n"), F.min("n_chars").alias("kept_min")
    )
    assert per_key.filter(F.col("n") > 3).count() == 0
    # kept rows dominate dropped rows per key
    dropped_max = (
        d.join(out.select("doc_id").withColumn("__k__", F.lit(1)), "doc_id", "left_anti")
        .groupBy("source").agg(F.max("n_chars").alias("dropped_max"))
    )
    bad = (
        per_key.join(dropped_max, "source")
        .filter(F.col("dropped_max") > F.col("kept_min"))
    )
    assert bad.count() == 0


def test_redact_pii_values(spark):
    df = spark.createDataFrame(
        [
            ("a@b.com and c.d+x@e.org.uk", "<EMAIL> and <EMAIL>"),
            ("ip 192.168.0.1 end", "ip <IP> end"),
            ("call 555-123-4567 or 555.123.4567", "call <PHONE> or <PHONE>"),
            ("ver 1.2.3 stays; 1.2.3.4 goes", "ver 1.2.3 stays; <IP> goes"),
            ("no pii here", "no pii here"),
        ],
        "raw string, expected string",
    )
    got = df.select(text.redact_pii(F.col("raw")).alias("got"), "expected").collect()
    for r in got:
        assert r["got"] == r["expected"], (r["got"], r["expected"])


@pytest.mark.parametrize("family", ["md5", "xxhash64"])
def test_winnow_guarantee_and_density(spark, family):
    """Winnowing invariants, for BOTH the oracle (md5) and production
    (xxhash64) hash families: (1) two docs sharing a substring of
    length >= k+w-1 share at least one fingerprint; (2) fingerprints
    are a sparse subset of k-grams; (3) disjoint docs don't collide."""
    k = w = 8
    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars >= k+w-1
    df = spark.createDataFrame(
        [
            (1, "AAAA xxxx " + shared + " yyyy"),
            (2, "zz qq " + shared + " ppp rrr"),
            (3, "completely different content with no overlap at all 12345"),
        ],
        "doc_id long, text string",
    )
    fp = text.winnow_fingerprints(df, "doc_id", "text", k=k, w=w, family=family)
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # density ~2/(w+1): far fewer fingerprints than k-grams
    n_grams_1 = len("aaaa xxxx " + shared + " yyyy") - k + 1
    assert len(by_doc[1]) < n_grams_1 / 2


def test_rebalance_to_mixture(spark, sf_dir):
    from exporter_spark.operators.sampling import rebalance_to_mixture
    from exporter_spark.sources.files import load_table

    d = load_table(spark, sf_dir, "documents")
    out = rebalance_to_mixture(d, "lang", "doc_id", {"en": 0.5, "de": 0.5})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"en", "de"}  # other langs dropped
    # the scarcer language survives whole; shares track the 50/50
    # target within hash-selection noise
    src = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    scarce = min(("en", "de"), key=lambda k: src[k])
    assert counts[scarce] == src[scarce]
    ratio = counts["en"] / counts["de"]
    assert 0.6 < ratio < 1.67

    # partitioning-invariant: identical selection after repartition
    ids = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in rebalance_to_mixture(
            d.repartition(7), "lang", "doc_id", {"en": 0.5, "de": 0.5}
        ).collect()
    )
    assert ids == ids2
