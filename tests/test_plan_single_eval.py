"""Plan-level guards against the filter-pushdown double-eval trap.

Catalyst pushes a Filter on a freshly-projected column through the
Project, substituting the column's defining expression into the
predicate — so an expensive expression (shingle transform, normalize
regexp, tokenizing split) silently runs twice per row (measured +35%
on the minhash pair pipeline at sf0.1; BASELINE.md records the
bisect). The operators were reworked to cut rows via raw-input
predicates or empty explode arguments instead; these tests pin the
invariant directly: the expensive expression must never appear inside
a Filter node's predicate. (Global occurrence counts are NOT the
invariant — plans legitimately instantiate a pipeline once per join
branch, deduped at runtime by ReusedExchange.)
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from exporter_spark.operators import dedup, text
from exporter_spark.sources.files import load_table


def _filter_lines_with(df, marker: str) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        ln
        for ln in plan.splitlines()
        if re.search(r"\bFilter\b", ln) and marker in ln
    ]


def test_winnow_normalize_not_in_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # normalize_text = trim(regexp_replace(lower(...))); the old
    # char_length Filter re-ran the whole chain per row
    bad = _filter_lines_with(text.winnow_fingerprints(d), "regexp_replace")
    assert not bad, bad


def test_bigram_split_not_in_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bad = _filter_lines_with(text.bigram_lm_scores(d), "split(")
    assert not bad, bad


def test_minhash_shingles_not_in_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    cands = dedup.minhash_candidate_pairs(d, "doc_id", "text")
    bad = _filter_lines_with(cands, "array_distinct")
    assert not bad, bad


def test_span_grams_split_not_in_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    spans = dedup.exact_substring_spans(d, k=10, min_count=2)
    bad = _filter_lines_with(spans, "split(")
    assert not bad, bad


def test_raw_text_guard_drops_short_docs(spark, sf_dir):
    """The minhash short-doc cut must still drop sub-shingle docs
    (now via the cheap raw-text length predicate)."""
    d = load_table(spark, sf_dir, "documents")
    short = d.withColumn("text", F.lit("ab"))  # all below shingle_n=8
    cands = dedup.minhash_candidate_pairs(short, "doc_id", "text")
    assert cands.count() == 0
