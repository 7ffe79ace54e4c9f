"""Guard the driver's 50-query correctness window.

The round driver verifies only the FIRST 50 entries of the query
registry (insertion order).  Round 3's verdict found that rounds 2-3
had registered new relational queries ahead of the flagship
dedup/similarity/quality block, silently evicting it from the window
for two rounds.  These assertions fail the build if that ever happens
again: every driver-critical operator family must sit inside the
first 50 slots.
"""

from __future__ import annotations

from exporter_spark.queries import DRIVER_WINDOW, QUERIES

DRIVER_CRITICAL = {
    # dedup
    "minhash_near_dup_pairs",
    "minhash_dedup_survivors",
    "dedup_clusters",
    "simhash_near_dup_pairs",
    "paragraph_dedup_docs",
    "exact_substring_spans",
    "exact_substring_strip",
    "ngram_contamination_check",
    # similarity
    "cosine_topk",
    "cosine_topk_scan",
    "lsh_ann_topk",
    "embedding_near_dup",
    "ivf_fixed_topk",
    "semdedup_survivors",
    # quality / retrieval / sampling
    "gopher_quality_signals",
    "gopher_filter_stats",
    "bm25_topk_docs",
    "dsir_importance_weights",
    "pretraining_mix_stats",
    "training_shuffle_docs",
    "docs_stratified_sample",
    "temperature_mixture_docs",
    # multimodal
    "multimodal_feature_stats",
}


def test_window_is_the_first_50_entries():
    names = list(QUERIES)
    assert len(names) >= 50
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)


def test_driver_critical_queries_inside_window():
    first_50 = set(list(QUERIES)[:50])
    missing = DRIVER_CRITICAL - first_50
    assert not missing, (
        f"driver-critical queries evicted from the 50-entry window: "
        f"{sorted(missing)}"
    )


def test_window_has_no_duplicates_or_unknowns():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    unknown = set(DRIVER_WINDOW) - set(QUERIES)
    assert not unknown


def test_window_keeps_canaries():
    # two long-stable relational queries ride in the window as
    # cross-round continuity canaries
    first_50 = set(list(QUERIES)[:50])
    assert {"q1_pricing_summary", "q3_top_orders"} <= first_50
