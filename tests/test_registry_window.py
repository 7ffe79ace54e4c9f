"""Guard the driver's 50-query correctness window.

The round driver verifies only the FIRST 50 entries of the query
registry (insertion order).  Round 3's verdict found that rounds 2-3
had registered new relational queries ahead of the flagship
dedup/similarity/quality block, silently evicting it from the window
for two rounds.  Since round 5 the window ROTATES deliberately; the
invariant these tests pin is therefore not a fixed membership but the
rotation contract.  Round-6 refinement (ADVICE r05): queries whose
implementations the PREVIOUS round touched must ride the next
window, so the driver gate always checks the current code, never the
pre-change version it already verified.

Round-17 policy (VERDICT r16 #2 — the registry outgrew the point
where two 50-slot windows partition it): the binding invariant is
MAX ABSENCE = 2 ROUNDS, asserted mechanically below:

  (A) coverage:      QUERIES == WINDOW ∪ PREV_WINDOW ∪ CARRYOVER
  (B) absence bound: CARRYOVER ∩ PREV_CARRYOVER == ∅ and the
      previous carryovers LEAD this window — an entry sits out at
      most two consecutive rounds, then must return as a lead;
  (C) parentage:     every carryover is a thin derivative/component
      of an in-window entry (or carries its own stronger-than-driver
      pytest gate);
  (D) size formula:  |CARRYOVER| == E - 100 + R (R = touched-code
      riders repeating from the previous window) — growth beyond
      what the formula forces means the contract is eroding.
"""

from __future__ import annotations

from exporter_spark.queries import (
    _R17_CARRYOVER,
    _R17_WINDOW,
    _R18_CARRYOVER,
    DRIVER_WINDOW,
    QUERIES,
)


def test_window_is_the_first_50_entries():
    names = list(QUERIES)
    assert len(names) >= 50
    assert len(DRIVER_WINDOW) == 50
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)


def test_rotation_covers_every_query_within_two_rounds():
    """Invariant A: a query may ride the back half only if the
    previous round's driver window verified it — a NEW query must
    enter the window the round it is registered.  The explicit
    carryover set is the one sanctioned exception; invariant B
    (below) bounds its members' absence at two rounds."""
    uncovered = (
        set(QUERIES) - set(DRIVER_WINDOW) - _R17_WINDOW - _R18_CARRYOVER
    )
    assert not uncovered, (
        f"queries in neither this round's window nor last round's: "
        f"{sorted(uncovered)} — add them to DRIVER_WINDOW"
    )
    assert set(DRIVER_WINDOW) | _R17_WINDOW | _R18_CARRYOVER == set(QUERIES)


def test_window_has_no_duplicates_or_unknowns():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    unknown = set(DRIVER_WINDOW) - set(QUERIES)
    assert not unknown


def test_absence_bound_policy():
    """Invariant B, both halves: no entry sits out two consecutive
    rounds (this round's carryovers are disjoint from last round's),
    and last round's carryovers all returned as THIS window's leads.
    Invariant D: the carryover count equals exactly what the
    arithmetic forces — E - 100 + R, R being the touched-code riders
    repeating from the previous window (r18: the four r17-window
    consumers of operators/dedup.py's collapsed-pairs path, whose
    cache-pin bookkeeping this optimization round changed)."""
    assert not (_R18_CARRYOVER & _R17_CARRYOVER)
    assert not (_R18_CARRYOVER & set(DRIVER_WINDOW))
    # last round's carryovers lead this window, in positions 0..11
    assert set(DRIVER_WINDOW[: len(_R17_CARRYOVER)]) == _R17_CARRYOVER
    riders = set(DRIVER_WINDOW) & _R17_WINDOW
    assert riders == {
        "minhash_near_dup_pairs",
        "incremental_minhash_survivors",
        "dedup_cluster_sizes",
        "dup_rate_by_source",
    }
    assert len(_R18_CARRYOVER) == len(QUERIES) - 100 + len(riders)


def test_carryover_parentage():
    """Invariant C: each r18 carryover's parent entry is in-window
    (the full parentage rationale lives beside _R18_CARRYOVER in
    queries/__init__.py)."""
    assert len(QUERIES) == 110
    parent_of = {
        "csv_lines_events": "html_rows_events",
        "xml_rows_events": "html_rows_events",
        "ndjson_lines_docs": "html_rows_events",
        "boilerplate_spans": "winnow_fingerprints",
        "ngram_contamination_check": "ngram_jaccard_pairs",
        "paragraph_dedup_docs": "dedup_exact_docs",
        "cosine_topk": "cosine_topk_scan",
        "tfidf_top_terms": "bm25_topk_docs",
        "embedding_random_projection": "lsh_ann_topk",
        "lang_token_budget": "lm_quality_buckets",
        "docs_sample_deterministic": "docs_stratified_sample",
        "docs_rebalanced_mixture": "temperature_mixture_docs",
        "distinct_counts": "cube_order_stats",
        "conversion_funnel": "retention_cohorts",
    }
    assert _R18_CARRYOVER == set(parent_of)
    in_window = set(DRIVER_WINDOW)
    for child, parent in parent_of.items():
        assert parent in in_window, f"{child}'s parent {parent} not in-window"


def test_round18_window_holds_the_new_code():
    """The standing rule: code a round touches sits in-window that
    round.  Round 18 (optimization round 2 — no new entries) leads
    with the twelve returning r17 carryovers, then the four
    touched-code riders (operators/dedup.py's collapsed-pairs path
    gained cache-pin bookkeeping, so its r17-window consumers
    re-verify), then the flagship half — starting with the touched
    path's other consumers (minhash_dedup_survivors, dedup_clusters)
    and q1, whose spread this round's cold-JVM A/B re-adjudicated and
    kept."""
    assert DRIVER_WINDOW[12:19] == (
        "minhash_near_dup_pairs",
        "incremental_minhash_survivors",
        "dedup_cluster_sizes",
        "dup_rate_by_source",
        "minhash_dedup_survivors",
        "dedup_clusters",
        "q1_pricing_summary",
    )
    first_50 = set(list(QUERIES)[:50])
    # spot-check the flagship half rotated back and the q1/q3 canaries
    # ride it (odd/even alternation)
    assert {
        "q1_pricing_summary",
        "q3_top_orders",
        "winnow_fingerprints",
        "lsh_ann_topk",
        "semdedup_survivors",
        "bpe_merges_learned",
        "gif_decode_stats",
        "pretraining_mix_stats",
    } <= first_50
    # the relational/formatter half is OUT this round, back in r19
    assert "tostring_events" not in first_50
    assert "tostring_events" in _R17_WINDOW


def test_back_half_is_oracle_gated():
    """The half riding outside the driver window must still be
    automatically verified each round: every back-half query either
    carries a DuckDB oracle (test_queries_oracle.py parametrizes over
    the WHOLE registry, so pytest runs it vs the oracle at sf0.001) or
    is one of the three documented no-oracle queries, which are pinned
    by tools/pin_no_oracle.py at sf0.1 (PARITY.md)."""
    no_oracle = {n for n, q in QUERIES.items() if q.oracle is None}
    assert no_oracle <= {
        "approx_distinct_events",
        "semdedup_survivors_greedy",
        "ivf_ann_topk",
    }
    # and the pin tool actually covers the two scale-pinned ones (the
    # third, approx_distinct_events, is gated by its accuracy-contract
    # pytest in test_relational.py)
    import pathlib

    pin_src = pathlib.Path(__file__).parent.parent / "tools" / "pin_no_oracle.py"
    src = pin_src.read_text()
    for name in ("semdedup_survivors_greedy", "ivf_ann_topk"):
        assert name in src, f"{name} lost its pin in tools/pin_no_oracle.py"
