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
    _R16_CARRYOVER,
    _R16_WINDOW,
    _R17_CARRYOVER,
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
        set(QUERIES) - set(DRIVER_WINDOW) - _R16_WINDOW - _R17_CARRYOVER
    )
    assert not uncovered, (
        f"queries in neither this round's window nor last round's: "
        f"{sorted(uncovered)} — add them to DRIVER_WINDOW"
    )
    assert set(DRIVER_WINDOW) | _R16_WINDOW | _R17_CARRYOVER == set(QUERIES)


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
    repeating from the previous window (r17: phash_near_dup_pairs
    for the operators/phash.py grayscale fix, video_frame_stats for
    the operators/avi.py frame-geometry refusal)."""
    assert not (_R17_CARRYOVER & _R16_CARRYOVER)
    assert not (_R17_CARRYOVER & set(DRIVER_WINDOW))
    # last round's carryovers lead this window, in positions 0..7
    assert set(DRIVER_WINDOW[: len(_R16_CARRYOVER)]) == _R16_CARRYOVER
    riders = set(DRIVER_WINDOW) & _R16_WINDOW
    assert riders == {"phash_near_dup_pairs", "video_frame_stats"}
    assert len(_R17_CARRYOVER) == len(QUERIES) - 100 + len(riders)


def test_carryover_parentage():
    """Invariant C: each r17 carryover's parent entry is in-window
    (approx_distinct_events is the documented special case — its
    pytest accuracy gate is stronger than its rows-only driver
    check)."""
    assert len(QUERIES) == 110
    parent_of = {
        "q4_priority_returns": "q21_waiting_suppliers",
        "q8_market_share": "q7_nation_volume",
        "q12_late_shipments": "q10_returned_items",
        "q13_order_count_distribution": "customers_without_orders",
        "q14_promo_revenue": "q19_discounted_revenue",
        "q15_top_supplier": "q2_min_cost_supplier",
        "q17_small_quantity_revenue": "q18_large_volume_orders",
        "events_hourly": "events_sessions",
        "purchases_near_errors": "purchase_attribution",
        "lineitem_dispersion": "rollup_pricing",
        "cosine_topk_scan": "int8_ann_topk",
    }
    special = {"approx_distinct_events"}
    assert _R17_CARRYOVER == set(parent_of) | special
    in_window = set(DRIVER_WINDOW)
    for child, parent in parent_of.items():
        assert parent in in_window, f"{child}'s parent {parent} not in-window"


def test_round17_window_holds_the_new_code():
    """The standing rule: code a round touches sits in-window that
    round.  Round 17 leads with the eight returning r16 carryovers,
    then the new bpe_encoded_token_stats (the BPE ENCODE hot path,
    VERDICT r16 #3), incremental_bloom_stats and cms_top_tokens (the
    Bloom and CMS halves of VERDICT r16 #5), then the two
    touched-code riders:
    phash_near_dup_pairs (grayscale fix, ADVICE r16) and
    video_frame_stats (AVI frame-geometry refusal, hypothesis
    corruption-fuzz find)."""
    assert DRIVER_WINDOW[:13] == (
        "embedding_quantize_stats",
        "minhash_near_dup_pairs",
        "embedding_near_dup_banded",
        "ivf_ann_topk",
        "semdedup_survivors_greedy",
        "gopher_filter_stats",
        "top_tokens",
        "docs_train_test_split",
        "bpe_encoded_token_stats",
        "incremental_bloom_stats",
        "cms_top_tokens",
        "phash_near_dup_pairs",
        "video_frame_stats",
    )
    # spot-check the relational/formatter half rotated back
    first_50 = set(list(QUERIES)[:50])
    assert {
        "q2_min_cost_supplier",
        "q22_wealthy_low_activity",
        "tostring_events",
        "incremental_exact_survivors",
        "incremental_minhash_survivors",
        "jpeg_decode_stats",
        "media_decode_stats",
        "curation_pipeline",
    } <= first_50
    # the q1/q3 canaries ride the flagship half (odd/even
    # alternation) — OUT this round, back with it in r18
    assert "q1_pricing_summary" not in first_50
    assert "q1_pricing_summary" in _R16_WINDOW


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
