"""Guard the driver's 50-query correctness window.

The round driver verifies only the FIRST 50 entries of the query
registry (insertion order).  Round 3's verdict found that rounds 2-3
had registered new relational queries ahead of the flagship
dedup/similarity/quality block, silently evicting it from the window
for two rounds.  Since round 5 the window ROTATES deliberately; the
invariant these tests pin is therefore not a fixed membership but the
rotation contract: every registered query sits in THIS round's window
or was verified in the PREVIOUS round's — nothing goes unverified for
two consecutive rounds.  Round-6 refinement (ADVICE r05): queries
whose implementations the PREVIOUS round touched must ride the next
window, so the driver gate always checks the current code, never the
pre-change version it already verified.

Round-12 arithmetic change: the registry outgrew 100 entries, so two
consecutive 50-slot windows can no longer cover it exactly — one
entry pair must sit out each round.  The carryover set is pinned
explicitly (``_R14_CARRYOVER``): it must stay tiny, consist only of
thin derivatives of operators whose flagship entries ARE in-window,
and rotate back in the following round (each member's absence is
bounded meanwhile by the committed full-registry sf0.01 replay + the
pytest oracle gate, both of which cover the WHOLE registry every
round).
"""

from __future__ import annotations

from exporter_spark.queries import (
    _R13_WINDOW,
    _R14_CARRYOVER,
    DRIVER_WINDOW,
    QUERIES,
)


def test_window_is_the_first_50_entries():
    names = list(QUERIES)
    assert len(names) >= 50
    assert len(DRIVER_WINDOW) == 50
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)


def test_rotation_covers_every_query_within_two_rounds():
    """A query may ride the back half only if the previous round's
    driver window verified it — a NEW query must enter the window the
    round it is registered.  The explicit carryover pair is the one
    sanctioned exception (102 entries, 100 slots across two rounds);
    its members were driver-green in CORRECTNESS_r12 with unchanged
    plans since."""
    uncovered = (
        set(QUERIES) - set(DRIVER_WINDOW) - _R13_WINDOW - _R14_CARRYOVER
    )
    assert not uncovered, (
        f"queries in neither this round's window nor last round's: "
        f"{sorted(uncovered)} — add them to DRIVER_WINDOW"
    )


def test_window_has_no_duplicates_or_unknowns():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    unknown = set(DRIVER_WINDOW) - set(QUERIES)
    assert not unknown


def test_window_pair_covers_all_but_the_pinned_carryovers():
    """At 102 registered queries the window pair covers everything
    except the pinned carryover pair.  Round 14 has NO window overlap:
    the one r13 overlap entry (incremental_minhash_survivors) was
    verified on its current code in the r13 window and its module is
    untouched this round.  The carryover set itself must stay a pair
    of thin derivatives — growth here would mean the rotation
    contract is eroding."""
    assert len(QUERIES) == 102
    assert set(DRIVER_WINDOW) | _R13_WINDOW | _R14_CARRYOVER == set(QUERIES)
    assert not (set(DRIVER_WINDOW) & _R13_WINDOW)
    assert _R14_CARRYOVER == {"cosine_topk_scan", "exact_substring_strip"}
    assert not (_R14_CARRYOVER & set(DRIVER_WINDOW))
    assert not (_R14_CARRYOVER & _R13_WINDOW)
    # the carryovers' flagship parents ARE in-window
    assert {"cosine_topk", "exact_substring_spans"} <= set(DRIVER_WINDOW)
    # the q1/q3 canaries alternate with the flagship half (IN this
    # round, riding the flagship block)
    assert {"q1_pricing_summary", "q3_top_orders"} <= set(DRIVER_WINDOW)


def test_round14_window_holds_the_new_code():
    """The standing rule: code a round touches sits in-window that
    round.  Round 14 leads with the r13 carryover pair (the rotation
    contract bounds their absence to one round-pair) followed by the
    new media_decode_stats — the entry that finally puts the real
    PNG/BMP/PPM/WAV codecs under the driver gate (VERDICT r13 #1).
    Round 14 also touches the IVF defaults, so both IVF entries must
    ride."""
    first_50 = set(list(QUERIES)[:50])
    assert DRIVER_WINDOW[0] == "bpe_token_stats_by_lang"
    assert DRIVER_WINDOW[1] == "cube_order_stats"
    assert DRIVER_WINDOW[2] == "media_decode_stats"
    assert {"ivf_fixed_topk", "ivf_ann_topk"} <= first_50
    # the changed multimodal module's other entry rides too
    assert "multimodal_feature_stats" in first_50
    # spot-check the flagship families rotated back in
    assert {
        "dedup_exact_docs",
        "minhash_near_dup_pairs",
        "cosine_topk",
        "gopher_quality_signals",
        "dsir_importance_weights",
        "retention_cohorts",
    } <= first_50


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
