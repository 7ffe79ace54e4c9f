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
consecutive 50-slot windows can no longer cover it exactly — some
entries must sit out each round.  The carryover set is pinned
explicitly (``_R16_CARRYOVER``): it must stay small, consist only of
thin derivatives of operators whose flagship entries ARE in-window,
and rotate back in the following round (each member's absence is
bounded meanwhile by the committed full-registry sf0.01 replay + the
pytest oracle gate, both of which cover the WHOLE registry every
round).  Round 16: eight carryovers — ten
forced leads (six returning r15 carryovers + three new entries + the
gif bomb-guard touched-code rider) displaced eight flagship-half
members, each a thin derivative of an in-window flagship.
"""

from __future__ import annotations

from exporter_spark.queries import (
    _R15_WINDOW,
    _R16_CARRYOVER,
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
    round it is registered.  The explicit carryover set is the one
    sanctioned exception (107 entries, 100 slots across two rounds);
    its members were driver-green in CORRECTNESS_r14 with unchanged
    plans since."""
    uncovered = (
        set(QUERIES) - set(DRIVER_WINDOW) - _R15_WINDOW - _R16_CARRYOVER
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
    """At 107 registered queries the window pair covers everything
    except the pinned carryovers.  Round 16 has ten forced leads
    (six returning r15 carryovers, the new bpe_merges_learned,
    video_frame_stats and phash_near_dup_pairs, and gif_decode_stats
    riding again because this round added the decompression-bomb
    guard to operators/gif.py), so
    eight flagship-half members sit out — each a thin derivative or
    component of an in-window flagship. Growth of this set beyond
    what the touched-code rule forces would mean the rotation
    contract is eroding."""
    assert len(QUERIES) == 107
    assert set(DRIVER_WINDOW) | _R15_WINDOW | _R16_CARRYOVER == set(QUERIES)
    overlap = set(DRIVER_WINDOW) & _R15_WINDOW
    assert overlap == {"gif_decode_stats"}
    assert _R16_CARRYOVER == {
        "embedding_quantize_stats",
        "minhash_near_dup_pairs",
        "embedding_near_dup_banded",
        "ivf_ann_topk",
        "semdedup_survivors_greedy",
        "gopher_filter_stats",
        "top_tokens",
        "docs_train_test_split",
    }
    assert not (_R16_CARRYOVER & set(DRIVER_WINDOW))
    # the carryovers' flagship parents ARE in-window
    assert {
        "minhash_dedup_survivors",  # composes minhash_near_dup_pairs
        "embedding_near_dup",  # banded variant's parent
        "ivf_fixed_topk",  # deterministic sibling of ivf_ann_topk
        "semdedup_survivors",  # deterministic sibling of greedy
        "gopher_quality_signals",  # emits what gopher_filter_stats aggregates
        "tfidf_top_terms",  # composes top_tokens' tokenize+count
        "docs_stratified_sample",  # hash-bucket sibling of train_test_split
        "embedding_random_projection",  # expression-only sibling of quantize
    } <= set(DRIVER_WINDOW)
    # the q1/q3 canaries alternate with the flagship half (IN this
    # round, riding the returning flagship window)
    assert {"q1_pricing_summary", "q3_top_orders"} <= set(DRIVER_WINDOW)


def test_round16_window_holds_the_new_code():
    """The standing rule: code a round touches sits in-window that
    round.  Round 16 leads with the six r15 carryovers, then the new
    bpe_merges_learned (distributed tokenizer training),
    video_frame_stats (the MJPEG-AVI lane under pinned-literal gates)
    and phash_near_dup_pairs (image near-dup via integer-exact
    pHash), then gif_decode_stats (the r16 bomb-guard rider)."""
    first_50 = set(list(QUERIES)[:50])
    assert DRIVER_WINDOW[:10] == (
        "csv_lines_events",
        "xml_rows_events",
        "ndjson_lines_docs",
        "distinct_counts",
        "quality_by_source",
        "docs_sample_deterministic",
        "bpe_merges_learned",
        "video_frame_stats",
        "phash_near_dup_pairs",
        "gif_decode_stats",
    )
    # spot-check the flagship dedup/similarity families rotated back
    assert {
        "dedup_exact_docs",
        "minhash_dedup_survivors",
        "cosine_topk",
        "semdedup_survivors",
        "gopher_quality_signals",
        "docs_stratified_sample",
        "q1_pricing_summary",
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
