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
"""

from __future__ import annotations

from exporter_spark.queries import _R09_WINDOW, DRIVER_WINDOW, QUERIES


def test_window_is_the_first_50_entries():
    names = list(QUERIES)
    assert len(names) >= 50
    assert len(DRIVER_WINDOW) == 50
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)


def test_rotation_covers_every_query_within_two_rounds():
    """A query may ride the back half only if the previous round's
    driver window verified it — a NEW query must enter the window the
    round it is registered."""
    uncovered = set(QUERIES) - set(DRIVER_WINDOW) - _R09_WINDOW
    assert not uncovered, (
        f"queries in neither this round's window nor last round's: "
        f"{sorted(uncovered)} — add them to DRIVER_WINDOW"
    )


def test_window_has_no_duplicates_or_unknowns():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    unknown = set(DRIVER_WINDOW) - set(QUERIES)
    assert not unknown


def test_window_keeps_canaries():
    # two long-stable relational queries ride in EVERY window as
    # cross-round continuity canaries
    first_50 = set(list(QUERIES)[:50])
    assert {"q1_pricing_summary", "q3_top_orders"} <= first_50


def test_round10_window_is_the_forced_complement():
    # With 98 registered queries and a 50-slot window, the only window
    # satisfying two-round coverage after r09's relational/formatter
    # half is its complement (the dedup/similarity/quality flagship
    # block) plus the q1/q3 canaries.  Any round-10 code touch must
    # either sit in this window, be plumbing exercised window-wide, or
    # be a behavior-preserving edit pinned by pytest+PARITY; the
    # recorded round-end full-registry replay at sf0.01 verifies all
    # 98 against final round-10 code (see the DRIVER_WINDOW comment in
    # queries.py).
    first_50 = set(list(QUERIES)[:50])
    assert first_50 == (set(QUERIES) - _R09_WINDOW) | {
        "q1_pricing_summary", "q3_top_orders"
    }
    # spot-check the dedup/similarity families rotated back in
    assert {
        "dedup_exact_docs",
        "minhash_near_dup_pairs",
        "minhash_dedup_survivors",
        "cosine_topk",
        "semdedup_survivors",
        "pretraining_mix_stats",
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
