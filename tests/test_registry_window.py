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

Round-11 arithmetic change: the registry reached 100 entries, so two
consecutive 50-slot windows EXACTLY PARTITION it — there is no slack
left for q1/q3 to ride every window.  The canaries now alternate with
the flagship half (they stay continuously exercised by bench.py and
the full pytest oracle sweep); the partition itself becomes the
stronger invariant: window ∪ previous-window = registry, disjointly.
"""

from __future__ import annotations

from exporter_spark.queries import _R10_WINDOW, DRIVER_WINDOW, QUERIES


def test_window_is_the_first_50_entries():
    names = list(QUERIES)
    assert len(names) >= 50
    assert len(DRIVER_WINDOW) == 50
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)


def test_rotation_covers_every_query_within_two_rounds():
    """A query may ride the back half only if the previous round's
    driver window verified it — a NEW query must enter the window the
    round it is registered."""
    uncovered = set(QUERIES) - set(DRIVER_WINDOW) - _R10_WINDOW
    assert not uncovered, (
        f"queries in neither this round's window nor last round's: "
        f"{sorted(uncovered)} — add them to DRIVER_WINDOW"
    )


def test_window_has_no_duplicates_or_unknowns():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    unknown = set(DRIVER_WINDOW) - set(QUERIES)
    assert not unknown


def test_windows_exactly_partition_the_100_entry_registry():
    """At 100 registered queries the two-round coverage invariant
    forces the window pair to be an exact disjoint partition — any
    overlap would leave some query out of both windows.  This also
    pins where the q1/q3 canaries live: the flagship half, verified
    driver-green in CORRECTNESS_r10."""
    assert len(QUERIES) == 100
    assert set(DRIVER_WINDOW) | _R10_WINDOW == set(QUERIES)
    assert not (set(DRIVER_WINDOW) & _R10_WINDOW)
    assert {"q1_pricing_summary", "q3_top_orders"} <= _R10_WINDOW


def test_round11_window_holds_the_new_code():
    """The standing rule: new code sits in-window the round it lands.
    Round 11 registered the incremental (delta-vs-store) dedup pair —
    the one surface VERDICT r10 flagged as pytest-only — so both must
    be in the r11 driver window, and first (they are the headline)."""
    first_50 = set(list(QUERIES)[:50])
    assert {
        "incremental_exact_survivors",
        "incremental_minhash_survivors",
    } <= first_50
    assert DRIVER_WINDOW[0] == "incremental_exact_survivors"
    assert DRIVER_WINDOW[1] == "incremental_minhash_survivors"
    # spot-check the relational/formatter families rotated back in
    assert {
        "tostring_events",
        "csv_lines_events",
        "q2_min_cost_supplier",
        "q22_wealthy_low_activity",
        "events_sessions",
        "token_stats_by_lang",
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
