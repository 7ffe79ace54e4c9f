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
explicitly (``_R15_CARRYOVER``): it must stay small, consist only of
thin derivatives of operators whose flagship entries ARE in-window,
and rotate back in the following round (each member's absence is
bounded meanwhile by the committed full-registry sf0.01 replay + the
pytest oracle gate, both of which cover the WHOLE registry every
round).  Round 15: five carryovers — the touched-code rule forced
three multimodal entries into the relational-half window (the round
changed the extract_features/resize_media defaults and added
jpeg_decode_stats), displacing two extra relational entries on top of
the structural three.
"""

from __future__ import annotations

from exporter_spark.queries import (
    _R14_WINDOW,
    _R15_CARRYOVER,
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
    sanctioned exception (103 entries, 100 slots across two rounds);
    its members were driver-green in CORRECTNESS_r13 with unchanged
    plans since."""
    uncovered = (
        set(QUERIES) - set(DRIVER_WINDOW) - _R14_WINDOW - _R15_CARRYOVER
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
    """At 103 registered queries the window pair covers everything
    except the pinned carryovers.  Round 15 has FOUR new/overlap
    entries (media_decode_stats, multimodal_feature_stats were
    verified in the r14 window AND ride again because this round
    changed the extract_features/auto_decoder defaults they execute;
    jpeg_decode_stats and gif_decode_stats are new), so six
    relational-half members sit
    out — each a thin derivative of an in-window flagship. Growth of
    this set beyond what the touched-code rule forces would mean the
    rotation contract is eroding."""
    assert len(QUERIES) == 104
    assert set(DRIVER_WINDOW) | _R14_WINDOW | _R15_CARRYOVER == set(QUERIES)
    overlap = set(DRIVER_WINDOW) & _R14_WINDOW
    assert overlap == {"media_decode_stats", "multimodal_feature_stats"}
    assert _R15_CARRYOVER == {
        "csv_lines_events",
        "xml_rows_events",
        "ndjson_lines_docs",
        "quality_by_source",
        "docs_sample_deterministic",
        "distinct_counts",
    }
    assert not (_R15_CARRYOVER & set(DRIVER_WINDOW))
    # the carryovers' flagship parents ARE in-window: the three
    # formatter framings derive from tostring_events; the two
    # curation components compose inside curation_pipeline
    assert {"tostring_events", "curation_pipeline"} <= set(DRIVER_WINDOW)
    # the q1/q3 canaries alternate with the flagship half (OUT this
    # round, riding the r14 flagship window)
    assert {"q1_pricing_summary", "q3_top_orders"} <= _R14_WINDOW


def test_round15_window_holds_the_new_code():
    """The standing rule: code a round touches sits in-window that
    round.  Round 15 leads with the r14 carryover pair, then the new
    jpeg_decode_stats (the JPEG codec under the driver gate via
    pinned decode(encode(x)) literals), then the two multimodal
    entries whose executed defaults this round changed."""
    first_50 = set(list(QUERIES)[:50])
    assert DRIVER_WINDOW[0] == "cosine_topk_scan"
    assert DRIVER_WINDOW[1] == "exact_substring_strip"
    assert DRIVER_WINDOW[2] == "jpeg_decode_stats"
    assert DRIVER_WINDOW[3] == "gif_decode_stats"
    assert DRIVER_WINDOW[4] == "media_decode_stats"
    assert DRIVER_WINDOW[5] == "multimodal_feature_stats"
    # spot-check the relational/formatter families rotated back in
    assert {
        "tostring_events",
        "q2_min_cost_supplier",
        "events_sessions",
        "incremental_exact_survivors",
        "token_stats_by_lang",
        "approx_distinct_events",
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
