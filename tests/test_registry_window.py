"""Guard the driver's 50-query correctness window.

The round driver verifies only the FIRST 50 entries of the query
registry (insertion order).  Round 3's verdict found that rounds 2-3
had registered new relational queries ahead of the flagship
dedup/similarity/quality block, silently evicting it from the window
for two rounds.  Since round 5 the window ROTATES deliberately; the
invariant these tests pin is therefore not a fixed membership but the
rotation contract: every registered query sits in THIS round's window
or was verified in the PREVIOUS round's — nothing goes unverified for
two consecutive rounds.
"""

from __future__ import annotations

from exporter_spark.queries import _R04_WINDOW, DRIVER_WINDOW, QUERIES


def test_window_is_the_first_50_entries():
    names = list(QUERIES)
    assert len(names) >= 50
    assert len(DRIVER_WINDOW) == 50
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)


def test_rotation_covers_every_query_within_two_rounds():
    """A query may ride the back half only if the previous round's
    driver window verified it — a NEW query must enter the window the
    round it is registered."""
    uncovered = set(QUERIES) - set(DRIVER_WINDOW) - _R04_WINDOW
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


def test_round4_touched_formatter_paths_in_window():
    # round 4 changed the CSV whitespace handling, JSON temporal
    # rendering, and the tostring float oracle — their registry
    # queries must be re-verified by this round's driver run
    first_50 = set(list(QUERIES)[:50])
    assert {
        "csv_lines_events",
        "xml_rows_events",
        "ndjson_lines_docs",
        "tostring_events",
    } <= first_50
