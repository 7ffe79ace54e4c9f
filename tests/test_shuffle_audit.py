"""Shuffle-bytes regression pins (round 10).

The scan-audit snapshot pins PLAN shape; these tests pin the runtime
complement — bytes actually moved — via AppStatusStore deltas
(benchlib.shuffle_totals, same mechanism as
tools/shuffle_audit_r10.py, whose committed full-registry snapshot
lives in tools/audits/r10_shuffle_audit_sf0.001.json).

Two classes of pin:

* STRUCTURAL: entries whose operators are pure column expressions (or
  per-partition serialization) must move ZERO shuffle bytes at any
  SF. A nonzero reading means someone added an Exchange to a path
  that is advertised as riding the scan. NOTE this set is the
  DESIGNED-zero list, not everything the audit measured as zero at
  sf0.001 — e.g. dedup_clusters reads 0 there only because AQE
  broadcasts its tiny joins at that SF; it is genuinely
  shuffle-bearing at scale and deliberately NOT pinned.

* BAND: the two heaviest flagship movers must stay within 2x of the
  committed snapshot's bytes at the same SF. Wall-clock at sf0.1
  hides byte regressions inside host noise; bytes cannot drift with
  host load (they are compression/partitioning-dependent, hence the
  generous band — the test session runs 4 shuffle partitions vs the
  audit tool's 32).
"""

from __future__ import annotations

import json
import pathlib

import pytest

from exporter_spark.benchlib import shuffle_totals
from exporter_spark.queries import QUERIES

# operators documented as zero-shuffle / expression-only, confirmed
# 0/0 by the r10 audit at sf0.001
EXPRESSION_ONLY = (
    "tostring_events",
    "csv_lines_events",
    "xml_rows_events",
    "ndjson_lines_docs",
    "doc_fingerprints",
    "docs_sample_deterministic",
    "dedup_tokens_within_docs",
    "embedding_quantize_stats",
    "embedding_random_projection",
    "pii_redaction_check",
    "multimodal_feature_stats",
)

SNAPSHOT = (
    pathlib.Path(__file__).parent.parent
    / "tools"
    / "audits"
    / "r10_shuffle_audit_sf0.001.json"
)


def _run_and_measure(spark, name, sf_dir):
    # w0 BEFORE fn(): operators with eager internal jobs (CC's edge
    # materialization) shuffle during plan construction, not the write
    w0, r0 = shuffle_totals(spark)
    df = QUERIES[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    w1, r1 = shuffle_totals(spark)
    return w1 - w0, r1 - r0


@pytest.mark.parametrize("name", EXPRESSION_ONLY)
def test_expression_only_entries_move_zero_shuffle_bytes(spark, sf_dir, name):
    w, r = _run_and_measure(spark, name, sf_dir)
    assert (w, r) == (0, 0), (
        f"{name} moved shuffle bytes (write={w}, read={r}) — an Exchange "
        "crept into an expression-only path; compare the plan against "
        "tools/audits/r10_shuffle_audit_sf0.001.json"
    )


@pytest.mark.parametrize(
    "name", ["minhash_near_dup_pairs", "exact_substring_strip"]
)
def test_flagship_shuffle_bytes_within_band(spark, sf_dir, name):
    recorded = json.loads(SNAPSHOT.read_text())["shuffle_bytes"][name]
    w, r = _run_and_measure(spark, name, sf_dir)
    assert w <= 2 * recorded["write"], (
        f"{name}: shuffle write {w} > 2x the recorded {recorded['write']} "
        "— the pipeline started moving the corpus; see the audit snapshot"
    )
    assert r <= 2 * recorded["read"], (
        f"{name}: shuffle read {r} > 2x the recorded {recorded['read']}"
    )
