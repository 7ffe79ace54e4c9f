"""Guard the driver's bench contract end-to-end.

The round driver runs ``python bench.py`` and parses EXACTLY ONE JSON
line from stdout; an import error, a stray print, or a broken entry
silently corrupts the round's BENCH record. This runs the real thing
as a subprocess at sf0.001 / repeat=1 (~45s) — the same execution
path the driver uses, including a fresh interpreter and session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import pytest

# Heavyweight end-to-end suite: excluded from the dev loop
# (pytest -m 'not slow'), always in round-closing validation.
pytestmark = pytest.mark.slow


def test_bench_emits_one_json_line_with_all_entries():
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_REPEAT": "1",
        "SPARK_GRAFT_CPUS": "4",
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout.strip()
    assert "\n" not in out, f"stdout must be ONE line, got: {out[:300]}"
    d = json.loads(out)
    assert set(d) == {
        "metric", "value", "unit", "queries", "sf",
        "host_canary_sec", "io_canary_sec", "io_brackets", "cc_rounds",
        "cc_mode", "cc_n_edges", "cc_dist_rounds", "spilled_disk_bytes",
        "spilled_memory_bytes",
    }
    # per-family disk-regime brackets (round 15): the export family's
    # numbers must carry the io regime they actually ran under
    assert set(d["io_brackets"]) == {"start", "pre_export", "post_export"}
    assert all(v > 0 for v in d["io_brackets"].values())
    assert d["metric"] == "corpus_total_wall_sec" and d["unit"] == "sec"
    # host-speed canaries: pure-CPU (round 7) and disk-path (round 8),
    # carried in the record but excluded from the engine total
    assert d["host_canary_sec"] > 0
    assert d["io_canary_sec"] > 0
    # scale observables (round 9 rounds, round 10 mode): the CC
    # strategy is runtime-size-gated — driver union-find (rounds 0)
    # for small edge sets, the distributed loop (rounds ≥1) above the
    # gate; sf0.001's tiny duplicate graph rides the driver path
    assert (d["cc_mode"], d["cc_rounds"] == 0) == ("driver", True) or (
        d["cc_mode"] == "distributed" and d["cc_rounds"] >= 1
    )
    # the edge count behind the mode gate (sf0.001 has dup pairs)
    assert d["cc_n_edges"] >= 2
    # round 11 (VERDICT r10 wrong #2): the distributed loop must be
    # exercised somewhere per bench run — the size gate sends the
    # flagship down the driver path, and without this sibling probe
    # the rounds-to-converge regression signal silently disappears
    assert d["cc_dist_rounds"] >= 1, d["cc_dist_rounds"]
    # spill tripwire (round 10): the corpus runs spill-free at test
    # scale — a nonzero reading is a partitioning regression
    assert d["spilled_disk_bytes"] == 0, d["spilled_disk_bytes"]
    assert abs(sum(d["queries"].values()) - d["value"]) < 0.01
    # EXACT entry set — a renamed or dropped entry must fail here, not
    # silently vanish from the round's BENCH record (VERDICT r05 #6)
    sys.path.insert(0, REPO)
    import bench

    expected = set(bench.BENCH_QUERIES) | set(bench.EXTRA_ENTRIES)
    assert set(d["queries"]) == expected, (
        f"missing: {expected - set(d['queries'])}, "
        f"unexpected: {set(d['queries']) - expected}"
    )
    assert d["value"] > 0
    assert all(v > 0 for v in d["queries"].values()), d["queries"]
    # per-entry telemetry goes to STDERR, never stdout
    assert "cached_rdds" in proc.stderr
