#!/usr/bin/env python
"""Round-14 adjudication of the r13 export-family regression
(VERDICT r13 wrong #1): BENCH_r13 read the five io-bound export
entries 1.43-1.63x their BENCH_r12 values under a QUIET io canary
(0.723, inside the <=0.80 quiet-disk band), and the round closed with
an environmental attribution that had not run the repo's own binding
protocol. This tool runs that protocol: an INTERLEAVED same-host A/B
between the r12 closing commit (1f2b316) and HEAD.

Mechanics: git-diff evidence says the export path (formatters/,
plans/, exporter.py, functions/, bench.py) is byte-identical across
the span, so this A/B is expected to read ~1.0x — in which case the
r13 delta is adjudicated HOST-TRANSIENT and the mechanism question
becomes "why did the io_canary not see it" (answered by the
canary-vs-export volume note in the emitted JSON). A reproducible
A!=B reading would instead prove the diff evidence wrong and trigger
a bisect.

Interleaving is per-ITERATION at process granularity (A, B, A, B,
...): pyspark is one JVM per process, so each side runs in a fresh
subprocess that times the five entries exactly like bench.py
(min-of-3 within the session, same ExportSpec, same noop-free
write-to-tmp semantics), and the cross-process min per side absorbs
JIT variance symmetrically. Canary probes bracket the whole run AND
each iteration, so a host-load burst mid-A/B is visible in the
record instead of silently poisoning one side.

Usage: python tools/export_ab_r14.py [iterations] [--ref <commit>]
Writes tools/audits/r14_export_ab.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF_COMMIT = "1f2b316"

WORKER = r"""
import json, os, shutil, sys, tempfile, time
tree = sys.argv[1]
sys.path.insert(0, tree)
from exporter_spark import Exporter, ExportSpec
from exporter_spark.benchlib import timed
from exporter_spark.session import get_spark
from exporter_spark.sources.files import load_table
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("export-ab-r14")
spark.range(1_000_000).select(F.sum("id")).collect()
load_table(spark, SF, "lineitem").limit(1000).count()
li = load_table(spark, SF, "lineitem")
out_root = tempfile.mkdtemp(prefix="export_ab_r14_")
t = {}
try:
    for fmt in ("csv", "json", "xml"):
        t[f"export_{fmt}"] = timed(
            lambda fmt=fmt: Exporter(li, fmt, ExportSpec()).write(
                f"{out_root}/{fmt}"
            ),
            3,
        )
    from exporter_spark.formatters.xml import XMLFormatter
    t["export_xml_docs"] = timed(
        lambda: XMLFormatter(ExportSpec()).write(
            li, f"{out_root}/xml_docs", documents=True
        ),
        3,
    )
    from exporter_spark.formatters.json import JSONFormatter
    t["export_json_array"] = timed(
        lambda: JSONFormatter(ExportSpec()).write_array_file(
            li, f"{out_root}/li_arr.json"
        ),
        3,
    )
finally:
    shutil.rmtree(out_root, ignore_errors=True)
print("WORKER_JSON:" + json.dumps(t))
"""

ENTRIES = (
    "export_csv",
    "export_json",
    "export_xml",
    "export_xml_docs",
    "export_json_array",
)


def run_worker(tree: str) -> dict[str, float]:
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, tree],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("WORKER_JSON:"):
            return json.loads(line[len("WORKER_JSON:") :])
    raise RuntimeError(
        f"worker on {tree} produced no timing line:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def canary() -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "canary_probe.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_BENCH_REPEAT": "2"},
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {"error": proc.stderr[-500:]}


def main() -> None:
    args = sys.argv[1:]
    ref = REF_COMMIT
    if "--ref" in args:
        i = args.index("--ref")
        if i + 1 >= len(args):
            raise SystemExit("usage: export_ab_r14.py [iterations] [--ref <commit>]")
        ref = args[i + 1]
        del args[i : i + 2]
    iterations = int(args[0]) if args else 3

    ref_tree = tempfile.mkdtemp(prefix="export_ab_ref_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", ref_tree, ref],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    record: dict = {
        "ref": ref,
        "head": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.strip(),
        # the B side times the WORKING TREE — a binding artifact must
        # say so when that tree differs from the recorded commit
        "head_tree_dirty": bool(
            subprocess.run(
                ["git", "status", "--porcelain"],
                cwd=REPO,
                capture_output=True,
                text=True,
            ).stdout.strip()
        ),
        "iterations": iterations,
        "canary_open": canary(),
        "runs": {"ref": [], "head": []},
    }
    print(f"[ab] canary_open: {record['canary_open']}", file=sys.stderr)
    try:
        for it in range(iterations):
            # alternate which side runs first: a monotonically rising
            # host load would otherwise bias against the fixed second
            # slot (observed in the first 3-iteration run: io_canary
            # rose 0.81 -> 1.00 across the run and the second-slot
            # side read ~1.1x on the short entries while the long
            # entries read ~1.0x)
            order = (("ref", ref_tree), ("head", REPO))
            if it % 2:
                order = order[::-1]
            for side, tree in order:
                t = run_worker(tree)
                record["runs"][side].append(t)
                print(f"[ab] iter {it} {side}: {t}", file=sys.stderr)
            record.setdefault("canary_mid", []).append(canary())
            print(
                f"[ab] canary after iter {it}: {record['canary_mid'][-1]}",
                file=sys.stderr,
            )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", ref_tree],
            cwd=REPO,
            capture_output=True,
        )
        # preserve whatever completed even if a late worker/canary
        # died — the runs are multi-minute Spark sessions and the
        # partial evidence is the expensive part
        partial = os.path.join(HERE, "audits", "r14_export_ab_partial.json")
        with open(partial, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True)

    summary = {}
    for e in ENTRIES:
        a = min(r[e] for r in record["runs"]["ref"])
        b = min(r[e] for r in record["runs"]["head"])
        summary[e] = {
            "ref_min": a,
            "head_min": b,
            "head_over_ref": round(b / a, 3) if a else None,
        }
    record["summary"] = summary
    out = os.path.join(HERE, "audits", "r14_export_ab.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)
    print(json.dumps(summary, indent=2))
    print(f"[ab] wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
