#!/usr/bin/env python
"""Plan-shape audit over the query corpus: file scans, cache reads,
exchange reuse.

Spark shares no scans between plan branches, so a stats-then-join-back
pipeline silently multiplies corpus reads (round 4 found the bigram LM
at 5 scans, dup_rate_by_source at 21). This tool executes each query
at a small SF and reports counts from the query's PRE-execution
adaptive plan (the noop write runs its own QueryExecution, so
executedPlan() on the DataFrame still shows isFinalPlan=false —
ADVICE r08): FileScan counts are planning-time plan shape, stable
across SFs, unlike AQE's runtime stage replacements.
tests/test_scan_audit_regression.py compares against the snapshots
this writes using the identical parse, so the gate is consistent:

  FileScan            parquet scans that EXECUTE — occurrences outside
                      any InMemoryRelation subtree. (Round 10: the
                      raw text count double-counted cached plans —
                      InMemoryRelation prints its child subtree, so a
                      materialize() that REMOVED corpus passes showed
                      up as the FileScan count doubling. The parser
                      below skips everything under an
                      InMemoryRelation node; RawFileScan keeps the
                      old text count for reference. Snapshots from
                      r07-r09 used the raw count — diffs across the
                      r10 boundary must compare RawFileScan.)
  InMemoryTableScan   branches served from a materialize()d frame
  ReusedExchange      runtime exchange dedup

Usage: python tools/scan_audit.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exporter_spark.operators.partitioning import cache_scope  # noqa: E402
from exporter_spark.queries import QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402

# Anchored to the tree-prefix alphabet (ADVICE r10): only indent made
# of spaces and ':' (branch continuation) may precede the node marker,
# so a '+- ' occurring inside a node's ARGUMENT text (a pushed-filter
# or schema string) can no longer be mistaken for a deeper node and
# prematurely end an InMemoryRelation skip.
_NODE_MARK = re.compile(r"^([ :]*)(\+-|:-)\s")


def executed_file_scans(plan: str) -> int:
    """FileScan nodes OUTSIDE any InMemoryRelation subtree — the scans
    that actually read files when the plan runs (the cached subtree
    executes once at cache build; its printout under every
    InMemoryTableScan consumer is description, not execution)."""
    n = 0
    skip_deeper_than: int | None = None
    for i, line in enumerate(plan.splitlines()):
        m = _NODE_MARK.match(line)
        depth = len(m.group(1)) if m else (0 if i == 0 else None)
        if depth is None:  # argument/continuation line — not a node
            continue
        if skip_deeper_than is not None:
            if depth > skip_deeper_than:
                continue  # still inside the cached subtree
            skip_deeper_than = None
        if "InMemoryRelation" in line:
            skip_deeper_than = depth
            continue
        if "FileScan" in line:
            n += 1
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wanted = sys.argv[2:]
    spark = get_spark("exporter_spark-scan-audit")
    for name, q in QUERIES.items():
        if wanted and not any(w in name for w in wanted):
            continue
        try:
            # cache_scope isolates each query's materialize() caches
            # (round 10): without it, caches linger across the
            # registry loop and later queries' plans pick up another
            # query's InMemoryRelations — session-order-dependent
            # counts the regression test (fresh per-query scopes)
            # would never reproduce.  blocking=True (round 17): the
            # default async unpersist races the NEXT entry's
            # planning — a prior entry's CacheManager registration
            # still matching during plan substitution flipped
            # pretraining_mix_stats' parsed count 6 -> 24 in two
            # full-session runs, while the identical loop read 6 in
            # every isolated and prefix repro.  Synchronous release
            # makes the audit deterministic; the few extra seconds
            # per session are irrelevant here.
            with cache_scope(blocking=True):
                df = q.fn(spark, sf_dir)
                # The noop write is retained purely as an
                # executability check (a plan that cannot run should
                # show up as ERR, not as a clean count row); it does
                # NOT change the plan read below, which is the
                # PRE-execution adaptive plan — the regression test
                # reads the same pre-execution plan and deliberately
                # skips the execution (ADVICE r09).
                df.write.format("noop").mode("overwrite").save()
                plan = df._jdf.queryExecution().executedPlan().toString()
            print(
                f"{name}: FileScan={executed_file_scans(plan)} "
                f"RawFileScan={plan.count('FileScan')} "
                f"InMem={plan.count('InMemoryTableScan')} "
                f"Reused={plan.count('ReusedExchange')}"
            )
        except Exception as e:  # noqa: BLE001 — audit every query regardless
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
