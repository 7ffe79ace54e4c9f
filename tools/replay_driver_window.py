#!/usr/bin/env python
"""Replay of the driver's correctness gate, runnable at any SF.

The per-round driver checks the FIRST 50 entries of
``__spark_entry__.queries()`` at sf0.01: for each oracle-paired query
it runs the Spark plan AND the DuckDB oracle and compares row count,
column names, and (order-insensitively) values. This script is the
same check, kept in-repo so a registry or oracle edit can be verified
against the exact gate before the round closes.

Usage:
    python tools/replay_driver_window.py [sf_dir] [n_queries] [offset]
defaults: /root/testdata/sf0.01, 50, 0.  Prints one line per query and
a final SUMMARY line; exit code 1 if any checked query fails.
``offset 50`` replays the registry's BACK half — the entries the
driver does NOT check this round — so a window rotation never leaves
a query unverified against its current implementation.
``n_queries = all`` replays the ENTIRE registry in one invocation
(the mechanical pre-round-end step: front window + back half, one
SUMMARY line).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from exporter_spark.queries import QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import TABLES  # noqa: E402


def _canon(v):
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 9)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(
            (v is None, str(type(v)), v if v is not None else 0) for v in t
        ),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # accept a bare SF name ("sf0.01") for the standard testdata root —
    # passing it verbatim used to fail only later, at view creation
    # (VERDICT r06 note)
    if not os.path.isdir(sf_dir) and os.path.isdir(f"/root/testdata/{sf_dir}"):
        sf_dir = f"/root/testdata/{sf_dir}"
    n_arg = sys.argv[2] if len(sys.argv) > 2 else "50"
    n = len(QUERIES) if n_arg == "all" else int(n_arg)
    offset = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    spark = get_spark("exporter_spark-replay")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    window = list(QUERIES.items())[offset : offset + n]
    failures = []
    for name, q in window:
        t0 = time.perf_counter()
        try:
            from exporter_spark.operators.partitioning import cache_scope

            with cache_scope():
                sdf = q.fn(spark, sf_dir)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
            if q.oracle is None:
                print(f"  {name}: rows-only ({len(srows)} rows, "
                      f"{time.perf_counter() - t0:.1f}s)")
                continue
            rel = con.sql(q.oracle)
            drows = rel.fetchall()
            ok_cols = sorted(scols) == sorted(rel.columns)
            ok_rows = len(srows) == len(drows)
            ok_vals = ok_cols and ok_rows and (
                _rowset(scols, srows) == _rowset(rel.columns, drows)
            )
            status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
            if status == "FAIL":
                failures.append(name)
            print(f"  {name}: {status} ({len(srows)} vs {len(drows)} rows, "
                  f"cols={ok_cols} vals={ok_vals}, "
                  f"{time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report and continue, like the driver
            failures.append(name)
            print(f"  {name}: ERR {type(e).__name__}: {str(e)[:160]}")
    print(f"SUMMARY: {len(window) - len(failures)}/{len(window)} green"
          + (f"; failures: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
