#!/usr/bin/env python
"""Named-entry variant of tools/replay_driver_window.py — the same
oracle comparison (rows + columns + order-insensitive values), but
over entries picked by NAME instead of window position. The round-17
optimization rounds touch one operator at a time; this replays exactly
the entries that ride it, at any SF, without paying for the other 100.

Usage: python tools/replay_named_r17.py <sf_dir|sfX> <name> [name ...]
Exit 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from exporter_spark.queries import QUERIES  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import TABLES  # noqa: E402
from replay_driver_window import _rowset  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir = sys.argv[1]
    if not os.path.isdir(sf_dir) and os.path.isdir(f"/root/testdata/{sf_dir}"):
        sf_dir = f"/root/testdata/{sf_dir}"
    names = sys.argv[2:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("exporter_spark-replay-named")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name in names:
        q = QUERIES[name]
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
            status = "OK" if ok_vals else "FAIL"
            if status == "FAIL":
                failures.append(name)
            print(f"  {name}: {status} ({len(srows)} vs {len(drows)} rows, "
                  f"cols={ok_cols} vals={ok_vals}, "
                  f"{time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"  {name}: ERR {type(e).__name__}: {str(e)[:160]}")
    print(f"SUMMARY: {len(names) - len(failures)}/{len(names)} green"
          + (f"; failures: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
