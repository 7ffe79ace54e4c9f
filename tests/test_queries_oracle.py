"""Replicates the driver's correctness gate locally at sf0.001:
every query with an oracle must match DuckDB on row count, column
names, and (order-insensitively) values."""

from __future__ import annotations

import math

import duckdb
import pytest

from exporter_spark.queries import QUERIES
from exporter_spark.sources.files import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(v):
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 9)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), v if v is not None else 0) for v in t),
    )


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle])
def test_query_matches_oracle(spark, con, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(q.oracle)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle is None])
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
