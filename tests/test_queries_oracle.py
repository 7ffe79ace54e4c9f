"""Replicates the driver's correctness gate locally at sf0.001:
every query with an oracle must match DuckDB on row count, column
names, and (order-insensitively) values.

Marked ``slow`` as a MODULE (round 16): the 100+-entry sweep is the
bulk of the dev loop's tail, and it re-runs in every round-closing
full suite, the driver gate, and the sf0.01 full-registry replay.
When you edit a query or oracle, run this file DIRECTLY
(``pytest tests/test_queries_oracle.py -k <name>``) — the dev loop's
``-m 'not slow'`` does not cover you for registry changes."""

from __future__ import annotations

import math

import duckdb
import pytest

pytestmark = pytest.mark.slow

from exporter_spark.operators.partitioning import cache_scope
from exporter_spark.queries import QUERIES
from exporter_spark.sources.files import TABLES

SF_DIR = "/root/testdata/sf0.001"


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()  # noqa: SLF001


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


# The driver's value-hash is dtype-sensitive: Spark int32 vs DuckDB
# BIGINT hash-mismatches even when values are identical (round-1
# token_stats_by_lang). Canonicalize both engines' column types to a
# width-exact lattice and assert equality per column. Decimals are
# collapsed (driver accepted Spark decimal(22,2) vs DuckDB
# DECIMAL(38,2) for q1), as are timestamp flavors.
_SPARK_DTYPE = {
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "bigint": "int64", "float": "float32", "double": "float64",
    "string": "str", "boolean": "bool", "date": "date",
}
_DUCK_DTYPE = {
    "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
    "BIGINT": "int64", "HUGEINT": "int128", "FLOAT": "float32",
    "DOUBLE": "float64", "VARCHAR": "str", "BOOLEAN": "bool",
    "DATE": "date",
}


def _canon_spark_type(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("timestamp"):
        return "ts"
    return _SPARK_DTYPE.get(dt, dt)


def _canon_duck_type(dt: str) -> str:
    dt = str(dt)
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt.startswith("TIMESTAMP"):
        return "ts"
    return _DUCK_DTYPE.get(dt, dt.lower())


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
    # Cache-discipline invariant: every persist a query triggers must
    # be tracked by materialize() and released by the scope — a rogue
    # .persist()/.cache() in an operator, or a materialize() that
    # stops registering, leaks storage memory session-wide and fails
    # here.
    base_cached = _n_cached_rdds(spark)
    with cache_scope(blocking=True):
        sdf = q.fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    # <= not ==: an async unpersist from a prior test may still clear
    leaked = _n_cached_rdds(spark) - base_cached
    assert leaked <= 0, f"{name}: {leaked} cached RDD(s) leaked past cache_scope"
    rel = con.sql(q.oracle)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    stypes = {c: _canon_spark_type(t) for c, t in sdf.dtypes}
    dtypes_ = {c: _canon_duck_type(t) for c, t in zip(dcols, rel.types)}
    dtype_diffs = {
        c: (stypes[c], dtypes_[c]) for c in stypes if stypes[c] != dtypes_[c]
    }
    assert not dtype_diffs, f"{name}: dtype mismatches {dtype_diffs}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_q1_fast_mode_matches_decimal_path(spark):
    """fast=True (plain-double sums) must agree with the decimal
    determinism path to ~1e-9 relative — same answer, cheaper plan."""
    from exporter_spark.queries import q1_pricing_summary

    key = lambda r: (r["l_returnflag"], r["l_linestatus"])
    slow = {key(r): r for r in q1_pricing_summary(spark, SF_DIR).collect()}
    fast = {key(r): r for r in q1_pricing_summary(spark, SF_DIR, fast=True).collect()}
    assert set(slow) == set(fast)
    for k, s in slow.items():
        f = fast[k]
        assert s["count_order"] == f["count_order"]
        for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
            assert abs(s[c] - f[c]) <= 1e-9 * max(1.0, abs(s[c])), (k, c)


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle is None])
def test_rows_only_queries_run(spark, name):
    base_cached = _n_cached_rdds(spark)
    with cache_scope(blocking=True):
        df = QUERIES[name].fn(spark, SF_DIR)
        assert df.count() >= 0
        assert len(df.columns) > 0
    leaked = _n_cached_rdds(spark) - base_cached
    assert leaked <= 0, f"{name}: {leaked} cached RDD(s) leaked past cache_scope"


def test_approx_distinct_tracks_exact_within_rsd(spark):
    """approx_distinct_events is oracle-less (HLL sketches differ per
    engine), so pin its accuracy contract directly: the estimate must
    sit within a generous multiple of the default 5% relative standard
    deviation of the exact count it is shipped alongside."""
    from exporter_spark.queries import QUERIES

    rows = QUERIES["approx_distinct_events"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        exact = r["exact_users"]
        assert exact > 0
        rel_err = abs(r["approx_users"] - exact) / exact
        assert rel_err <= 0.15, (r["event_type"], r["approx_users"], exact)
