"""Spark↔DuckDB oracle parity on DEGENERATE inputs the generator's
testdata never produces: NaN/±Inf/-0.0/huge/tiny float values, Go's
zero time, NULL join keys (lang/source/user_id/n_chars), and fields
whose first rune is in Go's unicode.IsSpace set beyond space/tab.

The sf0.001 replay (test_queries_oracle) proves parity on the
generator's domain; this file proves the display/tostring oracles
(_DUCK_TS/_duck_go_float/_duck_csv_q) and the NULL-key join fixes
(IS NOT DISTINCT FROM, sentinel blocking keys, eqNullSafe) hold on
the inputs that historically diverged (round-4 queries.py review).
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import types as T

from exporter_spark.queries import QUERIES
from tests.test_queries_oracle import (
    _canon_duck_type,
    _canon_spark_type,
    _rowset,
)

_TS = dt.datetime(2024, 3, 1, 12, 34, 56, 789000)
_ZERO = dt.datetime(1, 1, 1, 0, 0, 0)  # Go time.Time{} → NULL cell

_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, _TS, 10, "a,b", 1.5, "p"),
    (2, _ZERO, 11, "\vlead", float("nan"), None),
    (3, None, 12, " x", float("inf"), '"q"'),
    (4, _TS, None, "　y", float("-inf"), "\\."),
    (5, _TS, 13, None, -0.0, "z"),
    (6, _TS, 14, "plain", 1e19, "n"),
    (7, _TS, 15, " sp", 1e-7, "m"),
    (8, dt.datetime(2024, 3, 1), 16, "\tt", 490.02, "nl\n"),
    (9, _TS, 17, "x", 2.0**60, "big"),
    (10, _TS, 18, "y", 9007199254740994.0, "int>2^53"),
    (11, _TS, 19, "z", 1e-4, " f"),
    (12, _TS, 20, "w", 1e15 + 2.0, "-1.5e-7 next"),
    (13, _TS, 21, "v", -1.5e-7, None),
    # 16-17-significant-digit values DuckDB's own fixed renderer gets
    # wrong — covered since the oracle moved to printf-shortest digits
    (14, _TS, 22, "a", 12345678901234.566, None),
    (15, _TS, 23, "b", 0.30000000000000004, "x"),
    (16, _TS, 24, "c", -940.4055611238593, "y"),
]

_LONG_A = " ".join(f"tok{i % 7}word{i}" for i in range(30))
_LONG_B = " ".join(f"tok{i % 7}word{i}" for i in range(29)) + " tail"
_DOCS = [
    # (doc_id, text, lang, source)  — n_chars derived from text
    (1, _LONG_A, None, "A"),
    (2, _LONG_A, None, "A"),  # NULL-lang near-dup pair
    (3, _LONG_B, "en", None),  # NULL source
    (4, _LONG_A + " extra tail words here", "en", None),
    (5, "short", "en", "A"),  # below shingle width
    (6, _LONG_B, "de", "A"),
    (7, " ".join(f"w{i}" for i in range(40)), "en", "A"),
    (8, " ".join(f"u{i}" for i in range(40)), "en", "B"),
    (9, " ".join(f"v{i}" for i in range(40)), "de", "B"),
    (10, _LONG_A, "en", "B"),
    (11, " ".join(f"q{i}" for i in range(25)), None, None),  # both NULL
    (12, _LONG_B, "en", "A"),
]


@pytest.fixture(scope="module")
def degen_dir(spark):
    out = tempfile.mkdtemp(prefix="exporter_spark_degen_")
    # rebase CORRECTED so the year-1 zero time survives the parquet
    # round trip identically in Spark and DuckDB (proleptic
    # Gregorian); restored on teardown — the session is shared and
    # other modules must keep the EXCEPTION default for ancient dates
    _REBASE = ("spark.sql.parquet.datetimeRebaseModeInWrite",
               "spark.sql.parquet.datetimeRebaseModeInRead")
    saved = {k: spark.conf.get(k, None) for k in _REBASE}
    for k in _REBASE:
        spark.conf.set(k, "CORRECTED")
    ev_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame(_EVENTS, ev_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")
    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    docs = [
        (i, txt, lang, src, len(txt) if i != 11 else None)
        for (i, txt, lang, src) in _DOCS
    ]
    spark.createDataFrame(docs, doc_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/documents.parquet")
    yield out
    shutil.rmtree(out, ignore_errors=True)
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def degen_con(degen_dir):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{degen_dir}/{t}.parquet/*.parquet'")
    return con


_QUERIES = [
    "tostring_events",
    "csv_lines_events",
    "xml_rows_events",
    "ngram_jaccard_pairs",
    "temperature_mixture_docs",
    "pretraining_mix_stats",
    "unigram_lm_scores",
    "minhash_near_dup_pairs",
    "minhash_dedup_survivors",
]


@pytest.mark.parametrize("name", _QUERIES)
def test_degenerate_parity(spark, degen_con, degen_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, degen_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = degen_con.sql(q.oracle)
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns), name
    stypes = {c: _canon_spark_type(t) for c, t in sdf.dtypes}
    dtypes_ = {c: _canon_duck_type(t) for c, t in zip(rel.columns, rel.types)}
    assert stypes == dtypes_, name
    assert len(srows) == len(drows), (
        f"{name}: {len(srows)} spark vs {len(drows)} oracle rows"
    )
    sset, dset = _rowset(sdf.columns, srows), _rowset(rel.columns, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_duck_go_float_fuzz_vs_python_reference():
    """The _duck_go_float oracle expression must agree with the
    Python/Go shortest-round-trip fixed rendering (_go_fixed_repr —
    itself hypothesis-pinned to the numpy kernel the Spark side runs)
    on every NORMAL double. Deterministic multi-regime fuzz: uniform,
    log-uniform across magnitudes, exact integers, and raw 64-bit
    patterns."""
    import math
    import random
    import struct

    import pandas as pd  # noqa: F401 — registered as a DuckDB view

    from exporter_spark.functions.tostring import _go_fixed_repr
    from exporter_spark.queries import _duck_go_float

    rnd = random.Random(0xF10A7)
    vals = [0.0, -0.0, 1e19, 2.0**60, 9007199254740994.0, 1e15 + 2.0,
            1e-7, -1.5e-7, 0.1, 1.7976931348623157e308, 2.2250738585072014e-308]
    for _ in range(4000):
        r = rnd.randrange(4)
        if r == 0:
            v = rnd.uniform(-1e3, 1e3)
        elif r == 1:
            v = rnd.uniform(-1, 1) * 10 ** rnd.randrange(-30, 30)
        elif r == 2:
            v = float(rnd.randrange(-(10**18), 10**18))
        else:
            v = struct.unpack("d", struct.pack("Q", rnd.getrandbits(64)))[0]
        # NaN/Inf covered by the crafted corpus; subnormals documented
        # out of domain
        if math.isnan(v) or math.isinf(v) or (v != 0 and abs(v) < 2.3e-308):
            continue
        vals.append(v)
    df = pd.DataFrame({"value": vals})
    con = duckdb.connect()
    got = con.sql(f"SELECT {_duck_go_float('value')} AS s FROM df").fetchall()
    bad = [
        (v, g[0], _go_fixed_repr(v))
        for v, g in zip(vals, got)
        if g[0] != _go_fixed_repr(v)
    ]
    assert not bad, f"{len(bad)} mismatches; first: {bad[:5]}"


def test_null_key_rows_survive(spark, degen_con, degen_dir):
    """The specific regressions the round-4 review closed: NULL-source
    buckets reach the temperature-mixture output, and NULL-lang docs
    can pair in ngram Jaccard blocking."""
    tm = QUERIES["temperature_mixture_docs"].fn(spark, degen_dir).collect()
    assert any(r["source"] is None for r in tm), "NULL-source bucket dropped"
    nj = QUERIES["ngram_jaccard_pairs"].fn(spark, degen_dir).collect()
    assert any(
        {r["a_id"], r["b_id"]} == {1, 2} for r in nj
    ), "NULL-lang near-dup pair not found"
