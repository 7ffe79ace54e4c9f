"""Distributed BPE merge learning (operators/bpe.py, round 16).

The learned merge table must equal the textbook sequential algorithm
(Sennrich et al.) exactly: overlapping pair counts for selection,
left-to-right non-overlapping rewrite, ties broken (count desc, lhs,
rhs). The Spark loop is JVM expressions end-to-end; the driver sees
one row per merge.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from exporter_spark.operators import bpe


def _reference_bpe(texts, n_merges):
    """Plain-Python textbook BPE over [a-z]+ words (independent of
    the Spark implementation's string-replace trick)."""
    words = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            words[tuple(w)] += 1
    out = []
    for rank in range(1, n_merges + 1):
        counts = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (lhs, rhs), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        out.append((rank, lhs, rhs, cnt))
        merged = Counter()
        for syms, f in words.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (lhs, rhs):
                    new.append(lhs + rhs)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            merged[tuple(new)] += f
        words = merged
    return out


TEXTS = [
    "the cat sat on the mat",
    "the thin cat then sat",
    "low lower lowest newer newest",
    "banana bandana ananas",  # overlap-heavy: 'an an an' chains
    "aaa aaaa aaaaa",  # the non-overlapping-rewrite edge
]


def _learned(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe.learn_bpe(df, "text", n_merges=n)
        .orderBy("merge_rank")
        .collect()
    ]


@pytest.mark.slow
def test_matches_textbook_bpe(spark):
    assert _learned(spark, TEXTS, 12) == _reference_bpe(TEXTS, 12)


def test_nonoverlapping_rewrite_rule(spark):
    """'aaa' after merging (a, a) is ['aa', 'a'] — left-to-right
    non-overlapping, so the SECOND merge learned from an all-a corpus
    is (aa, a), never (a, aa) reconsumed from overlap."""
    texts = ["aaa aaa aaa"]
    got = _learned(spark, texts, 2)
    assert got == _reference_bpe(texts, 2)
    assert got[0][1:3] == ("a", "a")


def test_early_stop_when_alphabet_merges_out(spark):
    """Fewer learnable pairs than n_merges: the table just ends (no
    padding rows, no error)."""
    got = _learned(spark, ["ab ab"], 10)
    assert got == _reference_bpe(["ab ab"], 10)
    assert len(got) == 1  # 'a b' -> 'ab' and nothing left to pair


def test_checkpoint_path_identical(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    plain = bpe.learn_bpe(df, "text", n_merges=6).collect()
    ckpt = bpe.learn_bpe(df, "text", n_merges=6, checkpoint_every=2).collect()
    assert plain == ckpt


def test_min_freq_prunes_rare_words(spark):
    df = spark.createDataFrame(
        [("zz zz zz qq",)], "text string"
    )
    got = [
        (r["lhs"], r["rhs"])
        for r in bpe.learn_bpe(df, "text", n_merges=1, min_freq=2).collect()
    ]
    assert got == [("z", "z")]  # 'qq' (freq 1) never contributes a pair


def test_apply_bpe_roundtrip(spark):
    """Encoding with the learned table reproduces the reference
    tokenizer's segmentation, and concatenating tokens per word
    restores the word."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe.learn_bpe(df, "text", n_merges=8)
    enc = bpe.apply_bpe(df, merges).select("text", "bpe_tokens").collect()
    table = [(r["lhs"], r["rhs"]) for r in merges.orderBy("merge_rank").collect()]
    for row in enc:
        words = re.findall("[a-z]+", row["text"].lower())
        expect = []
        for w in words:
            syms = list(w)
            for lhs, rhs in table:
                new, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (lhs, rhs):
                        new.append(lhs + rhs)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                syms = new
            expect.extend(syms)
        assert row["bpe_tokens"] == expect
        assert "".join(row["bpe_tokens"]) == "".join(words)


def test_apply_bpe_dict_parity(spark):
    """The dictionary-join face (round 17, the 32k-merge scale path)
    must emit bpe_tokens IDENTICAL to the chain face on every row —
    including NULL text (NULL tokens), token-free text (empty array)
    and repeated words — with and without an explicit id_col."""
    rows = [(i, t) for i, t in enumerate(TEXTS)] + [
        (90, None),
        (91, "123 !!!"),  # no [a-z] words -> []
        (92, ""),
        (93, "the the the cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.learn_bpe(df, "text", n_merges=8)
    chain = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(df, merges).collect()
    }
    for id_col in ("doc_id", None):
        got = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe.apply_bpe_dict(
                df, merges, "text", id_col=id_col
            ).collect()
        }
        assert got == chain, f"id_col={id_col}"
    # schema parity too: same columns in the same order
    assert (
        bpe.apply_bpe_dict(df, merges, "text", id_col="doc_id").columns
        == bpe.apply_bpe(df, merges).columns
    )


def test_bpe_encode_table_encodes_each_word_once(spark):
    """The dictionary half: distinct words in, one token array out
    per word, matching the chain face's per-word segmentation."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe.learn_bpe(df, "text", n_merges=6)
    words = sorted({w for t in TEXTS for w in re.findall("[a-z]+", t)})
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    dic = {r["w"]: r["bpe_toks"] for r in bpe.bpe_encode_table(wdf, merges).collect()}
    assert set(dic) == set(words)
    one = spark.createDataFrame([(w,) for w in words], "text string")
    chain = {
        r["text"]: r["bpe_tokens"]
        for r in bpe.apply_bpe(one, merges).collect()
    }
    assert dic == chain
    for w, toks in dic.items():
        assert "".join(toks) == w


def test_n_merges_validation(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe.learn_bpe(df, "text", n_merges=0)


def test_checkpoint_path_leaves_no_cached_tables(spark):
    """Round-16 review finding: the eager localCheckpoint used to
    REPLACE the cached merge table without unpersisting it, pinning
    one full word-table copy per checkpoint interval (~320 copies at
    production sizing). After learn_bpe returns, executor storage must
    hold nothing it added."""
    sc = spark.sparkContext
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    before = len(sc._jsc.sc().getRDDStorageInfo())
    bpe.learn_bpe(df, "text", n_merges=6, checkpoint_every=1).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after <= before, (before, after)


# ---------------------------------------------------------------------
# The encoding trick, property-tested WITHOUT Spark: ANSI-style
# str.replace over the double-separator rep must equal the symbol-
# level greedy left-to-right merge scan for arbitrary symbol
# sequences and merge pairs — including multi-char symbols that are
# prefixes/suffixes of each other, the class where single-separator
# encodings corrupt silently.
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_SYMS = ["a", "b", "aa", "ab", "ba", "aab", "bba"]


def _encode(seq):
    return " " + "  ".join(seq) + " "


def _decode(rep):
    return [s for s in rep.split(" ") if s]


def _greedy_merge(seq, lhs, rhs):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and (seq[i], seq[i + 1]) == (lhs, rhs):
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.sampled_from(_SYMS), min_size=1, max_size=12),
    st.sampled_from(_SYMS),
    st.sampled_from(_SYMS),
)
def test_replace_encoding_equals_greedy_merge(seq, lhs, rhs):
    """Python str.replace shares ANSI replace's left-to-right
    non-overlapping semantics, so this property holds for Spark's
    F.replace and DuckDB's replace identically."""
    rep = _encode(seq).replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} ")
    assert _decode(rep) == _greedy_merge(seq, lhs, rhs)


def test_degenerate_documents_match_oracle(spark, tmp_path):
    """NULL text, empty text, and no-alpha text rows must behave
    identically in both engines (no rows contributed, no crash) —
    and a corpus made ONLY of those yields an empty merge table."""
    import duckdb

    from exporter_spark.queries import QUERIES

    rows = [
        (0, None, "xx", "s", 0),
        (1, "", "xx", "s", 0),
        (2, "123 456 !!!", "xx", "s", 11),
        (3, "ab ab ab", "xx", "s", 8),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    q = QUERIES["bpe_merges_learned"]
    got = q.fn(spark, str(tmp_path)).collect()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    want = con.sql(q.oracle).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got[0]["lhs"] == "a" and got[0]["rhs"] == "b"  # only 'ab' pairs
    # all-degenerate corpus: empty table, both engines
    df2 = spark.createDataFrame(rows[:3], df.schema)
    d2 = str(tmp_path / "deg")
    df2.coalesce(1).write.mode("overwrite").parquet(d2 + "/documents.parquet")
    got2 = q.fn(spark, d2).collect()
    con2 = duckdb.connect()
    con2.sql(f"CREATE VIEW documents AS SELECT * FROM '{d2}/documents.parquet/*.parquet'")
    want2 = con2.sql(q.oracle).fetchall()
    assert got2 == [] and want2 == []


def test_batch_k1_is_strict_bpe(spark):
    """batch_k=1 must BE the textbook path bit-for-bit (it is the
    oracle-gated default)."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    a = bpe.learn_bpe(df, "text", n_merges=8).collect()
    b = bpe.learn_bpe(df, "text", n_merges=8, batch_k=1).collect()
    assert a == b and a == _reference_bpe(TEXTS, 8) == [tuple(r) for r in a]


def test_batched_rounds_are_symbol_disjoint_and_valid(spark):
    """batch_k>1: within each learned table, verify (a) the greedy
    selection invariant via select_disjoint on synthetic candidates,
    (b) the learned table still encodes losslessly (apply + join
    restores every word), and (c) counts of selected pairs equal the
    strict path's counts whenever the same pair appears at the same
    state (rank-1 of round one is always the strict top pair)."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    batched = bpe.learn_bpe(df, "text", n_merges=8, batch_k=4)
    table = batched.orderBy("merge_rank").collect()
    assert len(table) == 8
    strict_top = bpe.learn_bpe(df, "text", n_merges=1).collect()[0]
    assert tuple(table[0]) == tuple(strict_top)
    # lossless encoding with the batched table
    enc = bpe.apply_bpe(df, batched).collect()
    import re as _re

    for row in enc:
        assert "".join(row["bpe_tokens"]) == "".join(
            _re.findall("[a-z]+", row["text"].lower())
        )


def test_select_disjoint_greedy_invariant():
    rows = [
        {"lhs": "a", "rhs": "b", "cnt": 9},
        {"lhs": "b", "rhs": "c", "cnt": 8},  # conflicts via 'b'
        {"lhs": "c", "rhs": "d", "cnt": 7},
        {"lhs": "a", "rhs": "d", "cnt": 6},  # conflicts via 'a' and 'd'
        {"lhs": "e", "rhs": "f", "cnt": 5},
    ]
    picked = bpe.select_disjoint(rows, 3)
    assert [(r["lhs"], r["rhs"]) for r in picked] == [
        ("a", "b"),
        ("c", "d"),
        ("e", "f"),
    ]
    assert bpe.select_disjoint(rows, 1) == rows[:1]
