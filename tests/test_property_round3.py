"""Property-based checks: round-3 operators vs brute-force Python
reference implementations on random inputs. Each example pays a full
Spark job, so example counts are small — the point is shape coverage
(overlaps, adjacency, ties) the fixed corpus can't enumerate."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from exporter_spark.operators import dedup, retrieval

# documents over a tiny alphabet => dense duplicate structure
_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _brute_spans(texts: list[str], k: int, min_count: int):
    """Reference implementation: count k-grams corpus-wide, mark
    duplicated gram starts, merge overlapping/adjacent (gap <= k)."""
    grams: dict[tuple, int] = {}
    per_doc = []
    for text in texts:
        toks = text.split(" ")  # mirror split(trim(text), ' ') on clean input
        starts = []
        for i in range(len(toks) - k + 1):
            g = tuple(toks[i : i + k])
            grams[g] = grams.get(g, 0) + 1
            starts.append((i + 1, g))
        per_doc.append(starts)
    out = []
    for doc_id, starts in enumerate(per_doc):
        dup = [p for p, g in starts if grams[g] >= min_count]
        runs = []
        for p in dup:
            if runs and p <= runs[-1][1] + k:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        for s, e in runs:
            n = len([p for p in dup if s <= p <= e])
            out.append((doc_id, s, e + k - 1, e + k - s, n))
    return sorted(out)


@given(_corpus)
@settings(max_examples=10, deadline=None)
def test_exact_substring_spans_matches_bruteforce(spark, texts):
    k = 2
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_dup_grams"])
        for r in dedup.exact_substring_spans(df, k=k, min_count=2).collect()
    )
    assert got == _brute_spans(texts, k, 2)


def _brute_bm25(texts, terms, k1=1.2, b=0.75):
    docs = [t.lower().strip().split() if t.strip() else [] for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    if avgdl == 0.0:
        return []  # no tokens anywhere: nothing can match
    out = []
    for i, d in enumerate(docs):
        score = 0.0
        for t in terms:
            tf = float(d.count(t))
            dft = float(sum(1 for dd in docs if t in dd))
            idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1.0)
            score = score + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (len(d) / avgdl))
            )
        score = round(score, 6)
        if score > 0:
            out.append((i, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:10]


@given(_corpus)
@settings(max_examples=10, deadline=None)
def test_bm25_matches_bruteforce(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r["doc_id"], r["bm25"])
        for r in retrieval.bm25_topk(df, ["aa", "cc"], k=10).collect()
    ]
    expect = _brute_bm25(texts, ["aa", "cc"])
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (_, gs), (_, es) in zip(got, expect):
        assert abs(gs - es) <= 1e-6  # float assoc differs at most in the last rounded digit


@given(_corpus)
@settings(max_examples=6, deadline=None)
def test_strip_plus_spans_conserve_tokens(spark, texts):
    """Every original token is either in a duplicated span or in the
    cleaned text: |clean| + sum(span_tokens) == |original| per doc."""
    k = 2
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    spans = {}
    for r in dedup.exact_substring_spans(df, k=k, min_count=2).collect():
        spans[r["doc_id"]] = spans.get(r["doc_id"], 0) + r["span_tokens"]
    clean = {
        r["doc_id"]: len(r["clean_text"].split(" "))
        for r in dedup.strip_duplicate_spans(df, k=k, min_count=2).collect()
    }
    for doc_id, text in enumerate(texts):
        n = len(text.split(" "))
        assert clean.get(doc_id, 0) + spans.get(doc_id, 0) == n, (doc_id, text)


def _brute_bigram(texts):
    from collections import Counter
    from decimal import Decimal, ROUND_HALF_UP

    docs = {
        i: d
        for i, d in enumerate(
            [w for w in t.lower().strip().split() if w] for t in texts
        )
        if len(d) >= 2
    }
    big, left, vocab = Counter(), Counter(), set()
    per_doc = {}
    for i, d in docs.items():
        pairs = list(zip(d, d[1:]))
        vocab.update(d)
        big.update(pairs)
        left.update(w1 for w1, _ in pairs)
        per_doc[i] = pairs
    v = len(vocab)
    out = {}
    for i, pairs in per_doc.items():
        total = Decimal(0)
        for w1, w2 in pairs:
            p = math.log10((big[(w1, w2)] + 1.0) / (left[w1] + v))
            total += Decimal(repr(p)).quantize(Decimal("1E-9"), ROUND_HALF_UP)
        out[i] = (len(pairs), round(float(total) / len(pairs), 6))
    return out


@given(st.lists(st.lists(_word, min_size=0, max_size=10).map(" ".join), min_size=1, max_size=5))
@settings(max_examples=10, deadline=None)
def test_bigram_lm_matches_bruteforce(spark, texts):
    from exporter_spark.operators import text as text_ops

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm2_score"])
        for r in text_ops.bigram_lm_scores(df).collect()
    }
    expect = _brute_bigram(texts)
    assert set(got) == set(expect)
    for doc_id in got:
        assert got[doc_id][0] == expect[doc_id][0], doc_id
        assert abs(got[doc_id][1] - expect[doc_id][1]) <= 2e-6, doc_id


# ------------------------------------------------------ minhash family


def _brute_minhash(text: str, num_hashes: int, shingle_n: int):
    """Pure-Python reference of the universal-hash minhash family:
    distinct char n-grams -> md5-top-60-bit base hash mod 2^31-1 ->
    per-seed affine min. Independent of both engines' SQL."""
    import hashlib

    p = dedup._MERSENNE
    seen = set()
    shingles = []
    for i in range(max(0, len(text) - shingle_n + 1)):
        s = text[i : i + shingle_n]
        if s not in seen:
            seen.add(s)
            shingles.append(s)
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % p for s in shingles
    ]
    if not hs:
        return [None] * num_hashes
    return [
        min((a * h + b) % p for h in hs)
        for a, b in dedup._minhash_coeffs(num_hashes)
    ]


_utext = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)


@given(st.lists(_utext, min_size=1, max_size=5))
@settings(max_examples=10, deadline=None)
def test_minhash_signature_matches_bruteforce(spark, texts):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["sig"]
        for r in df.select(
            "doc_id", dedup.minhash_signature("text", 8, 4).alias("sig")
        ).collect()
    }
    for doc_id, text in enumerate(texts):
        assert got[doc_id] == _brute_minhash(text, 8, 4), (doc_id, text)
