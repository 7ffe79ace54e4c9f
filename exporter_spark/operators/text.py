"""Text-analysis operators for large-scale training-data pipelines.

Not present in the reference (SURVEY.md §2.4-2.5) — these are the
north-star extensions over the ``documents`` table. Every operator is
a pure column expression (whole-stage codegen, no Python in the hot
path) and is deliberately written with SQL-expressible semantics so
the DuckDB oracle can replay it exactly.

Scale notes: all are embarrassingly parallel map-side transforms — no
shuffle at any size; predicate pushdown and column pruning reach the
parquet scan untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword lang-ID
# heuristic. Chosen to be ASCII so Spark's Java regex and DuckDB's RE2
# behave identically in the oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "por", "una"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # romanized markers
}


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# GPT-2-flavored pre-tokenizer pattern, restricted to the
# Java-regex ∩ RE2 subset (the real GPT-2 pattern's trailing
# lookahead `\s+(?!\S)` is dropped; contractions, space-prefixed
# letter runs, digit runs, punctuation runs, residual whitespace).
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches. A closer
    proxy for LLM context cost than whitespace splitting (punctuation
    and digit runs tokenize separately). Pure regexp_extract_all —
    JVM-side, zero shuffle, and the same pattern literal replays in
    DuckDB for oracle parity."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))).cast(
        "long"
    )


def word_marker_hits(text: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whole whitespace-delimited token:
    split on whitespace, count equal tokens. Lambda-based so the
    DuckDB oracle replays it verbatim
    (len(list_filter(regexp_split_to_array(t,'\\s+'), x -> x = w)))."""
    toks = F.split(text, r"\s+")
    return F.size(F.filter(toks, lambda x: x == F.lit(word)))


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum(word_marker_hits(text, w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Marker-stopword language ID. Argmax score; ties break by
    language code ascending; all-zero scores → 'und'."""
    scores = lang_scores(text)
    best = None
    for lang in sorted(scores):  # ascending ⇒ earlier lang wins ties via >
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            best_s, best_l = best
            best = (
                F.when(s > best_s, s).otherwise(best_s),
                F.when(s > best_s, F.lit(lang)).otherwise(best_l),
            )
    score, lang = best
    return F.when(score <= 0, F.lit("und")).otherwise(lang)


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.!?,;:]", ""))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score from mechanical text statistics:
    starts from 1.0 and penalizes degenerate length, short tokens, and
    punctuation-free or punctuation-heavy text. Deterministic, purely
    arithmetic, oracle-replayable."""
    n = F.length(text)
    toks = token_count(text)
    avg_word = F.when(toks > 0, (n - (toks - 1)) / toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(n > 0, punct_count(text) / n).otherwise(F.lit(0.0))
    len_pen = F.when((n >= 100) & (n <= 10000), 0.0).otherwise(0.4)
    word_pen = F.when((avg_word >= 3) & (avg_word <= 12), 0.0).otherwise(0.3)
    punct_pen = F.when(punct_ratio <= 0.1, 0.0).otherwise(0.3)
    return F.round(F.greatest(F.lit(0.0), F.lit(1.0) - len_pen - word_pen - punct_pen), 6)


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


# PII patterns restricted to the Java-regex ∩ RE2 common subset
# (no lookaround, [0-9] not \d, ASCII \b) so the exact same literals
# run in Spark and the DuckDB oracle. Order matters: emails first
# (their local part can contain digits), then 4-octet IPs, then
# 3-3-4 phones (which an IP pattern must not half-consume).
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails / IPv4s / phone numbers with typed placeholders.
    Chained regexp_replace — pure JVM expressions, zero shuffle, safe
    in the 100 TB hot path."""
    out = text
    for pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def fingerprint(text: Column) -> Column:
    """128-bit content fingerprint: md5 hex of the normalized text.
    Identical in Spark and DuckDB (both lowercase-hex UTF-8 md5), so
    exact-dup detection on the fingerprint is oracle-checkable."""
    return F.md5(normalize_text(text))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    w: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS scheme): hash every k-gram of the normalized
    text, slide a w-hash window, select each window's minimum
    (rightmost on ties), dedupe. Guarantees: any substring match of
    length ≥ k+w−1 between two documents shares at least one selected
    fingerprint, and the density of selected hashes is ~2/(w+1).

    Output: (id, pos, fp) — 1-based k-gram position and 32-bit hex
    fingerprint. Returns nothing for docs shorter than k after
    normalization; docs with fewer than w k-grams contribute their
    single global minimum.

    Scale shape: the k-gram explosion is O(doc length) rows but they
    never leave their doc's partition — ONE exchange on ``id_col``
    feeds the sliding-window min, and the distinct collapses map-side
    before its (tiny, fingerprint-keyed) shuffle. All primitives are
    engine-portable (md5 / substr / lpad / framed window min), so the
    operator is oracle-comparable; the rightmost-tie-break rides a
    single sortable key: hash_hex || zero-padded (9999999 − pos).
    """
    n = F.char_length(F.col("__t__")) - k + 1
    src = df.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__t__")
    ).filter(F.char_length(F.col("__t__")) >= k)
    # single-file inputs arrive as ONE partition; hash-spread on the id
    # BEFORE the O(len) k-gram explosion so it runs cluster-wide — and
    # since the spread partitioning matches the window's partitionBy,
    # the window adds no second exchange.
    p = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < p:
        src = src.repartition(p, id_col)
    grams = (
        src
        .select(
            id_col,
            n.alias("__n__"),
            F.posexplode(F.expr(f"sequence(1, char_length(__t__) - {k} + 1)")).alias(
                "__x__", "__i__"
            ),
            F.col("__t__"),
        )
        .select(
            id_col,
            "__n__",
            "__i__",
            F.concat(
                F.substring(
                    F.md5(F.expr(f"substring(__t__, __i__, {k})")), 1, 8
                ),
                F.lpad((F.lit(9999999) - F.col("__i__")).cast("string"), 7, "0"),
            ).alias("__wk__"),
        )
    )
    win = Window.partitionBy(id_col).orderBy("__i__").rowsBetween(0, w - 1)
    selected = (
        grams.withColumn("__mn__", F.min("__wk__").over(win))
        .filter(F.col("__i__") <= F.greatest(F.lit(1), F.col("__n__") - (w - 1)))
        .select(
            id_col,
            (F.lit(9999999) - F.substring("__mn__", 9, 7).cast("long")).alias("pos"),
            F.substring("__mn__", 1, 8).alias("fp"),
        )
        .distinct()
    )
    return selected


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_n: int = 5,
) -> DataFrame:
    """Per-document TF-IDF head terms: smooth idf
    ``ln((N+1)/(df+1)) + 1``, score = tf · idf rounded to 6 places
    (absorbing libm ulp differences so the ranking is
    engine-portable), total-ordered top-``top_n`` per document.

    Scale shape: token explosion collapses map-side into (doc, token)
    counts before its one shuffle; document frequency re-aggregates
    those counts (never the raw tokens); the corpus size N broadcasts;
    the final per-doc window gets map-side top-n (WindowGroupLimit).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
        ).alias("token"),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = df.agg(F.count("*").alias("__nd__"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .select(
            id_col,
            "token",
            F.round(
                F.col("tf")
                * (F.log((F.col("__nd__") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "token", "score", "rank")
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop profile: tokens, language guess, quality, fingerprint."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        lang_id(t).alias("lang_guess"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )
