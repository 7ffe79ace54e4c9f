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

from exporter_spark.operators.partitioning import materialize, spread

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
    family: str = "md5",
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
    single sortable key: hash_hex || zero-padded (2^31−1 − pos) —
    10 digits, so any document Spark can hold (strings cap at 2 GB)
    packs without underflow.

    ``family``: "md5" (default) is the DuckDB-replayable oracle hash;
    "xxhash64" is the production family (native codegen, ~1.2× at 10×
    corpus scale — the window sort dominates winnow, so the gain is
    smaller than minhash's). Fingerprint VALUES differ by family
    (they are opaque 32-bit hex either way); the winnowing guarantee,
    density, and selection mechanics are family-independent
    (property-tested for both).
    """
    n = F.char_length(F.col("__t__")) - k + 1
    src = df.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__t__")
    )
    # single-file inputs arrive as ONE partition; hash-spread on the id
    # BEFORE the O(len) k-gram explosion so it runs cluster-wide — and
    # since the spread partitioning matches the window's partitionBy,
    # the window adds no second exchange.
    src = spread(src, id_col)
    # too-short docs are cut by an EMPTY posexplode argument rather
    # than a char_length() Filter on the computed column — Catalyst
    # would push such a filter through the projection and evaluate
    # the normalize_text regexp chain twice per row (the minhash
    # shingle-guard double-eval trap).
    if family == "xxhash64":
        # lower 32 bits as fixed-width hex: same opaque-fingerprint
        # shape, no hex-string md5 per gram
        fp_expr = F.expr(
            f"lpad(hex(pmod(xxhash64(substring(__t__, __i__, {k})),"
            f" 4294967296)), 8, '0')"
        )
    elif family == "md5":
        fp_expr = F.substring(
            F.md5(F.expr(f"substring(__t__, __i__, {k})")), 1, 8
        )
    else:
        raise ValueError(f"unknown winnow family: {family!r}")
    grams = (
        src
        .select(
            id_col,
            n.alias("__n__"),
            F.posexplode(
                F.expr(
                    f"if(char_length(__t__) >= {k},"
                    f" sequence(1, char_length(__t__) - {k} + 1), array())"
                )
            ).alias("__x__", "__i__"),
            F.col("__t__"),
        )
        .select(
            id_col,
            "__n__",
            "__i__",
            F.concat(
                fp_expr,
                F.lpad((F.lit(2147483647) - F.col("__i__")).cast("string"), 10, "0"),
            ).alias("__wk__"),
        )
    )
    win = Window.partitionBy(id_col).orderBy("__i__").rowsBetween(0, w - 1)
    selected = (
        grams.withColumn("__mn__", F.min("__wk__").over(win))
        .filter(F.col("__i__") <= F.greatest(F.lit(1), F.col("__n__") - (w - 1)))
        .select(
            id_col,
            (F.lit(2147483647) - F.substring("__mn__", 9, 10).cast("long")).alias("pos"),
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
    # materialized: the document-frequency branch and the score join
    # would otherwise each re-scan and re-tokenize the corpus
    tf = materialize(toks.groupBy(id_col, "token").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    # N stays on the raw frame: docs with no tokens count toward N but
    # never reach tf, and this branch column-prunes to a bare count
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


# ------------------------------------------------------------------
# Repetition / Gopher-style quality signals
# ------------------------------------------------------------------
# The standard LLM-corpus quality rules from the Gopher paper
# (Rae et al. 2021, "Scaling Language Models", appendix A1.1):
# word-count bounds, mean word length, symbol-to-word ratio,
# alphabetic-word fraction, bullet/ellipsis line fractions, and
# repetition fractions (duplicate lines, top n-gram coverage). All
# pure column expressions — zero shuffle, whole-stage codegen — and
# every primitive (split/filter/transform/distinct/md5/regexp) has an
# exact DuckDB twin, so the signals are oracle-replayable. One
# documented deviation: n-gram coverage is the fraction of n-gram
# OCCURRENCES that are the modal n-gram (Gopher uses fraction of
# characters); count-fraction needs no per-gram char bookkeeping and
# filters the same degenerate documents.


def word_list(text: Column) -> Column:
    """Non-empty whitespace tokens (DuckDB: list_filter(
    regexp_split_to_array(trim(t), '\\s+'), x -> x != ''))."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != F.lit(""))


def nonblank_lines(text: Column) -> Column:
    """Trimmed, non-blank lines."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )


def mean_word_len(text: Column) -> Column:
    """Average token length in characters; NULL for wordless text
    (try_divide ⇒ NULL, same as the oracle's divide-by-zero)."""
    toks = word_list(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.round(F.try_divide(total, F.size(toks)), 6)


def alpha_word_frac(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter."""
    toks = word_list(text)
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    return F.round(F.try_divide(alpha, F.size(toks)), 6)


def symbol_word_ratio(text: Column) -> Column:
    """(# of '#' chars + # of '...' runs) per word — Gopher's symbol
    screen. Counted with replace-arithmetic so the exact computation
    replays in DuckDB."""
    hashes = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipses = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    return F.round(
        F.try_divide(hashes + ellipses.cast("long"), F.size(word_list(text))), 6
    )


def dup_word_frac(text: Column) -> Column:
    """1 − distinct/total over tokens: crude intra-document word
    repetition (the line-level analog is degenerate on single-line
    documents)."""
    toks = word_list(text)
    return F.round(
        F.lit(1.0) - F.try_divide(F.size(F.array_distinct(toks)), F.size(toks)), 6
    )


def dup_line_frac(text: Column) -> Column:
    """1 − distinct/total over non-blank lines (Gopher's duplicate
    line fraction)."""
    lines = nonblank_lines(text)
    return F.round(
        F.lit(1.0) - F.try_divide(F.size(F.array_distinct(lines)), F.size(lines)), 6
    )


def bullet_line_frac(text: Column) -> Column:
    """Fraction of non-blank lines that start with a bullet marker."""
    lines = nonblank_lines(text)
    bullets = F.size(
        F.filter(lines, lambda x: x.substr(1, 2).isin("- ", "* ", "• "))
    )
    return F.round(F.try_divide(bullets, F.size(lines)), 6)


def ellipsis_line_frac(text: Column) -> Column:
    """Fraction of non-blank lines ending in '...' or '…'."""
    lines = nonblank_lines(text)
    ell = F.size(
        F.filter(
            lines, lambda x: x.endswith("...") | x.endswith("…")
        )
    )
    return F.round(F.try_divide(ell, F.size(lines)), 6)


def _modal_run_count(sorted_arr: Column) -> Column:
    """Count of the most frequent element of an ALREADY SORTED array,
    via a single left fold over adjacent runs (0 for empty input).

    Why a fold and not the obvious nested
    ``transform(a, g -> size(filter(a, h -> h = g)))``: Catalyst
    pastes the array-building subtree at every reference site,
    including INSIDE the outer lambda — the array is then rebuilt
    once per element, O(g²) array constructions per row (measured
    486s for 5k docs at sf0.1; the fold form is ~1s)."""
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, acc0, merge, lambda a: a["best"])


def _word_ngrams(text: Column, n: int) -> Column:
    """Word n-gram occurrence list (empty when fewer than n tokens)."""
    toks = word_list(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.slice(toks, 1, 0))


def top_ngram_frac(text: Column, n: int) -> Column:
    """Fraction of word n-gram occurrences taken by the modal n-gram.
    One O(g log g) sort + O(g) fold per document — embarrassingly
    parallel map, never cross-row. NULL when the document has fewer
    than n tokens (0/0 try_divide), matching the oracle's
    list_max-over-empty NULL."""
    grams = _word_ngrams(text, n)
    return F.round(
        F.try_divide(_modal_run_count(F.array_sort(grams)), F.size(grams)), 6
    )


def dup_ngram_frac(text: Column, n: int) -> Column:
    """Fraction of word n-gram occurrences that are repeats
    (1 − distinct/total) — the Gopher duplicate-n-gram screen,
    count-fraction variant. NULL when the doc has fewer than n
    tokens."""
    grams = _word_ngrams(text, n)
    return F.round(
        F.lit(1.0) - F.try_divide(F.size(F.array_distinct(grams)), F.size(grams)),
        6,
    )


#: Gopher appendix-A1 defaults (count-fraction variant for n-grams).
GOPHER_THRESHOLDS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_frac": 0.8,
    "max_dup_line_frac": 0.3,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "max_top_2gram_frac": 0.2,
    "max_top_3gram_frac": 0.18,
    # duplicate n-gram screens (Gopher A1: 0.15 → 0.10 for n=5..10)
    "max_dup_5gram_frac": 0.15,
    "max_dup_6gram_frac": 0.14,
    "max_dup_7gram_frac": 0.13,
    "max_dup_8gram_frac": 0.12,
    "max_dup_9gram_frac": 0.11,
    "max_dup_10gram_frac": 0.10,
}

#: duplicate-n-gram window sizes screened by gopher_keep
DUP_NGRAM_NS = (5, 6, 7, 8, 9, 10)


def _gopher_count_udf():
    """Arrow-vectorized counter: ONE pass per document producing the
    exact integer counts behind every signal. Divisions and round(6)
    stay in Catalyst expressions, so the kernel cannot introduce float
    drift vs the expr path / DuckDB oracle — integers either match or
    the equivalence test fails loudly.

    Tokenization replicates the expr path's Java-regex semantics
    exactly: trim is SPACE-only (Spark/DuckDB trim), the whitespace
    class is Java's \\s ([ \\t\\n\\x0b\\f\\r] — NOT Python's
    unicode-aware \\s, which would also split on NBSP).
    Imports live inside the UDF so it pickles by value (the driver
    harness injects no PYTHONPATH into executor Python workers)."""
    from pyspark.sql.functions import pandas_udf

    schema = (
        "struct<wc:long,swl:long,alpha:long,sym:long,dw:long,nl:long,"
        "dl:long,bul:long,ell:long,t2:long,n2:long,t3:long,n3:long,"
        + ",".join(f"d{n}:long,g{n}:long" for n in DUP_NGRAM_NS)
        + ">"
    )
    dup_ns = DUP_NGRAM_NS

    @pandas_udf(schema)
    def counts(s):
        import re
        from collections import Counter

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        alpha_re = re.compile(r"[A-Za-z]")
        keys = (
            "wc", "swl", "alpha", "sym", "dw", "nl", "dl", "bul", "ell",
            "t2", "n2", "t3", "n3",
        ) + tuple(f"{p}{n}" for n in dup_ns for p in ("d", "g"))
        out = {k: [] for k in keys}
        for t in s:
            if t is None:
                for k in keys:
                    out[k].append(None)
                continue
            toks = [x for x in ws.split(t.strip(" ")) if x]
            lines = [x for x in (ln.strip(" ") for ln in t.split("\n")) if x]
            g2 = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
            g3 = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
            out["wc"].append(len(toks))
            out["swl"].append(sum(len(x) for x in toks))
            out["alpha"].append(sum(1 for x in toks if alpha_re.search(x)))
            # str.count is non-overlapping, identical to the expr
            # path's replace-arithmetic
            out["sym"].append(t.count("#") + t.count("..."))
            out["dw"].append(len(set(toks)))
            out["nl"].append(len(lines))
            out["dl"].append(len(set(lines)))
            out["bul"].append(
                sum(1 for x in lines if x[:2] in ("- ", "* ", "• "))
            )
            out["ell"].append(
                sum(1 for x in lines if x.endswith("...") or x.endswith("…"))
            )
            out["t2"].append(max(Counter(g2).values()) if g2 else 0)
            out["n2"].append(len(g2))
            out["t3"].append(max(Counter(g3).values()) if g3 else 0)
            out["n3"].append(len(g3))
            for n in dup_ns:
                gn = [
                    " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
                ] if len(toks) >= n else []
                out[f"d{n}"].append(len(set(gn)))
                out[f"g{n}"].append(len(gn))
        return pd.DataFrame(out)

    return counts


def gopher_signals(
    df: DataFrame, text_col: str = "text", kernel: str = "pandas"
) -> DataFrame:
    """All quality signals as columns appended to ``df``.

    Kernels (all bit-identical, equivalence-tested — each emits only
    exact integer counts and every division/round happens in the same
    Catalyst projection):

    * ``"java"`` — compiled JVM ``UDF1`` (no Python workers, no Arrow
      transfer): 2.4-3.4× the pandas kernel end-to-end, and the
      100 TB path now that round-5 attribution showed Python compute
      at 75% of operator CPU at 30× scale (SCALE.md). Needs a JDK on
      first use (compiled once, content-addressed jar).
    * ``"auto"`` — ``"java"`` when a JDK is present and the kernel
      builds, silently ``"pandas"`` otherwise. What the registry
      queries use.
    * ``"pandas"`` (default) — one Arrow-vectorized pass (~20× the
      interpreted-HOF expr path, which re-tokenizes per signal).
    * ``"expr"`` — the pure-Catalyst form whose SQL fragments the
      DuckDB oracle mirrors.
    """
    t = F.col(text_col)
    if kernel == "auto":
        try:
            from exporter_spark.javakernel import ensure_gopher_java

            ensure_gopher_java(df.sparkSession)
            kernel = "java"
        except Exception:  # noqa: BLE001 — no JDK / build failure
            kernel = "pandas"
    if kernel == "expr":
        return df.select(
            "*",
            F.size(word_list(t)).cast("long").alias("word_cnt"),
            mean_word_len(t).alias("mean_word_len"),
            alpha_word_frac(t).alias("alpha_word_frac"),
            symbol_word_ratio(t).alias("symbol_word_ratio"),
            dup_word_frac(t).alias("dup_word_frac"),
            dup_line_frac(t).alias("dup_line_frac"),
            bullet_line_frac(t).alias("bullet_line_frac"),
            ellipsis_line_frac(t).alias("ellipsis_line_frac"),
            top_ngram_frac(t, 2).alias("top_2gram_frac"),
            top_ngram_frac(t, 3).alias("top_3gram_frac"),
            *[
                dup_ngram_frac(t, n).alias(f"dup_{n}gram_frac")
                for n in DUP_NGRAM_NS
            ],
        )
    if kernel == "java":
        # JVM kernel: same integer counts, no Python workers, no
        # Arrow transfer — the cluster-scale path (SCALE.md round-5
        # attribution: Python is 75% of operator CPU at 30×).
        # Compiled on first use, attached via ADD JAR; falls back
        # loudly if no JDK is present.
        from exporter_spark.javakernel import ensure_gopher_java

        fn = ensure_gopher_java(df.sparkSession)
        df = spread(df)
        s = df.select("*", F.call_udf(fn, t).alias("__c__"))
    elif kernel == "pandas":
        # single-file inputs arrive as ONE partition; spread before
        # the Arrow batches so the scan parallelizes (no-op on
        # already-partitioned input — the 100 TB case, and on
        # streaming frames).
        df = spread(df)
        s = df.select("*", _gopher_count_udf()(t).alias("__c__"))
    else:
        raise ValueError(f"unknown kernel: {kernel!r}")
    C = F.col("__c__")
    return s.select(
        *df.columns,
        C["wc"].alias("word_cnt"),
        F.round(F.try_divide(C["swl"], C["wc"]), 6).alias("mean_word_len"),
        F.round(F.try_divide(C["alpha"], C["wc"]), 6).alias("alpha_word_frac"),
        F.round(F.try_divide(C["sym"], C["wc"]), 6).alias("symbol_word_ratio"),
        F.round(F.lit(1.0) - F.try_divide(C["dw"], C["wc"]), 6).alias(
            "dup_word_frac"
        ),
        F.round(F.lit(1.0) - F.try_divide(C["dl"], C["nl"]), 6).alias(
            "dup_line_frac"
        ),
        F.round(F.try_divide(C["bul"], C["nl"]), 6).alias("bullet_line_frac"),
        F.round(F.try_divide(C["ell"], C["nl"]), 6).alias("ellipsis_line_frac"),
        F.round(F.try_divide(C["t2"], C["n2"]), 6).alias("top_2gram_frac"),
        F.round(F.try_divide(C["t3"], C["n3"]), 6).alias("top_3gram_frac"),
        *[
            F.round(
                F.lit(1.0) - F.try_divide(C[f"d{n}"], C[f"g{n}"]), 6
            ).alias(f"dup_{n}gram_frac")
            for n in DUP_NGRAM_NS
        ],
    )


def gopher_keep(thresholds: dict[str, float] | None = None) -> Column:
    """Boolean keep-predicate over the gopher_signals columns. NULL
    signals (wordless documents) coalesce to a reject."""
    th = dict(GOPHER_THRESHOLDS)
    if thresholds:
        th.update(thresholds)
    c = (
        F.col("word_cnt").between(th["min_words"], th["max_words"])
        & F.col("mean_word_len").between(
            th["min_mean_word_len"], th["max_mean_word_len"]
        )
        & (F.col("symbol_word_ratio") <= th["max_symbol_word_ratio"])
        & (F.col("alpha_word_frac") >= th["min_alpha_word_frac"])
        & (F.col("dup_line_frac") <= th["max_dup_line_frac"])
        & (F.col("bullet_line_frac") <= th["max_bullet_line_frac"])
        & (F.col("ellipsis_line_frac") <= th["max_ellipsis_line_frac"])
        & (F.col("top_2gram_frac") <= th["max_top_2gram_frac"])
        & (F.col("top_3gram_frac") <= th["max_top_3gram_frac"])
    )
    for n in DUP_NGRAM_NS:
        # docs shorter than n tokens have no n-grams (NULL frac);
        # they can't be repetitive at that window — treat as passing
        c = c & F.coalesce(
            F.col(f"dup_{n}gram_frac") <= th[f"max_dup_{n}gram_frac"],
            F.col("word_cnt") < n,
        )
    return F.coalesce(c, F.lit(False))


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
    kernel: str = "pandas",
) -> DataFrame:
    """Documents passing the Gopher quality rules (original columns
    only — signals are internal to the predicate)."""
    sig = gopher_signals(df, text_col, kernel=kernel)
    return sig.filter(gopher_keep(thresholds)).select(*df.columns)


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Self-trained unigram language-model score per document — the
    CCNet-style quality signal (Wenzek et al. 2020, arXiv:1911.00359):
    fit P(w) = count(w)/total on the corpus itself, then score each
    document by its mean per-token log10 probability (higher = built
    from more typical tokens; a cheap perplexity proxy for filtering).
    Returns (id_col, n_tokens, lm_score).

    Determinism across engines: per-token log10(count/total) terms are
    staged to DECIMAL(18,9) before the per-doc SUM (exact, order-free
    addition), and the final mean is rounded to 6 dp — absorbing the
    <=2-ulp libm spread of log10 itself. Counts and totals are integer
    hence identical everywhere.

    Scale shape: explode -> count-by-token (map-side partial agg) ->
    token-keyed shuffle join back -> re-aggregate by doc. Two shuffles
    total, both on high-cardinality keys; AQE handles hot-token skew
    (stopwords) by splitting oversized reduce partitions. Pass
    ``broadcast_vocab=True`` when the vocabulary fits on executors
    (e.g. a capped vocab) to drop the token shuffle entirely."""
    trimmed = F.trim(F.col(text_col))
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(trimmed, r"\s+")).alias("__tok__"),
    ).filter(F.length("__tok__") > 0)
    # collapse to (doc, token) occurrence counts before anything
    # shuffles: within-doc repetition (huge in natural text — stopwords)
    # then costs one count row instead of one row per occurrence, on
    # the vocab join AND on the per-doc aggregate. Materialized: the
    # vocabulary branch and the score join would otherwise each
    # re-scan and re-tokenize the corpus (no cross-branch scan reuse
    # in Spark).
    dt = materialize(toks.groupBy(id_col, "__tok__").agg(F.count("*").alias("__k__")))
    vocab = dt.groupBy("__tok__").agg(F.sum("__k__").alias("__cnt__"))
    total = vocab.agg(F.sum("__cnt__").alias("__total__"))
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    # decimal-staged term × integer occurrence count is exact, so the
    # sum is bit-identical to staging each occurrence separately
    term = F.log10(F.col("__cnt__") / F.col("__total__")).cast(
        "decimal(18,9)"
    ) * F.col("__k__").cast("decimal(18,0)")
    return (
        dt.join(v, "__tok__")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("__k__").alias("n_tokens"),
            F.round(
                F.sum(term).cast("double") / F.sum("__k__"), 6
            ).alias("lm_score"),
        )
    )


def lm_quality_buckets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-language quality tiers (Wenzek et al. 2020,
    arXiv:1911.00359 §4.3): rank documents within each language by
    the self-trained unigram-LM score and split into equal tiers
    (head / middle / tail for the default 3). Returns one row per
    (lang, tier): (lang, tier, tier_name, n_docs, avg_lm_score).

    Determinism: the rank order is total (lm_score desc, id asc), so
    ntile is deterministic; avg is decimal-staged then rounded.

    Scale shape: the window partitions by language — each language
    sorts independently (CCNet's own granularity). At 100 TB a single
    language is still large; the production variant computes tier
    cutoffs from approx percentiles (percentile_approx over lm_score)
    and buckets by comparison, avoiding any within-language total
    sort. ntile is kept here because its semantics (equal-count
    tiers) are exactly replayable in the oracle."""
    scores = unigram_lm_scores(df, id_col, text_col)
    withlang = scores.join(df.select(id_col, lang_col), id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.col("lm_score").desc(), F.col(id_col).asc()
    )
    tier = F.ntile(n_buckets).over(w)
    name = F.lit(None).cast("string")
    if n_buckets == 3:
        name = (
            F.when(tier == 1, "head").when(tier == 2, "middle").otherwise("tail")
        )
    return (
        withlang.withColumn("tier", tier)
        .withColumn("tier_name", name)
        .groupBy(lang_col, "tier", "tier_name")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.col("lm_score").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_lm_score"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-trained bigram language-model score per document — the
    next perplexity proxy up from unigram_lm_scores: mean per-bigram
    log10 P(w2 | w1) with add-one smoothing over the corpus vocabulary
    (P = (c(w1 w2) + 1) / (c(w1 ·) + V)). Catches locally-scrambled
    text that unigram statistics cannot (same tokens, wrong order).
    Returns (id_col, n_bigrams, lm2_score) for documents with >= 2
    tokens.

    Determinism: all counts and V are integers; the one libm call
    (log10) is decimal-staged per distinct (doc, bigram) and weighed
    by its occurrence count (decimal x integer, exact), then the mean
    is rounded to 6 dp — the unigram recipe.

    Scale shape: one explode into (doc, w1, w2) collapsing map-side to
    per-doc bigram counts; bigram and left-context tables aggregate
    from those counts (never raw tokens); V is a broadcast scalar.
    Joins are bigram-keyed shuffles with AQE skew-split on hot
    bigrams.
    """
    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda x: x != F.lit(""),
        ).alias("__l__"),
    )
    # <2-token docs are cut inside the explode argument (empty array
    # ⇒ zero rows) rather than a size() Filter, which Catalyst would
    # push through the projection and re-evaluate the tokenization
    # per row (the minhash shingle-guard double-eval trap).
    bi = toks.select(
        id_col,
        F.explode(
            F.expr("if(size(__l__) >= 2, sequence(1, size(__l__) - 1), array())")
        ).alias("__i__"),
        "__l__",
    ).select(
        id_col,
        F.element_at("__l__", F.col("__i__")).alias("__w1__"),
        F.element_at("__l__", F.col("__i__") + 1).alias("__w2__"),
    )
    # (doc, w1, w2) occurrence counts — everything downstream derives
    # from this ONE materialized collapse; un-materialized, the four
    # consumer branches (bigram table, left-context table, vocabulary,
    # score join) each re-scanned and re-tokenized the corpus (plan
    # audit: 5 scans, 0 ReusedExchange)
    db = materialize(
        bi.groupBy(id_col, "__w1__", "__w2__").agg(F.count("*").alias("__k__"))
    )
    big = db.groupBy("__w1__", "__w2__").agg(F.sum("__k__").alias("__c12__"))
    left = big.groupBy("__w1__").agg(F.sum("__c12__").alias("__c1__"))
    # distinct token set over per-doc distinct bigrams ≡ over raw
    # occurrences, so V can derive from db instead of re-walking bi
    vocab_n = (
        db.select(F.col("__w1__").alias("__w__"))
        .union(db.select(F.col("__w2__")))
        .agg(F.countDistinct("__w__").alias("__v__"))
    )
    term = F.log10(
        (F.col("__c12__") + F.lit(1.0)) / (F.col("__c1__") + F.col("__v__"))
    ).cast("decimal(18,9)") * F.col("__k__").cast("decimal(18,0)")
    return (
        db.join(big, ["__w1__", "__w2__"])
        .join(left, "__w1__")
        .join(F.broadcast(vocab_n))
        .groupBy(id_col)
        .agg(
            F.sum("__k__").alias("n_bigrams"),
            F.round(F.sum(term).cast("double") / F.sum("__k__"), 6).alias(
                "lm2_score"
            ),
        )
    )
