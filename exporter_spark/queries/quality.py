"""Gopher-style quality signals & filtering (operators/text.py).

Split out of the monolithic queries.py in round 15; registration
order within this module is unchanged (see queries/__init__.py for
the cross-module order and the driver-window contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exporter_spark.operators import dedup, sampling, text
from exporter_spark.queries._registry import _dsum, _register
from exporter_spark.sources.files import load_table

# =====================================================================
# Gopher-style quality signals & filtering (operators/text.py)
# =====================================================================

_GOPHER_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')"
_GOPHER_LINES = (
    "list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),"
    " x -> x != '')"
)


def _gopher_signals_oracle() -> str:
    """DuckDB replay of text.gopher_signals: identical split/filter/
    distinct/replace primitives; divisions are float in both engines
    (DuckDB `/` on BIGINT is float division; Spark try_divide)."""

    def gram(n: int) -> str:
        return (
            f"CASE WHEN len(toks) >= {n} THEN list_transform("
            f"generate_series(1, len(toks) - {n - 1}),"
            f" i -> array_to_string(toks[i:i+{n - 1}], ' ')) ELSE [] END"
        )

    dup_cols = ", ".join(f"{gram(n)} AS g{n}" for n in text.DUP_NGRAM_NS)
    dup_sel = ",\n      ".join(
        f"ROUND(1.0::DOUBLE - len(list_distinct(g{n})) / len(g{n}), 6)"
        f" AS dup_{n}gram_frac"
        for n in text.DUP_NGRAM_NS
    )
    return f"""
    WITH t AS (SELECT doc_id, lang, text, {_GOPHER_TOKS} AS toks,
                      {_GOPHER_LINES} AS lines FROM documents),
    g AS (SELECT *, {gram(2)} AS g2, {gram(3)} AS g3, {dup_cols} FROM t)
    SELECT doc_id, lang,
      len(toks) AS word_cnt,
      ROUND(list_aggregate(list_transform(toks, x -> len(x)), 'sum')
            / len(toks), 6) AS mean_word_len,
      ROUND(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
            / len(toks), 6) AS alpha_word_frac,
      ROUND((len(text) - len(replace(text, '#', ''))
             + CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT))
            / len(toks), 6) AS symbol_word_ratio,
      ROUND(1.0::DOUBLE - len(list_distinct(toks)) / len(toks), 6)
        AS dup_word_frac,
      ROUND(1.0::DOUBLE - len(list_distinct(lines)) / len(lines), 6)
        AS dup_line_frac,
      ROUND(len(list_filter(lines, x -> substr(x, 1, 2) IN ('- ', '* ', '• ')))
            / len(lines), 6) AS bullet_line_frac,
      ROUND(len(list_filter(lines, x -> ends_with(x, '...') OR ends_with(x, '…')))
            / len(lines), 6) AS ellipsis_line_frac,
      ROUND(list_max(list_transform(g2, x -> len(list_filter(g2, h -> h = x))))
            / len(g2), 6) AS top_2gram_frac,
      ROUND(list_max(list_transform(g3, x -> len(list_filter(g3, h -> h = x))))
            / len(g3), 6) AS top_3gram_frac,
      {dup_sel}
    FROM g
    """


@_register("gopher_quality_signals", _gopher_signals_oracle())
def gopher_quality_signals(spark, sf_dir):
    """Per-document Gopher quality signals (Rae et al. 2021 A1.1) —
    one counting pass, zero shuffle; text dropped from the output so
    only (ids + signals) leave the scan. kernel="auto": the compiled
    JVM counts kernel when a JDK is present (2.4-3.4× the Arrow
    kernel, bit-identical — SCALE.md round-5 attribution), pandas
    otherwise."""
    d = load_table(spark, sf_dir, "documents")
    return text.gopher_signals(
        d.select("doc_id", "lang", "text"), kernel="auto"
    ).drop("text")


def _gopher_filter_oracle() -> str:
    th = text.GOPHER_THRESHOLDS
    keep = (
        f"word_cnt BETWEEN {th['min_words']} AND {th['max_words']}"
        f" AND mean_word_len BETWEEN {th['min_mean_word_len']} AND {th['max_mean_word_len']}"
        f" AND symbol_word_ratio <= {th['max_symbol_word_ratio']}"
        f" AND alpha_word_frac >= {th['min_alpha_word_frac']}"
        f" AND dup_line_frac <= {th['max_dup_line_frac']}"
        f" AND bullet_line_frac <= {th['max_bullet_line_frac']}"
        f" AND ellipsis_line_frac <= {th['max_ellipsis_line_frac']}"
        f" AND top_2gram_frac <= {th['max_top_2gram_frac']}"
        f" AND top_3gram_frac <= {th['max_top_3gram_frac']}"
        + "".join(
            f" AND (dup_{n}gram_frac <= {th[f'max_dup_{n}gram_frac']}"
            f" OR word_cnt < {n})"
            for n in text.DUP_NGRAM_NS
        )
    )
    return f"""
    WITH s AS ({_gopher_signals_oracle()})
    SELECT lang, count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE {keep}) AS BIGINT) AS n_kept
    FROM s GROUP BY lang ORDER BY lang
    """


@_register("gopher_filter_stats", _gopher_filter_oracle())
def gopher_filter_stats(spark, sf_dir):
    """Per-language survival counts under the default Gopher rules
    (the corpus median sits near min_words=50, so the split is
    non-degenerate)."""
    d = load_table(spark, sf_dir, "documents")
    sig = text.gopher_signals(d.select("doc_id", "lang", "text"), kernel="auto")
    return (
        sig.withColumn("__keep__", text.gopher_keep())
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("__keep__"), F.lit(1))).alias("n_kept"),
        )
        .orderBy("lang")
    )


# The test corpus has no blank-line paragraphs, so the corpus query
# splits on the filler token ' a ' (present in 3/4 of documents) —
# the operator itself is separator-generic. Spark's 0-based pos and
# DuckDB's 1-based subscript only ever feed ORDER BY, so first-
# occurrence choice and reassembly order agree.
_PARA_DEDUP_ORACLE = """
WITH s AS (SELECT doc_id, string_split(text, ' a ') AS l FROM documents),
p AS (SELECT doc_id, i AS pos, l[i] AS para
      FROM s, UNNEST(generate_series(1, len(l))) AS t(i)),
k AS (SELECT doc_id, pos, para,
             ROW_NUMBER() OVER (PARTITION BY md5(para)
                                ORDER BY doc_id, pos) AS rn
      FROM p)
SELECT doc_id, string_agg(para, ' a ' ORDER BY pos) AS dedup_text,
       CAST(count(*) AS BIGINT) AS n_paras_kept
FROM k WHERE rn = 1 GROUP BY doc_id
"""


@_register("paragraph_dedup_docs", _PARA_DEDUP_ORACLE)
def paragraph_dedup_docs(spark, sf_dir):
    """Corpus-wide paragraph dedup: first occurrence of each distinct
    paragraph survives; docs reassemble from their survivors."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.paragraph_dedup(d, "doc_id", "text", sep=" a ")


# Probe = every 50th doc plays the benchmark suite; n=3 keeps the
# overlap non-trivial on the synthetic corpus (the operator default
# is the realistic n=8 window). Probe docs themselves are excluded —
# they trivially share all their own grams.
_CONTAMINATION_N = 3


def _contamination_oracle() -> str:
    n = _CONTAMINATION_N
    grams = (
        f"list_distinct(CASE WHEN len(toks) >= {n} THEN"
        f" list_transform(generate_series(1, len(toks) - {n - 1}),"
        f" i -> md5(array_to_string(toks[i:i+{n - 1}], ' ')))"
        f" ELSE [] END)"
    )
    return f"""
    WITH t AS (SELECT doc_id, {_GOPHER_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, unnest({grams}) AS g FROM t),
    pg AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
    FROM g JOIN pg USING (g)
    WHERE doc_id % 50 != 0
    GROUP BY doc_id
    """


@_register("ngram_contamination_check", _contamination_oracle())
def ngram_contamination_check(spark, sf_dir):
    """Train-test decontamination: corpus docs sharing any word
    n-gram with the probe set; probe gram hashes broadcast."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    probe = d.filter(F.col("doc_id") % 50 == 0)
    return dedup.ngram_contamination(
        corpus, probe, "doc_id", "text", n=_CONTAMINATION_N
    )


_MIX_WEIGHTS = {"de": 0.2, "en": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.2}


def _rebalance_oracle() -> str:
    case = " ".join(
        f"WHEN '{k}' THEN {v}::DOUBLE" for k, v in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    t AS (SELECT lang, n, CASE lang {case} ELSE NULL END AS w FROM c),
    m AS (SELECT min(n / w) AS m FROM t WHERE w > 0),
    a AS (SELECT lang, CAST(floor(((w * m.m) / n) * 4294967296.0) AS BIGINT) AS thr
          FROM t, m WHERE w > 0)
    SELECT d.doc_id, d.lang FROM documents d JOIN a USING (lang)
    WHERE ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < a.thr
    """


@_register("docs_rebalanced_mixture", _rebalance_oracle())
def docs_rebalanced_mixture(spark, sf_dir):
    """Uniform-language rebalance of the corpus: the scarcest language
    survives whole, the rest hash-downsample to match. Selection is
    reproducible across engines (same md5 + same double arithmetic
    in the acceptance thresholds)."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.rebalance_to_mixture(d, "lang", "doc_id", _MIX_WEIGHTS).select(
        "doc_id", "lang"
    )


_DEDUP_WITHIN_ORACLE = """
WITH p AS (SELECT doc_id, i AS pos, l[i] AS w
           FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
                UNNEST(generate_series(1, len(l))) AS t(i)),
k AS (SELECT doc_id, pos, w,
             ROW_NUMBER() OVER (PARTITION BY doc_id, w ORDER BY pos) AS rn
      FROM p)
SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS dedup_text
FROM k WHERE rn = 1 GROUP BY doc_id
"""


@_register("dedup_tokens_within_docs", _DEDUP_WITHIN_ORACLE)
def dedup_tokens_within_docs(spark, sf_dir):
    """In-document repeated-span removal with sep=' ' (repeated-token
    mode — non-trivial on every document of this corpus). Zero
    shuffle: the fold runs inside the scan stage."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        dedup.paragraph_dedup_within(F.col("text"), sep=" ").alias("dedup_text"),
    )


