"""Sampling & curation (operators/sampling.py over documents).

Split out of the monolithic queries.py in round 15; registration
order within this module is unchanged (see queries/__init__.py for
the cross-module order and the driver-window contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exporter_spark.operators import sampling, similarity, text
from exporter_spark.queries.text_quality import _QUALITY_SQL, _TOKENS_SQL
from exporter_spark.queries._registry import _dsum, _register
from exporter_spark.sources.files import load_table

# =====================================================================
# Sampling & curation (operators/sampling.py over documents)
# =====================================================================

# DuckDB replica of sampling.hash32: first 32 bits of md5(salt || id)
_H32 = "('0x' || substr(md5('{salt}' || doc_id), 1, 8))::BIGINT"


@_register(
    "docs_sample_deterministic",
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_H32.format(salt='sample')} < {int(0.25 * 2**32)}
    """,
)
def docs_sample_deterministic(spark, sf_dir):
    """Content-hash sampling: the kept set is a pure function of ids —
    identical across engines, runs, and partitionings."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.deterministic_sample(d, "doc_id", 0.25).select(
        "doc_id", "lang", "source"
    )


def _int8_topk_oracle() -> str:
    dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(a.q)),"
        " i -> CAST(a.q[i] AS BIGINT) * b.q[i])) AS DOUBLE)"
    )
    sim = (
        "ROUND(CASE WHEN a.qn = 0 OR b.qn = 0 THEN 0.0::DOUBLE "
        f"ELSE {dot} / sqrt(CAST(a.qn * b.qn AS DOUBLE)) END, 6)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0::DOUBLE
                  THEN 1.0::DOUBLE
                  ELSE list_max(list_transform(v, x -> abs(x))) / 127.0::DOUBLE
             END AS scale
      FROM e),
    qq AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(round(x / scale) AS INTEGER)) AS q
      FROM s),
    n AS (
      SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn
      FROM qq)
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {sim} AS sim,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {sim} DESC, b.vec_id ASC) AS rank
      FROM n a JOIN n b ON a.vec_id != b.vec_id
      WHERE a.vec_id < 10)
    WHERE rank <= 5
    """


@_register("int8_ann_topk", _int8_topk_oracle())
def int8_ann_topk(spark, sf_dir):
    """Quantized top-k tier: int8 candidate vectors (4x fewer shuffle
    bytes), exact-integer dot products, bit-exact sims."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.int8_topk(e, q, k=5)


# Self-trained unigram LM scoring (tokenize -> corpus vocab ->
# per-doc mean log10 probability) — ONE copy, shared by the
# unigram_lm_scores / lm_quality_buckets / lang_token_budget oracles
# so the decimal staging and tokenization can never drift apart.
_LM_SCORES_SQL = """toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents WHERE trim(text) <> ''),
    toks2 AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks2 GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    lm_scores AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             ROUND(CAST(SUM(CAST(log10(cnt::DOUBLE / total) AS DECIMAL(18,9)))
                        AS DOUBLE) / COUNT(*), 6) AS lm_score
      FROM toks2 JOIN vocab USING (tok), tot
      GROUP BY doc_id)"""


@_register(
    "unigram_lm_scores",
    f"""
    WITH {_LM_SCORES_SQL}
    SELECT doc_id, n_tokens, lm_score FROM lm_scores
    """,
)
def unigram_lm_scores(spark, sf_dir):
    """CCNet-style self-trained unigram LM quality signal
    (arXiv:1911.00359): mean per-token log10 probability under the
    corpus's own unigram distribution."""
    d = load_table(spark, sf_dir, "documents")
    return text.unigram_lm_scores(d)


@_register(
    "embedding_quantize_stats",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0::DOUBLE
                  THEN 1.0::DOUBLE
                  ELSE list_max(list_transform(v, x -> abs(x))) / 127.0::DOUBLE
             END AS scale
      FROM e),
    qq AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> CAST(round(x / scale) AS INTEGER)) AS q
      FROM s)
    SELECT vec_id, scale,
           CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qnorm,
           list_max(list_transform(generate_series(1, len(v)),
                                   i -> abs(v[i] - q[i] * scale))) AS max_err
    FROM qq
    """,
)
def embedding_quantize_stats(spark, sf_dir):
    """Int8 quantization audit: per-vector scale, exact integer
    squared norm of the quantized vector, and worst reconstruction
    error. Every op is IEEE arithmetic (no libm), so all three stats
    are bit-identical across engines with no rounding step."""
    e = load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_int8(e, keep_vec=True)
    return q.select(
        "vec_id",
        "scale",
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda acc, x: acc + (x * x).cast("long")
        ).alias("qnorm"),
        F.array_max(
            F.zip_with(
                "vec64", "q", lambda x, qi: F.abs(x - qi * F.col("scale"))
            )
        ).alias("max_err"),
    )


_PACK = dict(budget=512, streams=8)


@_register(
    "pack_chunks_docs",
    f"""
    WITH d AS (
      SELECT doc_id, CAST({_TOKENS_SQL} AS BIGINT) AS t,
             {_H32.format(salt='pack')} AS h
      FROM documents),
    c AS (
      SELECT doc_id, t, h, CAST(h % {_PACK["streams"]} AS INTEGER) AS stream,
             CAST(SUM(t) OVER (PARTITION BY h % {_PACK["streams"]}
                               ORDER BY h, doc_id
                               ROWS UNBOUNDED PRECEDING) - t AS BIGINT) AS start
      FROM d WHERE t > 0)
    SELECT doc_id, stream, chunk,
           GREATEST(start, chunk * {_PACK["budget"]}) - start AS off_in_doc,
           GREATEST(start, chunk * {_PACK["budget"]})
             - chunk * {_PACK["budget"]} AS off_in_chunk,
           LEAST(start + t, (chunk + 1) * {_PACK["budget"]})
             - GREATEST(start, chunk * {_PACK["budget"]}) AS n_toks
    FROM c, UNNEST(generate_series(start // {_PACK["budget"]},
                                   (start + t - 1) // {_PACK["budget"]})) AS u(chunk)
    """,
)
def pack_chunks_docs(spark, sf_dir):
    """Sequence packing for LLM pretraining: documents laid end-to-end
    in deterministic hash order across independent lanes, cut into
    512-token chunks (sampling.pack_chunks). One row per
    (document, chunk) slice; integer-exact in both engines."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.pack_chunks(
        d, "doc_id", text.token_count(F.col("text")), salt="pack", **_PACK
    )


_STRATA = {"en": 0.1, "de": 0.5, "fr": 0.3, "es": 0.2, "zh": 0.4}


def _strata_oracle() -> str:
    case = "CASE lang " + " ".join(
        f"WHEN '{s}' THEN {int(f * 2**32)}" for s, f in sorted(_STRATA.items())
    ) + " ELSE -1 END"
    return f"""
    SELECT lang, COUNT(*) AS n_kept FROM documents
    WHERE {_H32.format(salt='strata')} < {case}
    GROUP BY lang
    """


@_register("docs_stratified_sample", _strata_oracle())
def docs_stratified_sample(spark, sf_dir):
    """Language rebalancing: per-stratum keep-fractions, one hash +
    one CASE threshold, zero shuffle before the count."""
    d = load_table(spark, sf_dir, "documents")
    return (
        sampling.stratified_sample(d, "lang", _STRATA, "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )


@_register(
    "docs_train_test_split",
    f"""
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT lang, n_chars,
                 CASE WHEN {_H32.format(salt='tts')} < {int(0.2 * 2**32)}
                      THEN 'test' ELSE 'train' END AS split
          FROM documents)
    GROUP BY split, lang
    """,
)
def docs_train_test_split(spark, sf_dir):
    """Hash-stable train/test tagging: no document ever migrates
    between splits on rerun or reshuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        sampling.train_test_split(d, "doc_id", test_fraction=0.2)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@_register(
    "docs_capped_per_source",
    """
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents) WHERE rn <= 10
    """,
)
def docs_capped_per_source(spark, sf_dir):
    """Per-domain quota: at most 10 docs per source, largest first
    (total order: doc_id tie-break). One shuffle on the quota key."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.cap_per_key(
        d, "source", 10, [F.desc("n_chars"), F.asc("doc_id")]
    ).select("source", "doc_id", "n_chars")


def _pii_oracle() -> str:
    email, ip, phone = (p for p, _ in text.PII_PATTERNS)
    return f"""
    WITH inj AS (
      SELECT doc_id,
             'reach u' || doc_id || '@mail.example.org or 10.0.' ||
             (doc_id % 256) || '.7 or 555-123-4567 re: ' || text AS t
      FROM documents)
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{email}', '<EMAIL>', 'g'),
               '{ip}', '<IP>', 'g'),
               '{phone}', '<PHONE>', 'g')) AS redacted_md5
    FROM inj
    """


@_register("pii_redaction_check", _pii_oracle())
def pii_redaction_check(spark, sf_dir):
    """Regex scrub parity: deterministic emails/IPs/phones are spliced
    into every document in BOTH engines, redacted with the same
    pattern literals (Java-regex ∩ RE2 subset), and compared by md5 —
    a value-level gate on the actual replacement behavior."""
    d = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.lit("reach u"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.org or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or 555-123-4567 re: "),
        F.col("text"),
    )
    return d.select(
        "doc_id", F.md5(text.redact_pii(injected)).alias("redacted_md5")
    )


def _winnow_oracle(k: int = 8, w: int = 8) -> str:
    """DuckDB replica of text.winnow_fingerprints: same normalization,
    same md5 k-gram hash, same framed window min over the sortable
    hash||(2^31-1-pos) key, same short-doc handling."""
    return f"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents),
    base AS (
      SELECT doc_id, t, length(t) - {k} + 1 AS n
      FROM norm WHERE length(t) >= {k}),
    grams AS (
      SELECT doc_id, n, i,
             substr(md5(substr(t, i::INT, {k})), 1, 8) ||
             lpad(CAST(2147483647 - i AS VARCHAR), 10, '0') AS wk
      FROM base, unnest(generate_series(1, n)) AS u(i)),
    wins AS (
      SELECT doc_id, n, i,
             min(wk) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mn
      FROM grams)
    SELECT DISTINCT doc_id,
           CAST(2147483647 - CAST(substr(mn, 9, 10) AS BIGINT) AS BIGINT) AS pos,
           substr(mn, 1, 8) AS fp
    FROM wins WHERE i <= greatest(1, n - {w - 1})
    """


@_register("winnow_fingerprints", _winnow_oracle())
def winnow_fingerprints(spark, sf_dir):
    """Rolling k-gram winnowing (MOSS) fingerprints over documents."""
    d = load_table(spark, sf_dir, "documents")
    return text.winnow_fingerprints(d, "doc_id", "text", k=8, w=8)


@_register(
    "boilerplate_spans",
    f"""
    WITH f AS ({_winnow_oracle()})
    SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc
    FROM f GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, fp ASC LIMIT 50
    """,
)
def boilerplate_spans(spark, sf_dir):
    """Cross-document repeated spans (boilerplate detection): winnow
    fingerprints shared by ≥2 documents, heaviest first. The
    guarantee inherited from winnowing: any repeated substring of
    length ≥ k+w−1 surfaces here. Fingerprints partial-aggregate
    map-side; only (fp, doc) pairs shuffle."""
    d = load_table(spark, sf_dir, "documents")
    fps = text.winnow_fingerprints(d, "doc_id", "text", k=8, w=8)
    return (
        fps.groupBy("fp")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.asc("fp"))
        .limit(50)
    )


_TFIDF_SCORE = "round(tf * (ln((nd + 1.0) / (df + 1.0)) + 1.0), 6)"


@_register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x != '')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT doc_id, token, score, rank FROM (
      SELECT tf.doc_id, tf.token, {_TFIDF_SCORE} AS score,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY {_TFIDF_SCORE} DESC, tf.token ASC) AS rank
      FROM tf JOIN dfreq USING (token), n)
    WHERE rank <= 5
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Per-document TF-IDF head terms (smooth idf, round(6) scores,
    total-ordered top-5)."""
    d = load_table(spark, sf_dir, "documents")
    return text.tfidf_top_terms(d, "doc_id", "text", top_n=5)


@_register(
    "top_tokens",
    """
    SELECT token, COUNT(*) AS n FROM (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x != '')) AS token
      FROM documents)
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def top_tokens(spark, sf_dir):
    """Corpus vocabulary head: explode → count → total-ordered top-k.
    The partial (map-side) aggregation absorbs the token explosion
    before the single shuffle; the final top-k is a TakeOrdered, not a
    global sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


