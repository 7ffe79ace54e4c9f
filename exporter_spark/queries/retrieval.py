"""Retrieval, data selection, training order, projection (round 3).

Split out of the monolithic queries.py in round 15; registration
order within this module is unchanged (see queries/__init__.py for
the cross-module order and the driver-window contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exporter_spark.operators import dedup, retrieval, sampling, similarity, text
from exporter_spark.queries.curation import _H32, _LM_SCORES_SQL
from exporter_spark.queries.dedup import _CC_SQL, _MINHASH, _minhash_oracle
from exporter_spark.queries._registry import _dsum, _register
from exporter_spark.sources.files import load_table

# =====================================================================
# Round 3: retrieval, data selection, training order, projection
# =====================================================================

_BM25_TERMS = ["spark", "hash", "vector"]


@_register("bm25_topk_docs", retrieval.bm25_oracle_sql(_BM25_TERMS, k=10))
def bm25_topk_docs(spark, sf_dir):
    """Okapi BM25 keyword retrieval (Lucene idf variant) for a literal
    term set. Stats (N, avgdl, per-term df) are ONE broadcast
    single-row aggregate; tf/dl are map-side expressions."""
    d = load_table(spark, sf_dir, "documents")
    return retrieval.bm25_topk(d, _BM25_TERMS, k=10)


@_register(
    "dsir_importance_weights",
    """
    WITH toks AS (
      SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS t,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents),
    tb AS (
      SELECT doc_id, t,
             ('0x' || substr(md5('dsir' || tok), 1, 8))::BIGINT % 64 AS b
      FROM toks),
    bt AS (SELECT b, COUNT(*) AS cr, SUM(t) AS ct FROM tb GROUP BY b),
    tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM bt),
    lr AS (SELECT b, ln((ct + 1.0) / (tt + 64.0)) - ln((cr + 1.0) / (tr + 64.0)) AS lrv
           FROM bt, tot)
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(CAST(lrv AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
             AS dsir_weight
    FROM tb JOIN lr USING (b)
    GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR (arXiv:2302.03169) importance weights toward the lang='en'
    target slice, hashed-unigram features over 64 md5 buckets."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.dsir_weights(d, F.col("lang") == "en", buckets=64)


@_register(
    "lm_quality_buckets",
    f"""
    WITH {_LM_SCORES_SQL},
    wl AS (
      SELECT s.doc_id, s.lm_score, d.lang
      FROM lm_scores s JOIN documents d USING (doc_id)),
    tiers AS (
      SELECT lang, lm_score,
             CAST(ntile(3) OVER (PARTITION BY lang
                                 ORDER BY lm_score DESC, doc_id ASC) AS BIGINT)
               AS tier
      FROM wl)
    SELECT lang, tier,
           CASE WHEN tier = 1 THEN 'head'
                WHEN tier = 2 THEN 'middle'
                ELSE 'tail' END AS tier_name,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(lm_score AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_lm_score
    FROM tiers
    GROUP BY lang, tier
    """,
)
def lm_quality_buckets(spark, sf_dir):
    """CCNet head/middle/tail tiers (arXiv:1911.00359): per-language
    ntile(3) over the self-trained unigram LM score."""
    d = load_table(spark, sf_dir, "documents")
    out = text.lm_quality_buckets(d)
    return out.select(
        "lang",
        F.col("tier").cast("long").alias("tier"),
        "tier_name",
        "n_docs",
        "avg_lm_score",
    )


@_register(
    "embedding_random_projection",
    similarity.rp_oracle_sql(16, 64),
)
def embedding_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss 64→16 reduction with a deterministic
    Rademacher (±1) matrix (Achlioptas 2003) — literal matrix inlined
    in both engines, ordered fold, zero shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.random_projection(e, 16, 64)


@_register(
    "training_shuffle_docs",
    """
    WITH s AS (
      SELECT doc_id,
             md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents),
    b AS (
      SELECT doc_id, shuffle_key,
             CAST(('0x' || substr(shuffle_key, 1, 2))::BIGINT AS INTEGER) AS bucket
      FROM s)
    SELECT doc_id, shuffle_key, bucket,
           CAST(ROW_NUMBER() OVER (PARTITION BY bucket
                                   ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
    FROM b
    """,
)
def training_shuffle_docs(spark, sf_dir):
    """Deterministic 256-bucket global training shuffle — the scalable
    substitute for ORDER BY rand(): no total-order exchange, global
    order = (bucket, pos), reproducible across engines and epochs."""
    d = load_table(spark, sf_dir, "documents")
    out = sampling.training_shuffle(d, seed="epoch0")
    return out.select(
        "doc_id", "shuffle_key", "bucket", F.col("pos").cast("long").alias("pos")
    )


@_register(
    "exact_substring_spans",
    """
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
    g AS (
      SELECT doc_id, i, md5(array_to_string(l[i:i+9], ' ')) AS h
      FROM toks, unnest(generate_series(1, len(l) - 10 + 1)) AS t(i)
      WHERE len(l) >= 10),
    c AS (SELECT doc_id, i, COUNT(*) OVER (PARTITION BY h) AS cnt FROM g),
    d AS (SELECT doc_id, i FROM c WHERE cnt >= 2),
    r AS (
      SELECT doc_id, i,
             CASE WHEN i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 10
                  THEN 1 ELSE 0 END AS brk
      FROM d),
    grp AS (
      SELECT doc_id, i,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS g
      FROM r)
    SELECT doc_id,
           CAST(MIN(i) AS BIGINT) AS span_start,
           CAST(MAX(i) + 10 - 1 AS BIGINT) AS span_end,
           CAST(MAX(i) + 10 - MIN(i) AS BIGINT) AS span_tokens,
           COUNT(*) AS n_dup_grams
    FROM grp GROUP BY doc_id, g
    """,
)
def exact_substring_spans(spark, sf_dir):
    """ExactSubstr duplicate spans (arXiv:2107.06499) at k=10 word
    grams: maximal token spans whose grams repeat corpus-wide."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_substring_spans(d, k=10, min_count=2)


# Shared by exact_substring_strip and the pretraining-mix pipeline.
_STRIP_SQL = """
    toksrc AS (
      SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
    g AS (
      SELECT doc_id, i, md5(array_to_string(l[i:i+9], ' ')) AS h
      FROM toksrc, unnest(generate_series(1, len(l) - 10 + 1)) AS t(i)
      WHERE len(l) >= 10),
    c AS (SELECT doc_id, i, COUNT(*) OVER (PARTITION BY h) AS cnt FROM g),
    d AS (SELECT doc_id, i FROM c WHERE cnt >= 2),
    r AS (
      SELECT doc_id, i,
             CASE WHEN i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 10
                  THEN 1 ELSE 0 END AS brk
      FROM d),
    grp AS (
      SELECT doc_id, i,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grpid
      FROM r),
    spans AS (
      SELECT doc_id, MIN(i) AS span_start, MAX(i) + 10 - 1 AS span_end
      FROM grp GROUP BY doc_id, grpid),
    toks AS (
      SELECT doc_id, i AS pos, l[i] AS w
      FROM toksrc, unnest(generate_series(1, len(l))) AS t(i)),
    keep AS (
      SELECT t.doc_id, t.pos, t.w FROM toks t
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = t.doc_id
          AND t.pos BETWEEN s.span_start AND s.span_end)),
    cleaned AS (
      SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_clean_tokens
      FROM keep GROUP BY doc_id)
"""


@_register(
    "exact_substring_strip",
    f"""
    WITH {_STRIP_SQL}
    SELECT doc_id, clean_text FROM cleaned
    """,
)
def exact_substring_strip(spark, sf_dir):
    """ExactSubstr cut step: corpus-duplicated spans removed from each
    document, survivors reassembled in token order."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.strip_duplicate_spans(d, k=10, min_count=2)


@_register(
    "pretraining_mix_stats",
    f"""
    WITH {_STRIP_SQL},
    quality AS (
      SELECT c.doc_id, c.n_clean_tokens, d.source, d.lang
      FROM cleaned c JOIN documents d USING (doc_id)
      WHERE c.n_clean_tokens >= 20),
    cnt AS (SELECT source, COUNT(*) AS n FROM quality GROUP BY source),
    w AS (SELECT source, n, pow(CAST(n AS DOUBLE), -0.5) AS wt FROM cnt),
    m AS (SELECT MAX(wt) AS mx FROM w),
    thr AS (SELECT source,
                   CAST(floor(ROUND(wt / mx, 6) * 4294967296.0) AS BIGINT) AS t
            FROM w, m),
    kept AS (
      SELECT q.* FROM quality q JOIN thr ON q.source IS NOT DISTINCT FROM thr.source
      WHERE ('0x' || substr(md5('mixv1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            < thr.t)
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_clean_tokens) AS BIGINT) AS n_tokens
    FROM kept GROUP BY source, lang
    """,
)
def pretraining_mix_stats(spark, sf_dir):
    """End-to-end pretraining-mix pipeline composing the round-3
    operators in one declarative plan: ExactSubstr span stripping →
    minimum-length quality gate → alpha-temperature source
    rebalancing → per-(source, lang) document and token budgets. What
    a data-recipe owner actually reads before a training run."""
    from exporter_spark.operators.partitioning import materialize

    d = load_table(spark, sf_dir, "documents")
    clean = dedup.strip_duplicate_spans(d, k=10, min_count=2)
    # materialize the post-quality-gate frame BEFORE the mixture
    # stage: temperature_mixture consumes its input twice (per-source
    # counts, then the threshold filter join), and without a persist
    # each consumer re-executes the whole ExactSubstr strip pipeline —
    # the r10 scan audit read 18 FileScans for this query. Only the
    # four narrow columns the rest of the plan needs are kept, so the
    # cached footprint is ids+counts, never the cleaned text.
    quality = materialize(
        clean.withColumn(
            "n_clean_tokens", F.size(F.split(F.col("clean_text"), " ")).cast("long")
        )
        .filter(F.col("n_clean_tokens") >= 20)
        .join(d.select("doc_id", "source", "lang"), "doc_id")
        .select("doc_id", "n_clean_tokens", "source", "lang")
    )
    kept = sampling.temperature_mixture(
        quality, "source", alpha=0.5, salt="mixv1"
    )
    return kept.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_clean_tokens").alias("n_tokens"),
    )


@_register(
    "value_percentiles",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.25 ORDER BY value), 6) AS p25,
           ROUND(quantile_cont(value, 0.5 ORDER BY value), 6) AS p50,
           ROUND(quantile_cont(value, 0.75 ORDER BY value), 6) AS p75,
           ROUND(quantile_cont(value, 0.99 ORDER BY value), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark, sf_dir):
    """Exact linear-interpolation percentiles per event type — Spark's
    percentile() and DuckDB's quantile_cont share the same definition,
    so the result is oracle-exact (round 6 absorbs the interpolation
    arithmetic's last bits). At 100 TB swap in percentile_approx
    (KLL-sketch, map-side combinable) — exact percentile shuffles the
    full value set per group and is the deliberate oracle mode here."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@_register(
    "temperature_mixture_docs",
    """
    WITH c AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
    w AS (SELECT source, cnt, pow(CAST(cnt AS DOUBLE), -0.5) AS wt FROM c),
    m AS (SELECT MAX(wt) AS mx FROM w),
    p AS (SELECT source, cnt,
                 CAST(floor(ROUND(wt / mx, 6) * 4294967296.0) AS BIGINT) AS thr
          FROM w, m)
    SELECT d.source,
           MIN(p.cnt) AS n_total,
           COUNT(*) AS n_kept
    FROM documents d JOIN p ON d.source IS NOT DISTINCT FROM p.source
    WHERE ('0x' || substr(md5('temp' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < p.thr
    GROUP BY d.source
    """,
)
def temperature_mixture_docs(spark, sf_dir):
    """Gopher/PaLM-style alpha-temperature source rebalancing
    (alpha=0.5): keep-probability ∝ cnt^(alpha-1), smallest source
    keeps all; deterministic content-hash selection."""
    d = load_table(spark, sf_dir, "documents")
    totals = d.groupBy("source").agg(F.count("*").alias("n_total"))
    kept = sampling.temperature_mixture(d, "source", alpha=0.5)
    agg = kept.groupBy("source").agg(F.count("*").alias("n_kept"))
    # eqNullSafe so a NULL-source bucket (kept by temperature_mixture's
    # NULL-bucket rule) survives this reporting join too
    return (
        agg.join(F.broadcast(totals), agg["source"].eqNullSafe(totals["source"]))
        .select(agg["source"], "n_total", "n_kept")
    )


@_register(
    "conversion_funnel",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.s_ts
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click_after,
           (SELECT COUNT(*) FROM p) AS n_purchase_after
    """,
)
def conversion_funnel(spark, sf_dir):
    """Ordered three-stage funnel: users whose first click follows their
    first signup, and first purchase follows that click.

    ONE events scan: the three stages chain over a materialized
    3-column pruned base (the previous formulation re-scanned events
    per stage — 6 scans in the plan). The per-stage groupBy-min /
    join shape is kept deliberately: partial (map-side) aggregation
    absorbs hot users, where a per-user window would funnel a bot's
    millions of events into one task."""
    from exporter_spark.operators.partitioning import materialize

    e = load_table(spark, sf_dir, "events")
    base = materialize(
        e.filter(F.col("event_type").isin("signup", "click", "purchase")).select(
            "user_id", "ts", "event_type"
        )
    )
    s = (
        base.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        base.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        base.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_click_after"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_purchase_after"))))
    )


@_register(
    "retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events)
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, act.day) AS BIGINT) AS age_days,
           COUNT(*) AS n_users
    FROM act JOIN f USING (user_id)
    GROUP BY f.cohort, age_days
    """,
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen day,
    counted on each subsequent active day. Two user-keyed aggregates
    and one join; the (cohort, age) output is dimension-sized."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).cast("date").alias("cohort")
    )
    act = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    return (
        act.join(f, "user_id")
        .groupBy("cohort", F.datediff("day", "cohort").cast("long").alias("age_days"))
        .agg(F.count("*").alias("n_users"))
    )


@_register(
    "bigram_lm_scores",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS l
      FROM documents),
    base2 AS (SELECT doc_id, l FROM base WHERE len(l) >= 2),
    bi AS (
      SELECT doc_id, l[i] AS w1, l[i+1] AS w2
      FROM base2, unnest(generate_series(1, len(l) - 1)) AS t(i)),
    db AS (SELECT doc_id, w1, w2, COUNT(*) AS k FROM bi GROUP BY doc_id, w1, w2),
    big AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c12 FROM db GROUP BY w1, w2),
    lft AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY w1),
    v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vn
          FROM (SELECT w1 AS w FROM bi UNION SELECT w2 FROM bi))
    SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(log10((c12 + 1.0) / (c1 + vn)) AS DECIMAL(18,9))
                          * CAST(k AS DECIMAL(18,0))) AS DOUBLE) / SUM(k), 6)
             AS lm2_score
    FROM db JOIN big USING (w1, w2) JOIN lft USING (w1), v
    GROUP BY doc_id
    """,
)
def bigram_lm_scores(spark, sf_dir):
    """Self-trained bigram LM score (add-one smoothed P(w2|w1)) — the
    perplexity proxy one order up from unigram_lm_scores; catches
    locally-scrambled text that unigram statistics cannot."""
    d = load_table(spark, sf_dir, "documents")
    return text.bigram_lm_scores(d)


@_register(
    "lang_token_budget",
    f"""
    WITH {_LM_SCORES_SQL},
    wl AS (
      SELECT s.doc_id, s.n_tokens, s.lm_score, d.lang
      FROM lm_scores s JOIN documents d USING (doc_id)),
    c AS (
      SELECT lang, doc_id, n_tokens, lm_score,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang
                                      ORDER BY lm_score DESC, doc_id ASC
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens
      FROM wl)
    SELECT lang, doc_id, n_tokens, lm_score, cum_tokens
    FROM c WHERE cum_tokens - n_tokens < 3000
    """,
)
def lang_token_budget(spark, sf_dir):
    """Budget-constrained selection: the best documents per language
    (unigram-LM order) until each language's 3000-token budget is
    reached. One window cumsum per language — how a data recipe takes
    'the best N tokens per language' from a scored corpus."""
    d = load_table(spark, sf_dir, "documents")
    scores = text.unigram_lm_scores(d)
    wl = scores.join(d.select("doc_id", "lang"), "doc_id")
    kept = sampling.token_budget_select(
        wl,
        "lang",
        [F.col("lm_score").desc(), F.col("doc_id").asc()],
        "n_tokens",
        budget=3000,
    )
    return kept.select("lang", "doc_id", "n_tokens", "lm_score", "cum_tokens")


@_register(
    "dedup_cluster_sizes",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    {_CC_SQL},
    sizes AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
    SELECT sz AS cluster_size, COUNT(*) AS n_clusters
    FROM sizes GROUP BY sz
    """,
)
def dedup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster-size histogram — the corpus-health number a
    dedup run is judged by (how much mass sits in big clusters).
    Dimension-sized output on top of the components computation."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(d, "doc_id", "text", **_MINHASH)
    comp = dedup.connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters")
    )


@_register(
    "dup_rate_by_source",
    f"""
    WITH pairs AS ({_minhash_oracle()}),
    dup_ids AS (SELECT a_id AS id FROM pairs UNION SELECT b_id FROM pairs)
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN u.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_dup_pairs,
           ROUND(CAST(SUM(CASE WHEN u.id IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS dup_rate
    FROM documents d LEFT JOIN dup_ids u ON d.doc_id = u.id
    GROUP BY d.source
    """,
)
def dup_rate_by_source(spark, sf_dir):
    """Which sources are dirtiest: fraction of each source's documents
    that participate in at least one near-dup pair. The id set from
    the LSH pairs joins back dimension-sized; the corpus side is one
    left join + aggregate."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(d, "doc_id", "text", **_MINHASH)
    # ONE pass over the pair stream: union(select a, select b) would
    # instantiate — and re-execute — the whole LSH pipeline once per
    # branch (plan audit: 21 file scans); explode consumes it once
    dup_ids = (
        pairs.select(F.explode(F.array("a_id", "b_id")).alias("id"))
        .distinct()
        .withColumn("__dup__", F.lit(1))
    )
    joined = d.join(dup_ids, d["doc_id"] == dup_ids["id"], "left")
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.col("__dup__").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_in_dup_pairs"),
        F.round(
            F.sum(F.when(F.col("__dup__").isNotNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("dup_rate"),
    )


