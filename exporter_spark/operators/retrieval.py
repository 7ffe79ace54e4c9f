"""Keyword-retrieval operators (BM25) over the ``documents`` table.

Not present in the reference (SURVEY.md §2.4-2.5) — part of the
LLM-data-pipeline extension surface: retrieving corpus documents for a
literal term set is the standard tool for targeted inspection,
decontamination probes, and seed selection for importance sampling.

Scoring is Okapi BM25 with the Lucene idf variant
(Robertson & Spärck Jones; idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
nonnegative for any df):

    score(d) = Σ_t idf(t) * tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 - b + b·|d|/avgdl))

Scale shape: the query term set is a literal (a handful of terms), so
per-document tf/dl are pure map-side column expressions — no explode,
no token shuffle. Corpus statistics (N, avgdl, per-term df) reduce to
ONE single-row aggregate, broadcast back over the scan. Total cost at
100 TB: one pass for stats, one pass to score, a top-k sort of only
the scored survivors. Everything is whole-stage-codegen'd; the same
arithmetic replays verbatim in DuckDB for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_lower(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed — the match
    tokenization (DuckDB: list_filter(regexp_split_to_array(
    lower(trim(t)), '\\s+'), x -> x <> ''))."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != F.lit("")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a literal query-term set.
    Returns (id_col, bm25) for documents with score > 0.

    Determinism: tf/dl/df/N are integers (identical everywhere);
    avgdl and the score are IEEE double arithmetic in a fixed
    left-to-right term order; the one libm call (ln) is absorbed by
    the final round(6).
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens_lower(F.col(text_col))

    def _tf(term: str):
        # closure, not a default arg: pyspark treats a 2-arg lambda as
        # (element, index) and would bind the term name to the index
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = per.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per.join(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n")
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        dft = F.col(f"df_{i}").cast("double")
        idf = F.log((F.col("n") - dft + F.lit(0.5)) / (dft + F.lit(0.5)) + F.lit(1.0))
        # try_divide: an all-empty corpus has avgdl = 0 (ANSI division
        # error otherwise); every such doc has tf = 0 and is filtered,
        # identically to the oracle where x/0.0 yields inf/nan
        term = (
            idf
            * (tf * F.lit(k1 + 1.0))
            / (
                tf
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.try_divide(F.col("dl"), avgdl))
            )
        )
        score = term if score is None else score + term
    return scored.select(
        id_col, F.round(score, 6).alias("bm25")
    ).filter(F.col("bm25") > 0)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 retrieval with a total order (score desc, id asc) so
    the cut is deterministic across engines and partitionings."""
    return (
        bm25_scores(
            df, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The DuckDB replay of bm25_topk, generated from the SAME Python
    float constants so literal values match the Spark plan exactly."""
    terms = list(dict.fromkeys(query_terms))
    # SQL string literals: double any single quote (the Spark side
    # takes terms via F.lit, which needs no escaping — without this a
    # quoted term breaks the oracle and produces a spurious mismatch)
    tf_cols = ",\n             ".join(
        "len(list_filter(toks, x -> x = '{}')) AS tf_{}".format(
            t.replace("'", "''"), i
        )
        for i, t in enumerate(terms)
    )
    df_cols = ",\n             ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"(ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * {k1 + 1.0!r})"
        f" / (tf_{i} + {k1!r} * ({1.0 - b!r} + {b!r} * (dl / (CAST(sum_dl AS DOUBLE) / n)))))"
        for i in range(len(terms))
    )
    return f"""
    WITH tok AS (
      SELECT {id_col},
             list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'),
                         x -> x <> '') AS toks
      FROM {table}),
    per AS (
      SELECT {id_col}, len(toks) AS dl,
             {tf_cols}
      FROM tok),
    stats AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
             {df_cols}
      FROM per)
    SELECT {id_col}, bm25 FROM (
      SELECT {id_col}, ROUND({score_terms}, 6) AS bm25
      FROM per, stats)
    WHERE bm25 > 0
    ORDER BY bm25 DESC, {id_col} ASC
    LIMIT {k}
    """
