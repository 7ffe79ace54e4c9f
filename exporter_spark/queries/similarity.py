"""Similarity search (operators/similarity.py over embeddings).

Split out of the monolithic queries.py in round 15; registration
order within this module is unchanged (see queries/__init__.py for
the cross-module order and the driver-window contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exporter_spark.operators import similarity
from exporter_spark.queries._registry import _dsum, _register
from exporter_spark.sources.files import load_table

# =====================================================================
# Similarity search (operators/similarity.py over embeddings)
# =====================================================================

_COSINE_SQL = (
    "ROUND(list_inner_product(a.v, b.v) /"
    " (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6)"
)

# cosine_topk and cosine_topk_scan are two physical strategies for
# the SAME logical query, so they share ONE oracle string.
_COSINE_TOPK_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COSINE_SQL} AS sim,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_COSINE_SQL} DESC, b.vec_id ASC) AS rank
      FROM e a JOIN e b ON a.vec_id != b.vec_id
      WHERE a.vec_id < 10)
    WHERE rank <= 5
    """


@_register("cosine_topk", _COSINE_TOPK_ORACLE)
def cosine_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk(e, q, k=5)


@_register("cosine_topk_scan", _COSINE_TOPK_ORACLE)
def cosine_topk_scan(spark, sf_dir):
    """Matrix-scan exact tier: same answer as cosine_topk, shuffle
    volume O(k·queries·batches) instead of corpus × queries pairs."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_scan(e, q, k=5)


_LSH = dict(dims=64, planes=6)


def _lsh_topk_oracle() -> str:
    sig = similarity.lsh_signature_sql(
        "(embedding::DOUBLE[])", _LSH["dims"], _LSH["planes"]
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {sig} AS sig FROM embeddings)
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COSINE_SQL} AS sim,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_COSINE_SQL} DESC, b.vec_id ASC) AS rank
      FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id != b.vec_id
      WHERE a.vec_id < 5)
    WHERE rank <= 5
    """


@_register("lsh_ann_topk", _lsh_topk_oracle())
def lsh_ann_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return similarity.lsh_topk(e, q, k=5, dims=_LSH["dims"], planes=_LSH["planes"])


_NEARDUP = dict(threshold=0.3, dims=64, planes=4)


def _emb_near_dup_oracle() -> str:
    sig = similarity.lsh_signature_sql(
        "(embedding::DOUBLE[])", _NEARDUP["dims"], _NEARDUP["planes"]
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {sig} AS sig FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_COSINE_SQL} AS sim
    FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE {_COSINE_SQL} >= {_NEARDUP["threshold"]}
    """


@_register("embedding_near_dup", _emb_near_dup_oracle())
def embedding_near_dup(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(
        e, threshold=_NEARDUP["threshold"], dims=_NEARDUP["dims"],
        planes=_NEARDUP["planes"],
    )


_BANDED = dict(threshold=0.3, dims=64, planes_per_table=3, num_tables=12)


def _emb_banded_oracle() -> str:
    """Banded LSH replica: per-table signatures as UNION ALL branches
    (table t uses hyperplane slice [t·b, (t+1)·b)), candidates match
    in any table, DISTINCT collapses multi-table hits."""
    b, T = _BANDED["planes_per_table"], _BANDED["num_tables"]
    branches = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, "
        + similarity.lsh_signature_sql("v", _BANDED["dims"], b, plane_offset=t * b)
        + " AS sig FROM e"
        for t in range(T)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sigs AS ({branches})
    SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id, {_COSINE_SQL} AS sim
    FROM sigs a JOIN sigs b
      ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE {_COSINE_SQL} >= {_BANDED["threshold"]}
    """


@_register("embedding_near_dup_banded", _emb_banded_oracle())
def embedding_near_dup_banded(spark, sf_dir):
    """Recall-safe multi-table variant of embedding_near_dup."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_banded(e, **_BANDED)


def _semdedup_oracle() -> str:
    """Dominated-policy SemDeDup replica: the drop set is exactly the
    b_id side of the near-dup pair join; survivors are the anti-set."""
    sig = similarity.lsh_signature_sql(
        "(embedding::DOUBLE[])", _NEARDUP["dims"], _NEARDUP["planes"]
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {sig} AS sig FROM embeddings),
    drops AS (
      SELECT DISTINCT b.vec_id AS vid
      FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id < b.vec_id
      WHERE {_COSINE_SQL} >= {_NEARDUP["threshold"]})
    SELECT vec_id, label FROM embeddings
    WHERE vec_id NOT IN (SELECT vid FROM drops)
    """


@_register("semdedup_survivors", _semdedup_oracle())
def semdedup_survivors(spark, sf_dir):
    """Semantic dedup (SemDeDup, arXiv:2303.09540) survivors under the
    SQL-expressible 'dominated' policy: a vector is dropped when any
    smaller-id LSH-bucket-mate sits within the cosine threshold."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.semdedup(
        e,
        threshold=_NEARDUP["threshold"],
        dims=_NEARDUP["dims"],
        planes=_NEARDUP["planes"],
        policy="dominated",
    ).select("vec_id", "label")


@_register("semdedup_survivors_greedy", None)
def semdedup_survivors_greedy(spark, sf_dir):
    """Greedy (paper-semantics) SemDeDup: dropped vectors cannot knock
    out later ones, so the kept set is the sequential scan's fixpoint.
    No oracle: the kept-set recursion isn't expressible as plain SQL
    (each keep decision depends on all previous keep decisions);
    pytest pins it against a pure-python reference and the dominated
    lower bound instead."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.semdedup(
        e,
        threshold=_NEARDUP["threshold"],
        dims=_NEARDUP["dims"],
        planes=_NEARDUP["planes"],
        policy="greedy",
    ).select("vec_id", "label")


