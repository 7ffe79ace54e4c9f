"""Zero-norm embedding vectors through every similarity tier.

Cosine is undefined for the zero vector; the session runs ANSI mode,
where the norm-product division THROWS — before the round-4 guard,
ONE all-zero embedding in the corpus aborted the whole job
(DIVIDE_BY_ZERO), and the numpy scan kernel ranked the resulting NaN
sims as the LARGEST values, emitting false neighbors. Contract now:
zero-norm vectors are filtered wherever norms are computed — they are
never neighbors, never queries, and never crash anything.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from exporter_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [0.0, 0.0, 0.0]),  # zero vector in the corpus AND query set
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [1.0, 1.0, 0.0]),
        (4, [0.9, 1.1, 0.0]),
        (5, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _assert_no_zero(rows):
    assert rows, "expected some neighbors from the non-degenerate vectors"
    for r in rows:
        assert r["neighbor_id"] != 0, "zero vector emitted as a neighbor"
        assert r["query_id"] != 0, "zero vector emitted as a query"
        assert r["sim"] is not None and r["sim"] == r["sim"], "NULL/NaN sim"


def test_cosine_topk_zero_vector(spark, vecs):
    q = vecs.filter(F.col("vec_id") <= 1)
    _assert_no_zero(similarity.cosine_topk(vecs, q, k=3).collect())


def test_cosine_topk_scan_zero_vector(spark, vecs):
    q = vecs.filter(F.col("vec_id") <= 1)
    _assert_no_zero(similarity.cosine_topk_scan(vecs, q, k=3).collect())


def test_lsh_ann_zero_vector(spark, vecs):
    q = vecs.filter(F.col("vec_id") <= 1)
    rows = similarity.lsh_topk(vecs, q, k=3, dims=3, planes=2).collect()
    for r in rows:
        assert r["neighbor_id"] != 0 and r["query_id"] != 0


def test_ivf_fixed_zero_vector(spark, vecs):
    q = vecs.filter(F.col("vec_id") <= 1)
    rows = similarity.ivf_fixed_topk(
        vecs, q, k=3, centroid_ids=[1, 2], n_probe=2
    ).collect()
    _assert_no_zero(rows)


def test_int8_topk_zero_vector(spark, vecs):
    q = vecs.filter(F.col("vec_id") <= 1)
    # int8 tier defines zero-norm sims as 0.0 (documented) — it must
    # not crash, and the zero QUERY yields only zero sims
    rows = similarity.int8_topk(vecs, q, k=3).collect()
    assert rows
    for r in rows:
        if r["query_id"] == 0 or r["neighbor_id"] == 0:
            assert r["sim"] == 0.0


def test_embedding_near_dup_zero_vector(spark, vecs):
    for mode in ("join", "grouped"):
        pairs = similarity.embedding_near_dup_pairs(
            vecs, threshold=0.9, dims=3, planes=1, mode=mode
        ).collect()
        for r in pairs:
            assert 0 not in (r["a_id"], r["b_id"]), (mode, r)


@pytest.fixture(scope="module")
def dirty(spark):
    """NULL vector, NaN element, NULL element, zero vector — none may
    crash a tier or surface as a neighbor/query. Spark-specific trap
    covered here: NaN compares GREATER than everything, so a plain
    `norm > 0` filter passes NaN norms and NaN sims rank FIRST."""
    rows = [
        (0, None),
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [float("nan"), 1.0, 0.0]),
        (4, [1.0, 1.0, 0.0]),
        (5, [1.0, None, 0.0]),
        (6, [0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


_DEGEN = {0, 3, 5, 6}


def test_dirty_vectors_all_tiers(spark, dirty):
    q = dirty.filter(F.col("vec_id").isin(0, 1, 3))
    outs = {
        "cosine_topk": similarity.cosine_topk(dirty, q, k=3),
        "cosine_topk_scan": similarity.cosine_topk_scan(dirty, q, k=3),
        "lsh_topk": similarity.lsh_topk(dirty, q, k=3, dims=3, planes=1),
        "near_dup_join": similarity.embedding_near_dup_pairs(
            dirty, threshold=0.5, dims=3, planes=1, mode="join"
        ),
        "near_dup_grouped": similarity.embedding_near_dup_pairs(
            dirty, threshold=0.5, dims=3, planes=1, mode="grouped"
        ),
        "ivf_fixed": similarity.ivf_fixed_topk(
            dirty, q, k=3, centroid_ids=[1, 2], n_probe=2
        ),
    }
    for name, df in outs.items():
        rows = df.collect()
        assert rows, f"{name}: clean vectors produced nothing"
        for r in rows:
            d = r.asDict()
            ids = {v for c, v in d.items() if c.endswith("_id")}
            assert not (ids & _DEGEN), f"{name}: degenerate id emitted {r}"
            if "sim" in d:
                assert d["sim"] is not None and d["sim"] == d["sim"], (name, r)


def test_dirty_vectors_review_gap_tiers(spark, dirty):
    """The tiers the first dirty-matrix pass missed (review finding):
    banded near-dup (NULL crashed the banded signature kernel), the
    KMeans IVF tier (NULL crashed the fit; NaN elements poisoned the
    centroids), the numpy dot/norm kernels (NULL crashed np.stack
    before the downstream filter could run), and the all-degenerate
    query set (empty-stack AxisError in the scan kernel)."""
    q = dirty.filter(F.col("vec_id").isin(0, 1, 3))
    banded = similarity.embedding_near_dup_banded(
        dirty, threshold=0.5, dims=3, planes_per_table=1, num_tables=2
    ).collect()
    for r in banded:
        assert not ({r["a_id"], r["b_id"]} & _DEGEN), r
    ivf = similarity.ivf_topk(dirty, q, k=3, n_clusters=2, n_probe=2).collect()
    assert ivf
    for r in ivf:
        assert not ({r["query_id"], r["neighbor_id"]} & _DEGEN), r
        assert r["sim"] == r["sim"] and r["sim"] is not None
    for kern in ("numpy",):
        rows = similarity.cosine_topk(dirty, q, k=3, kernel=kern).collect()
        assert rows
        for r in rows:
            assert not ({r["query_id"], r["neighbor_id"]} & _DEGEN), (kern, r)
    # every query degenerate: empty result, no crash
    dq = dirty.filter(F.col("vec_id").isin(0, 3))
    assert similarity.cosine_topk_scan(dirty, dq, k=3).count() == 0
    # NULL query id: silently skipped like the SQL tier
    nq = dirty.filter(F.col("vec_id") == 1).withColumn(
        "vec_id", F.lit(None).cast("long")
    )
    assert similarity.cosine_topk_scan(dirty, nq, k=3).count() == 0


def test_greedy_superset_of_dominated_with_nulls(spark, dirty):
    """Documented invariant: greedy survivors ⊇ dominated survivors —
    including NULL-embedding rows, which the pre-fix greedy silently
    deleted (they never reached the kernel's kept set)."""
    greedy = {r["vec_id"] for r in similarity.semdedup(
        dirty, threshold=0.5, dims=3, planes=1, policy="greedy"
    ).collect()}
    dominated = {r["vec_id"] for r in similarity.semdedup(
        dirty, threshold=0.5, dims=3, planes=1, policy="dominated"
    ).collect()}
    assert dominated <= greedy, (greedy, dominated)
    assert 0 in greedy  # the NULL-embedding row survives


def test_dirty_vectors_semdedup_and_quantize(spark, dirty):
    for policy in ("greedy", "dominated"):
        kept = {r["vec_id"] for r in similarity.semdedup(
            dirty, threshold=0.5, dims=3, planes=1, policy=policy
        ).collect()}
        assert {1, 2} <= kept, policy  # non-dup clean vectors survive
    # quantize drops only the unquantizable (NULL vec, NaN element);
    # the zero vector legitimately quantizes (scale 1, all-zero q)
    qz = {r["vec_id"] for r in similarity.quantize_int8(dirty).collect()}
    assert qz == {1, 2, 4, 6}


def test_semdedup_zero_vector(spark, vecs):
    # a zero vector is never a near-dup of anything, so it SURVIVES
    for policy in ("greedy", "dominated"):
        kept = {
            r["vec_id"]
            for r in similarity.semdedup(
                vecs, threshold=0.9, dims=3, planes=1, policy=policy
            ).collect()
        }
        assert 0 in kept, policy


def test_null_corpus_id_scan_matches_sql_tier(spark, dirty):
    """A NULL corpus id used to reach the scan kernel's int64 cast as
    NaN and abort the whole job, while the SQL tier silently dropped
    the row via its join — breaking the documented 'same answer as
    cosine_topk' contract on degenerate input. Both now drop it."""
    nc = dirty.union(
        spark.createDataFrame([(None, [0.9, 0.1, 0.0])], dirty.schema)
    )
    q = dirty.filter(F.col("vec_id") == 1)
    sql_rows = sorted(
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(nc, q, k=3).collect()
    )
    scan_rows = sorted(
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk_scan(nc, q, k=3).collect()
    )
    assert scan_rows == sql_rows and sql_rows
