"""Round-3 operators: BM25 retrieval, DSIR weighting, CCNet quality
tiers, random projection, deterministic training shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from exporter_spark.operators import retrieval, sampling, similarity, text


# ---------------------------------------------------------------- bm25


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark engine"),
            (3, "pandas only here"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_bm25_orders_by_relevance(spark):
    out = retrieval.bm25_topk(_docs(spark), ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids == [1, 2]  # doc 3/4 have no match -> score 0 -> dropped
    assert out[0]["bm25"] > out[1]["bm25"]  # higher tf wins at similar dl


def test_bm25_k_and_determinism(spark):
    d = _docs(spark)
    one = retrieval.bm25_topk(d, ["spark", "engine"], k=1).collect()
    assert len(one) == 1 and one[0]["doc_id"] == 1
    a = retrieval.bm25_topk(d, ["spark", "engine"], k=10).collect()
    b = retrieval.bm25_topk(d.repartition(7), ["spark", "engine"], k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_no_explode_in_plan(spark):
    """tf/dl are map-side expressions; the plan must not contain a
    Generate (explode) node, and corpus stats must broadcast."""
    plan = retrieval.bm25_scores(
        _docs(spark), ["spark"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    assert "Broadcast" in plan


def test_bm25_empty_terms_rejected(spark):
    with pytest.raises(ValueError):
        retrieval.bm25_scores(_docs(spark), [])


# ---------------------------------------------------------------- dsir


def test_dsir_prefers_target_like_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "en", "alpha beta alpha beta"),
            (2, "en", "alpha beta gamma beta"),
            (3, "de", "zeta omega zeta omega"),
            (4, "de", "alpha beta alpha beta"),  # de doc with en-like tokens
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r["dsir_weight"]
        for r in sampling.dsir_weights(df, F.col("lang") == "en").collect()
    }
    # docs made of target-distribution tokens outrank off-target ones,
    # regardless of their own label
    assert out[1] > out[3]
    assert out[4] > out[3]


def test_dsir_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", f"tok{i % 5} tok{i % 3} common") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    a = sorted(map(tuple, sampling.dsir_weights(df, F.col("lang") == "en").collect()))
    b = sorted(
        map(tuple, sampling.dsir_weights(df.repartition(11), F.col("lang") == "en").collect())
    )
    assert a == b


# ------------------------------------------------------ quality tiers


def test_lm_quality_buckets_tier_shape(spark):
    df = spark.createDataFrame(
        [(i, "en", f"w{i} common common") for i in range(9)]
        + [(100 + i, "de", f"x{i} rare") for i in range(6)],
        "doc_id long, lang string, text string",
    )
    rows = text.lm_quality_buckets(df).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, tiers in by_lang.items():
        assert sorted(t["tier"] for t in tiers) == [1, 2, 3]
        names = {t["tier"]: t["tier_name"] for t in tiers}
        assert names == {1: "head", 2: "middle", 3: "tail"}
        counts = [t["n_docs"] for t in sorted(tiers, key=lambda t: t["tier"])]
        assert max(counts) - min(counts) <= 1  # equal-count tiers
        # head tier has the best (highest) mean LM score
        scores = {t["tier"]: t["avg_lm_score"] for t in tiers}
        assert scores[1] >= scores[2] >= scores[3]


# -------------------------------------------------- random projection


def test_random_projection_deterministic_and_shaped(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 8), (3, [0.0] * 8)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.random_projection(df, 4, 8)
    assert out.columns == ["vec_id", "p0", "p1", "p2", "p3"]
    rows = {r["vec_id"]: (r["p0"], r["p1"], r["p2"], r["p3"]) for r in out.collect()}
    assert rows[1] == rows[2]  # identical vectors -> identical projections
    assert rows[3] == (0.0, 0.0, 0.0, 0.0)


def test_random_projection_matrix_is_pm_one():
    R = similarity.rp_matrix(4, 8)
    assert all(x in (1.0, -1.0) for row in R for x in row)
    # derivation is salted
    assert similarity.rp_matrix(4, 8, "other") != R


def test_random_projection_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    plan = similarity.random_projection(df, 4, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------- training shuffle


def test_training_shuffle_dense_positions(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = sampling.training_shuffle(df).collect()
    assert len(out) == 300
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["pos"])
    for bucket, poss in by_bucket.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert len(by_bucket) > 100  # 300 ids spread over 256 buckets


def test_training_shuffle_seed_and_partitioning(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = sorted(map(tuple, sampling.training_shuffle(df).collect()))
    b = sorted(map(tuple, sampling.training_shuffle(df.repartition(13)).collect()))
    assert a == b  # partitioning-invariant
    c = sorted(map(tuple, sampling.training_shuffle(df, seed="epoch1").collect()))
    assert a != c  # new epoch, new order


# ------------------------------------------------- exact substr spans


def test_exact_substring_spans_basic(spark):
    from exporter_spark.operators import dedup

    shared = "a b c d e"  # 5 tokens, k=3 -> grams at 1,2,3
    df = spark.createDataFrame(
        [
            (1, f"{shared} x y z"),
            (2, f"p q {shared} r"),
            (3, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.exact_substring_spans(df, k=3).collect()
    }
    # doc 1: shared tokens 1..5; doc 2: shared tokens 3..7; doc 3: none
    assert rows[1] == (1, 5, 5)
    assert rows[2] == (3, 7, 5)
    assert 3 not in rows


def test_exact_substring_spans_merges_and_splits(spark):
    from exporter_spark.operators import dedup

    # two duplicated regions far apart in one doc must yield two spans
    dup1, dup2 = "m n o", "u v w"
    df = spark.createDataFrame(
        [
            (1, f"{dup1} f1 f2 f3 f4 f5 {dup2}"),
            (2, f"{dup1} g1 g2 g3 g4 g5 {dup2}"),
        ],
        "doc_id long, text string",
    )
    out = dedup.exact_substring_spans(df, k=3).orderBy("doc_id", "span_start").collect()
    spans = [(r["doc_id"], r["span_start"], r["span_end"]) for r in out]
    assert spans == [(1, 1, 3), (1, 9, 11), (2, 1, 3), (2, 9, 11)]


def test_exact_substring_spans_min_count(spark):
    from exporter_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, "same same same tokens here") for i in range(3)],
        "doc_id long, text string",
    )
    # with min_count=4, three copies are not enough
    assert dedup.exact_substring_spans(df, k=3, min_count=4).count() == 0
    assert dedup.exact_substring_spans(df, k=3, min_count=3).count() == 3


# ---------------------------------------------- temperature mixture


def test_temperature_mixture_flattens_skew(spark):
    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = sampling.temperature_mixture(df, "source", alpha=0.5).groupBy("source").count()
    got = {r["source"]: r["count"] for r in kept.collect()}
    # alpha=0.5: big keeps ~sqrt(100/900)=1/3 of its rows, small keeps all
    assert got["small"] == 100
    assert 240 <= got["big"] <= 360
    # alpha=1 keeps the natural mixture intact
    kept1 = sampling.temperature_mixture(df, "source", alpha=1.0)
    assert kept1.count() == 1000


def test_temperature_mixture_deterministic(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r["doc_id"] for r in sampling.temperature_mixture(df, "source").collect())
    b = sorted(
        r["doc_id"]
        for r in sampling.temperature_mixture(df.repartition(7), "source").collect()
    )
    assert a == b
    assert df.columns == sampling.temperature_mixture(df, "source").columns


def test_strip_duplicate_spans(spark):
    from exporter_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "a b c p q r"),
            (3, "a b c"),  # fully covered -> drops out
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.strip_duplicate_spans(df, k=3).collect()
    }
    assert got == {1: "x y z", 2: "p q r"}


# ------------------------------------------------- degenerate inputs


def test_round3_ops_on_empty_corpus(spark):
    from exporter_spark.operators import dedup

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_src = spark.createDataFrame([], "doc_id long, source string, lang string, text string")
    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")

    assert retrieval.bm25_topk(empty_docs, ["spark"]).count() == 0
    assert sampling.dsir_weights(empty_src, F.col("lang") == "en").count() == 0
    assert sampling.training_shuffle(empty_docs).count() == 0
    assert sampling.temperature_mixture(empty_src, "source").count() == 0
    assert dedup.exact_substring_spans(empty_docs).count() == 0
    assert dedup.strip_duplicate_spans(empty_docs).count() == 0
    assert text.lm_quality_buckets(empty_src).count() == 0
    assert similarity.random_projection(empty_vecs, 4, 8).count() == 0


def test_round3_ops_on_single_doc(spark):
    from exporter_spark.operators import dedup

    one = spark.createDataFrame(
        [(1, "src", "en", "only one document here")],
        "doc_id long, source string, lang string, text string",
    )
    # bm25: single doc, term present -> idf = ln(1 + 0.5/1.5) > 0
    got = retrieval.bm25_topk(one, ["document"]).collect()
    assert len(got) == 1 and got[0]["bm25"] > 0
    # no duplicated grams possible with one doc
    assert dedup.exact_substring_spans(one, k=2).count() == 0
    # ntile over one row: everything is tier 1 (head)
    tiers = text.lm_quality_buckets(one).collect()
    assert len(tiers) == 1 and tiers[0]["tier_name"] == "head"
    assert sampling.temperature_mixture(one, "source").count() == 1


# --------------------------------------------- bigram LM + token budget


def test_bigram_lm_penalizes_scrambled_order(spark):
    # same tokens, different order: the corpus-frequent transition
    # scores higher than the rare one
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "a b a b a b"),
            (3, "b a b a b a"),  # scrambled relative to the majority
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lm2_score"] for r in text.bigram_lm_scores(df).collect()}
    assert got[1] == got[2]
    assert got[1] > got[3]


def test_bigram_lm_skips_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    rows = text.bigram_lm_scores(df).collect()
    assert [r["doc_id"] for r in rows] == [3]
    assert rows[0]["n_bigrams"] == 1


def test_token_budget_select_boundary(spark):
    df = spark.createDataFrame(
        [("en", 1, 10, 5.0), ("en", 2, 10, 4.0), ("en", 3, 10, 3.0),
         ("de", 4, 25, 9.0), ("de", 5, 10, 8.0)],
        "lang string, doc_id long, n_tokens long, score double",
    )
    kept = sampling.token_budget_select(
        df, "lang", [F.col("score").desc(), F.col("doc_id").asc()], "n_tokens", budget=20
    ).collect()
    got = sorted((r["lang"], r["doc_id"], r["cum_tokens"]) for r in kept)
    # en: docs 1,2 fill the budget exactly; doc 3 starts at 20 -> out.
    # de: doc 4 overshoots alone (starts at 0 < 20); doc 5 starts at 25 -> out.
    assert got == [("de", 4, 25), ("en", 1, 10), ("en", 2, 20)]

def test_temperature_mixture_null_keys_participate(spark):
    """Rows with a NULL key must not silently vanish (the inner join
    on the key would drop them); they are coalesced into a sentinel
    bucket and sampled like any other source."""
    rows = [(i, "a") for i in range(50)] + [(100 + i, None) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = sampling.temperature_mixture(df, "source", alpha=1.0)
    # alpha=1 keeps everything — including every NULL-keyed row
    assert kept.count() == 100
    assert kept.filter(F.col("source").isNull()).count() == 50
    assert kept.columns == df.columns

def test_temperature_mixture_sentinel_no_collision(spark):
    """A stored key equal to any sentinel-looking literal stays a
    distinct bucket from genuinely-NULL keys."""
    rows = [(i, "__null__") for i in range(40)] + [(100 + i, None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = sampling.temperature_mixture(df, "source", alpha=1.0)
    assert kept.count() == 80
    assert kept.filter(F.col("source").isNull()).count() == 40
    assert kept.filter(F.col("source") == "__null__").count() == 40
