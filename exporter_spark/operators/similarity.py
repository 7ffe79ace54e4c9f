"""Vector similarity search over embedding columns
(``array<float>``) — SURVEY.md §2.5.

Two tiers:
  * ``cosine_topk`` — exact brute force. The query side is broadcast;
    the corpus is scanned once, map-side, and only (query, k) winners
    leave each partition before the final top-k merge. Correct at any
    corpus size as long as the *query set* is broadcast-able.
  * ``lsh_topk`` — random-hyperplane LSH prefilter + exact re-rank.
    The scale path when the query set is large: candidates meet in
    hash buckets (equi-join shuffle) instead of a cross product.

Arithmetic notes: dot products fold left-to-right over
double-cast elements (F.aggregate), so results are deterministic and
reproducible by the DuckDB oracle; similarities are rounded to 6 dp
to absorb engine-level FP noise in the last bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Ensure ≥ default-parallelism partitions before per-row vector
    math; pass through inputs that are already well-partitioned (no
    shuffle added on the 100 TB path)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, *key_cols) if key_cols else df.repartition(p)
    return df


def dot(a: str, b: str) -> Column:
    """Ordered left fold of the element products, in double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" 0D, (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
            f" 0D, (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, sim, rank); a query is never its
    own neighbor. Ties break by neighbor_id ascending so results are
    total-ordered and oracle-comparable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    c = _spread(emb, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv__")
    )
    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    sims = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine("__qv__", "__cv__"), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hyperplane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1),
    derived from md5(plane:dim). Computed driver-side and inlined as a
    literal, so the identical constant appears in the Spark plan and
    in the DuckDB oracle SQL — no RNG state, no engine hash()."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8]
    return int(h, 16) / 2147483648.0 - 1.0


def lsh_signature_sql(vec_col: str, dims: int, planes: int) -> str:
    """DuckDB replica of the signature: explicit left-associated term
    sums per plane (same fold order as Spark's aggregate(), so the
    doubles — and therefore the sign bits — are identical).
    ``vec_col`` must already be double[] (pass '(embedding::DOUBLE[])'
    — parenthesized, or the [] index binds to the cast type)."""
    bits = []
    for p in range(planes):
        terms = " + ".join(
            f"({vec_col})[{d + 1}] * ({hyperplane_component(p, d)!r})"
            for d in range(dims)
        )
        bits.append(f"(cast(({terms}) > 0 as bigint) * {1 << p})")
    return "(" + " + ".join(bits) + ")"


# Spark side: hyperplanes travel as a broadcast 1-row literal-array
# column (__H__ array<array<double>>), and the signature is a compact
# two-level fold — keeps the expression tree small (a fully inlined
# 64-dim × 8-plane arithmetic expression breaks janino's 64KB method
# limit) while folding in exactly the same left-to-right order as the
# DuckDB oracle's explicit sums.
_SIG_EXPR = (
    "aggregate(sequence(0, {planes} - 1), 0L, (acc, p) -> acc + "
    "shiftleft(cast(aggregate(zip_with({vec}, element_at(__H__, p + 1), "
    "(x, h) -> cast(x as double) * h), 0D, (a, v) -> a + v) > 0 as bigint), p))"
)


def with_lsh_signature(
    df: DataFrame, vec_col: str, dims: int, planes: int, out: str = "__sig__"
) -> DataFrame:
    spark = df.sparkSession
    H = [[hyperplane_component(p, d) for d in range(dims)] for p in range(planes)]
    planes_df = spark.createDataFrame([(H,)], "__H__: array<array<double>>")
    return (
        df.crossJoin(F.broadcast(planes_df))
        .withColumn(out, F.expr(_SIG_EXPR.format(planes=planes, vec=vec_col)))
        .drop("__H__")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 8,
) -> DataFrame:
    """ANN top-k: candidates share an exact LSH signature bucket, then
    exact cosine re-ranks within candidates.

    Recall is tuned by ``planes`` (fewer planes ⇒ bigger buckets ⇒
    higher recall, more compute). Unlike cosine_topk, nothing big is
    broadcast — both sides shuffle on the signature, so this is the
    path when queries are also huge.
    """
    q = with_lsh_signature(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
        ),
        "__qv__",
        dims,
        planes,
    )
    c = with_lsh_signature(
        _spread(emb, id_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv__")
        ),
        "__cv__",
        dims,
        planes,
    )
    joined = c.join(q, ["__sig__"]).filter(F.col("neighbor_id") != F.col("query_id"))
    sims = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine("__qv__", "__cv__"), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans-partition the
    corpus, probe each query's ``n_probe`` nearest centroids, exact
    cosine rerank within the probed cells.

    The scale shape: clustering is a one-time O(corpus) pass (sampled
    KMeans training); per query, only corpus_size × n_probe/n_clusters
    vectors are scored instead of the full corpus. Recall is tuned by
    n_probe. Centroids are tiny and broadcast; the corpus↔assignment
    join is an equi-join on cluster id.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = _spread(emb, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv__"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__feat__"),
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="__feat__").fit(corpus)
    assigned = model.transform(corpus).select(
        "neighbor_id", "__cv__", F.col("prediction").alias("__cell__")
    )

    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "__cell__ int, __centroid__ array<double>",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    # each query's n_probe nearest centroids (tiny cross join: Q × n_clusters)
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "__qv__",
        "__cell__",
        cosine("__qv__", "__centroid__").alias("__csim__"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__csim__").desc(), F.col("__cell__").asc()
    )
    probes = qc.withColumn("__pr__", F.row_number().over(w_probe)).filter(
        F.col("__pr__") <= n_probe
    ).select("query_id", "__qv__", "__cell__")

    cands = probes.join(assigned, "__cell__").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sims = cands.select(
        "query_id", "neighbor_id", F.round(cosine("__qv__", "__cv__"), 6).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dims: int = 64,
    planes: int = 8,
) -> DataFrame:
    """Near-duplicate vectors (cosine ≥ threshold) via LSH bucketing +
    exact verification; returns (a_id, b_id, sim)."""
    s = with_lsh_signature(
        _spread(emb, id_col).select(
            F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__")
        ),
        "__v__",
        dims,
        planes,
    ).repartition("__sig__")  # → ReusedExchange across the self-join
    a = s.alias("a")
    b = s.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__sig__") == F.col("b.__sig__"))
        & (F.col("a.__id__") < F.col("b.__id__")),
    ).select(
        F.col("a.__id__").alias("a_id"),
        F.col("b.__id__").alias("b_id"),
        F.round(
            dot("a.__v__", "b.__v__") / (norm("a.__v__") * norm("b.__v__")), 6
        ).alias("sim"),
    )
    return pairs.filter(F.col("sim") >= threshold)
