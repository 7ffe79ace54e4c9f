"""Deterministic sampling & corpus-curation operators.

A training-data pipeline needs reproducible row selection: the same
document must land in the same split on every run, on any cluster
layout, regardless of partitioning. Spark's ``df.sample`` is
seed-stable only for a fixed partitioning, so everything here derives
selection from a content hash instead — md5 of (salt, id), first 32
bits as a uniform integer. Pure column expressions: selection adds
ZERO shuffles and survives any repartitioning; only ``cap_per_key``
shuffles (one exchange on the quota key, which is inherent to a
per-key quota). Every primitive (md5, substring, hex→int) exists in
ANSI SQL, so all of these are oracle-comparable.

Reference has no sampling surface (it exports what the query returns,
/root/reference/scanner/scanner.go); these are the extension operators
a 100 TB curation pipeline layers on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^32: the hash below is uniform on [0, 2^32)
_HASH_SPACE = 1 << 32


def hash32(col: Column, salt: str) -> Column:
    """Deterministic uniform hash in [0, 2^32): first 8 hex chars of
    md5(salt || value). Engine-portable (DuckDB:
    ``('0x' || substr(md5(salt || v), 1, 8))::BIGINT``)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def _threshold(fraction: float) -> int:
    return int(fraction * _HASH_SPACE)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = "sample"
) -> DataFrame:
    """Keep ~fraction of rows, selected by content hash: reproducible
    across runs, partitionings, and engines. No shuffle — the filter
    pushes into the scan stage."""
    return df.filter(hash32(F.col(id_col), salt) < _threshold(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    *,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 10% of English, all of Basque). Strata absent from
    ``fractions`` are dropped. Still zero-shuffle: one hash, one
    CASE-threshold compare."""
    thr = F.lit(-1)  # unknown strata: below any hash ⇒ dropped
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_threshold(frac))
        ).otherwise(thr)
    return df.filter(hash32(F.col(id_col), salt) < thr)


def train_test_split(
    df: DataFrame,
    id_col: str,
    *,
    test_fraction: float = 0.2,
    salt: str = "tts",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'train' or 'test' by content hash — the split is
    stable under reruns and data reshuffles, so no document ever
    migrates between splits. Zero-shuffle column append."""
    is_test = hash32(F.col(id_col), salt) < _threshold(test_fraction)
    return df.withColumn(
        split_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def cap_per_key(
    df: DataFrame, key_col: str, n: int, order_by: list[Column]
) -> DataFrame:
    """Quota sampling: at most ``n`` rows per key, best-first by
    ``order_by`` (give it a total order — ties must break
    deterministically). One shuffle on the key; with AQE, skewed keys
    split automatically since each group only needs its own top-n."""
    w = Window.partitionBy(key_col).orderBy(*order_by)
    return (
        df.withColumn("__qr__", F.row_number().over(w))
        .filter(F.col("__qr__") <= n)
        .drop("__qr__")
    )


def rebalance_to_mixture(
    df: DataFrame,
    key_col: str,
    id_col: str,
    weights: dict[str, float],
    *,
    salt: str = "mix",
) -> DataFrame:
    """Deterministically downsample to a target key mixture (e.g. a
    language distribution for training). ``weights`` are relative
    shares; the operator computes the LARGEST total M every key can
    supply (M = min over keys of n_k / w_k), then hash-selects
    accept_k = (w_k · M) / n_k of each key — the argmin key keeps
    everything, the rest downsample to match. Keys absent from
    ``weights`` (or with weight 0) are dropped.

    Scale shape: two dimension-sized aggregations (per-key counts and
    their global min) broadcast back onto the corpus; the 100 TB side
    sees one broadcast join and one hash filter — no corpus shuffle,
    and the selection is reproducible across runs, partitionings and
    engines (same md5 selection as deterministic_sample).
    """
    w = F.lit(None).cast("double")
    for key, share in sorted(weights.items()):
        w = F.when(F.col(key_col) == key, F.lit(float(share))).otherwise(w)
    counts = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("__n__"))
        .withColumn("__w__", w)
        .filter(F.col("__w__") > 0)
    )
    m = counts.agg(F.min(F.col("__n__") / F.col("__w__")).alias("__m__"))
    accept = counts.crossJoin(F.broadcast(m)).select(
        key_col,
        ((F.col("__w__") * F.col("__m__")) / F.col("__n__")).alias("__accept__"),
    )
    thr = F.floor(F.col("__accept__") * F.lit(float(_HASH_SPACE))).cast("long")
    return (
        df.join(F.broadcast(accept), key_col)
        .filter(hash32(F.col(id_col), salt) < thr)
        .select(*df.columns)
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    *,
    budget: int = 2048,
    streams: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """GPT-style sequence packing: lay documents end-to-end in a
    deterministic content-hash order and cut the concatenation into
    fixed ``budget``-token training chunks. Returns one row per
    (document, chunk) intersection:

      id_col      — the document
      stream      — independent packing lane (hash-assigned)
      chunk       — chunk ordinal within the stream
      off_in_doc  — first token of the slice, offset within the doc
      off_in_chunk— where the slice lands inside the chunk
      n_toks      — slice length (a doc longer than ``budget``
                    spans several chunks; a short doc shares its
                    chunk with its hash-neighbors)

    Every chunk except the last of each stream is exactly full — the
    concat-and-chunk packing used for LLM pretraining (zero padding),
    not first-fit binning (which would leave per-bin tails and needs
    a sequential scan anyway).

    Scale shape: ``streams`` independent lanes, each a window cumsum
    over its own hash-ordered run — ONE shuffle on stream, no global
    sort, no driver state. Streams are hash-balanced, so lane skew is
    O(1/sqrt(docs per lane)); raise ``streams`` with corpus size (it
    only widens the shuffle). Zero-token docs are dropped (they have
    no span). Integer-only arithmetic end to end, so the mapping is
    reproducible bit-for-bit in any engine (DuckDB oracle replays the
    same window + generate_series)."""
    toks = tokens_col.cast("long")
    h = hash32(F.col(id_col), salt)
    d = (
        df.select(F.col(id_col), toks.alias("__t__"), h.alias("__h__"))
        .filter(F.col("__t__") > 0)
        .withColumn("__stream__", (F.col("__h__") % streams).cast("int"))
    )
    w = (
        Window.partitionBy("__stream__")
        .orderBy("__h__", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("__start__", F.sum("__t__").over(w) - F.col("__t__"))
    b = F.lit(budget).cast("long")
    # `div` is exact integer division (double `/` + cast would wobble
    # once a lane's cumulative token count nears 2^53)
    first = F.expr(f"__start__ div {budget}")
    last = F.expr(f"(__start__ + __t__ - 1) div {budget}")
    e = c.withColumn("chunk", F.explode(F.sequence(first, last)))
    lo = F.greatest(F.col("__start__"), F.col("chunk") * b)
    hi = F.least(F.col("__start__") + F.col("__t__"), (F.col("chunk") + 1) * b)
    return e.select(
        F.col(id_col),
        F.col("__stream__").alias("stream"),
        F.col("chunk"),
        (lo - F.col("__start__")).alias("off_in_doc"),
        (lo - F.col("chunk") * b).alias("off_in_chunk"),
        (hi - lo).alias("n_toks"),
    )


def dsir_weights(
    df: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169) with hashed unigram features: estimate a target
    and a raw feature distribution over ``buckets`` hash buckets, then
    weight each document by the mean log-ratio of its tokens' buckets.
    ``target_pred`` marks the in-domain rows (e.g. lang = 'en').
    Returns (id_col, n_tokens, dsir_weight); documents whose tokens
    look like the target distribution score high, and resampling by
    this weight tilts a 100 TB crawl toward the target domain.

    Determinism: bucket counts are integers; the per-bucket log-ratio
    uses ln with Laplace (+1 over buckets) smoothing and the per-doc
    mean is decimal-staged then rounded to 6 dp (same recipe as
    unigram_lm_scores).

    Scale shape: ONE token explode collapsing map-side into
    (doc, bucket) counts — at most ``buckets`` rows per document ever
    shuffle, never tokens. Bucket distributions re-aggregate those
    counts; the tiny log-ratio table broadcasts back; the per-doc
    mean weighs counts (decimal × integer, exact — bit-identical to
    per-token staging). No vocabulary-sized state anywhere — the hash
    bucketing is what makes DSIR run at corpus scale.
    """
    toks = df.select(
        F.col(id_col),
        target_pred.cast("long").alias("__t__"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("__tok__"),
    ).withColumn("__b__", hash32(F.col("__tok__"), salt) % buckets)
    # Pre-aggregate to (doc, bucket) counts: the token stream is
    # exploded ONCE, everything downstream — including the bucket
    # distributions — derives from this ≤ docs×buckets row frame, so
    # the doc-keyed shuffle carries bucket counts, not tokens.
    # Materialized (it is the BOUNDED small frame): the distribution
    # branch and the weight join would otherwise each re-scan and
    # re-tokenize the corpus.
    from exporter_spark.operators.partitioning import materialize

    db = materialize(
        toks.groupBy(id_col, "__b__").agg(
            F.count("*").alias("__n__"), F.max("__t__").alias("__t__")
        )
    )
    # db is consumed twice (bucket distribution + final join) and the
    # differing column pruning defeats exchange reuse, so the explode
    # runs twice — the same two passes as the paper's estimator; at
    # cluster scale, cache db or checkpoint it if the scan dominates.
    bt = db.groupBy("__b__").agg(
        F.sum("__n__").alias("__cr__"),
        F.sum(F.col("__n__") * F.col("__t__")).alias("__ct__"),
    )
    tot = bt.agg(
        F.sum("__cr__").alias("__tr__"), F.sum("__ct__").alias("__tt__")
    )
    lr = bt.crossJoin(F.broadcast(tot)).select(
        "__b__",
        (
            F.log((F.col("__ct__") + F.lit(1.0)) / (F.col("__tt__") + F.lit(float(buckets))))
            - F.log((F.col("__cr__") + F.lit(1.0)) / (F.col("__tr__") + F.lit(float(buckets))))
        ).alias("__lr__"),
    )
    # decimal-staged lr × integer count is exact, so the sum equals
    # the per-token staging bit-for-bit (and so does the oracle's)
    term = F.col("__lr__").cast("decimal(18,9)") * F.col("__n__").cast(
        "decimal(18,0)"
    )
    return (
        db.join(F.broadcast(lr), "__b__")
        .groupBy(id_col)
        .agg(
            F.sum("__n__").alias("n_tokens"),
            F.round(
                F.sum(term).cast("double") / F.sum("__n__"),
                6,
            ).alias("dsir_weight"),
        )
    )


def training_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    content-derived shuffle key md5(seed:id), a bucket (first key
    byte, 256 of them), and a dense position within its bucket.
    Global order = (bucket, pos) — reproducible across runs, engines,
    partitionings, and epochs (vary ``seed``).

    Scale shape: NO global sort. The only shuffle is the 256-way
    window partition; each bucket sorts independently (~1/256 of the
    corpus) and readers stream buckets in order. This is the standard
    scalable substitute for ORDER BY rand(seed), which would funnel
    100 TB through one total-order range exchange."""
    key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    out = df.select(
        F.col(id_col),
        key.alias("shuffle_key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("shuffle_key", id_col)
    return out.withColumn("pos", F.row_number().over(w))


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    *,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the alpha-temperature
    source reweighting of Gopher/PaLM-style data recipes): keep each
    key's rows with probability proportional to cnt^(alpha-1),
    normalized so the smallest source keeps everything when alpha<1 —
    flattening the source distribution toward uniform as alpha -> 0
    while alpha=1 keeps the natural mix. Selection is the engine's
    deterministic content-hash rule, so the kept set is reproducible
    across runs, engines, and partitionings.

    Determinism: the one libm call (pow) is rounded to 6 dp before the
    integer threshold is formed (floor of an exact power-of-two
    scaling), so the hash cut-off is integer-identical everywhere.

    Scale shape: one tiny per-key count aggregate (map-side partial),
    its ~|keys|-row threshold table broadcast back, and a map-side
    filter — the corpus itself never shuffles.

    NULL keys: rows with a NULL ``key_col`` are folded into their own
    bucket for counting and thresholding, so they participate in the
    mixture deterministically instead of being dropped by the join (an
    inner join on a NULL key never matches). Real keys are prefixed
    ("k:<value>") so no stored value can collide with the NULL bucket's
    token.
    """
    orig_cols = list(df.columns)
    df = df.withColumn(
        "__tmkey__",
        F.when(F.col(key_col).isNull(), F.lit("\x00null")).otherwise(
            F.concat(F.lit("k:"), F.col(key_col).cast("string"))
        ),
    )
    key_col = "__tmkey__"
    counts = df.groupBy(key_col).agg(F.count("*").alias("__cnt__"))
    w = counts.withColumn(
        "__w__", F.pow(F.col("__cnt__").cast("double"), F.lit(alpha - 1.0))
    )
    mx = w.agg(F.max("__w__").alias("__mx__"))
    thr = w.crossJoin(F.broadcast(mx)).select(
        key_col,
        F.col("__cnt__"),
        F.floor(
            F.round(F.col("__w__") / F.col("__mx__"), 6) * F.lit(float(_HASH_SPACE))
        )
        .cast("long")
        .alias("__thr__"),
    )
    return (
        df.join(F.broadcast(thr), key_col)
        .filter(hash32(F.col(id_col), salt) < F.col("__thr__"))
        .select(*orig_cols)
    )


def token_budget_select(
    df: DataFrame,
    key_col: str,
    order_by: list[Column],
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Budget-constrained selection: walk each key's rows in
    ``order_by`` order (give it a total order) and keep rows that
    START before the per-key token ``budget`` is exhausted — so the
    budget is always reached or slightly overshot by one document,
    never undershot. Appends ``cum_tokens`` (inclusive running sum).

    Scale shape: one window cumsum per key partition — a single
    exchange on ``key_col``; no global sort, no driver state. This is
    how a data recipe takes "the best N billion tokens per language"
    from a scored corpus."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return df.withColumn("cum_tokens", cum).filter(
        F.col("cum_tokens") - F.col(tokens_col) < budget
    )
