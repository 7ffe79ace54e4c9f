"""Deduplication (operators/dedup.py over documents).

Split out of the monolithic queries.py in round 15; registration
order within this module is unchanged (see queries/__init__.py for
the cross-module order and the driver-window contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exporter_spark.operators import dedup, incremental
from exporter_spark.queries._registry import _dsum, _register
from exporter_spark.sources.files import load_table

# =====================================================================
# Deduplication (operators/dedup.py over documents)
# =====================================================================


@_register(
    "dedup_exact_docs",
    """
    SELECT doc_id, lang, source FROM documents
    QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
)
def dedup_exact_docs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, ["text"], "doc_id").select("doc_id", "lang", "source")


_MINHASH = dict(num_hashes=32, bands=8, shingle_n=8, threshold=0.7)


def _minhash_ctes(src: str = "documents", p: str = "") -> str:
    """The sh → hs → sigs → banded → cands → verified CTE chain over
    ``src``, every CTE name prefixed with ``p`` so two instantiations
    can coexist in one WITH (the incremental oracle runs the chain
    over both the store half and the delta half). ONE copy — the
    plain batch oracle below is this chain with default arguments, so
    an edit here cannot decouple the two."""
    n = _MINHASH["shingle_n"]
    rows = _MINHASH["num_hashes"] // _MINHASH["bands"]
    prime = dedup._MERSENNE
    shingle = (
        f"CASE WHEN length(text) < {n} THEN [] "
        f"ELSE list_distinct(list_transform(generate_series(1, length(text) - {n - 1}),"
        f" i -> substr(text, i, {n}))) END"
    )
    # DuckDB twin of dedup.hashed_shingles_sql + minhash_over: one
    # md5-derived base hash per shingle, then the (a*h + b) mod 2^31-1
    # affine family with the SAME seeded coefficients as the Spark side.
    base = f"list_transform(sh, s -> ('0x' || substr(md5(s),1,15))::BIGINT % {prime})"
    sig = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {prime}))"
        for a, b in dedup._minhash_coeffs(_MINHASH["num_hashes"])
    )
    bands = list(range(_MINHASH["bands"]))
    return f"""{p}sh AS (SELECT doc_id, {shingle} AS sh FROM {src}),
    {p}hs AS (SELECT doc_id, {base} AS hs FROM {p}sh),
    {p}sigs AS (SELECT doc_id, [{sig}] AS sig FROM {p}hs),
    {p}banded AS (
      SELECT doc_id, sig, b.band,
             md5(array_to_string(list_transform(sig[(b.band * {rows} + 1):(b.band * {rows} + {rows})], x -> x::VARCHAR), '|')) AS bhash
      FROM {p}sigs, UNNEST({bands}) AS b(band)),
    {p}cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM {p}banded a JOIN {p}banded b
        ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
    {p}verified AS (
      SELECT a_id, b_id,
             ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
                   (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
      FROM {p}cands JOIN {p}sh sa ON sa.doc_id = a_id JOIN {p}sh sb ON sb.doc_id = b_id)"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_ctes()}
    SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= {_MINHASH["threshold"]}
    """


@_register("minhash_near_dup_pairs", _minhash_oracle())
def minhash_near_dup_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(d, "doc_id", "text", **_MINHASH)


_NGRAM = dict(shingle_n=8, threshold=0.6)


@_register(
    "ngram_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, lang, n_chars // 100 AS len_band,
             CASE WHEN length(text) < {_NGRAM["shingle_n"]} THEN []
                  ELSE list_distinct(list_transform(
                    generate_series(1, length(text) - {_NGRAM["shingle_n"] - 1}),
                    i -> substr(text, i, {_NGRAM["shingle_n"]}))) END AS sh
      FROM documents)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang IS NOT DISTINCT FROM b.lang
     AND a.len_band IS NOT DISTINCT FROM b.len_band
     AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= {_NGRAM["threshold"]}
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    # NULL lang / NULL n_chars get explicit sentinel tokens so the
    # blocking key is injective per (lang, band) under IS NOT DISTINCT
    # FROM semantics — concat_ws alone SKIPS NULLs, which would let a
    # NULL-lang doc's key collide with a numeric lang value's key.
    d = load_table(spark, sf_dir, "documents").withColumn(
        "blk",
        F.concat_ws(
            "|",
            F.coalesce(F.col("lang"), F.lit("\x00null")),
            F.coalesce(
                (F.col("n_chars") / 100).cast("int").cast("string"),
                F.lit("\x00null"),
            ),
        ),
    )
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", "blk", shingle_n=_NGRAM["shingle_n"],
        threshold=_NGRAM["threshold"],
    )


# Transitive closure of the minhash pair graph — the SQL mirror of
# the iterative min-label propagation in
# operators.dedup.connected_components. ONE copy, composed (after a
# `WITH RECURSIVE pairs AS (...)` head) by every oracle that builds
# on components, so an edit here cannot silently decouple them.
# Parameterized (round 11) the same way as _minhash_ctes: the
# incremental oracle needs TWO component closures (store half, delta
# half) in one WITH RECURSIVE.
def _cc_sql(pairs: str = "pairs", p: str = "") -> str:
    return f"""{p}edges AS (SELECT a_id AS s, b_id AS d FROM {pairs}
              UNION SELECT b_id, a_id FROM {pairs}),
    {p}reach(id, r) AS (
      SELECT s, s FROM {p}edges
      UNION
      SELECT e.s, r.r FROM {p}edges e JOIN {p}reach r ON e.d = r.id
    ),
    {p}comp AS (SELECT id, MIN(r) AS component FROM {p}reach GROUP BY id)"""


_CC_SQL = _cc_sql()


def _dedup_clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    {_CC_SQL}
    SELECT id, component FROM comp
    """


@_register("dedup_clusters", _dedup_clusters_oracle())
def dedup_clusters(spark, sf_dir):
    """Near-dup clustering: minhash pairs → connected components
    (iterative label propagation vs the oracle's recursive CTE)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(d, "doc_id", "text", **_MINHASH)
    return dedup.connected_components(pairs).select("id", "component")


def _minhash_survivors_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    {_CC_SQL}
    SELECT d.doc_id, d.lang, d.source FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM comp c WHERE c.id = d.doc_id AND c.component <> c.id)
    """


@_register("minhash_dedup_survivors", _minhash_survivors_oracle())
def minhash_dedup_survivors(spark, sf_dir, stats=None):
    """The deduplicated corpus itself: per near-dup cluster keep the
    canonical (minimum-id) member, pass untouched documents through.
    Composes minhash LSH pairs → connected components → anti join on
    the non-canonical id set (ids only — AQE broadcasts it while it
    fits, falls back to a shuffled anti join when a 100 TB corpus's
    duplicate set doesn't).

    ``stats``: optional dict, forwarded to ``connected_components`` —
    after execution it carries ``rounds`` (label-propagation rounds to
    converge). bench.py records it so component-diameter growth on a
    future corpus shows up in BENCH history before it shows up in
    wall time (VERDICT r08 item 7). The driver calls
    ``fn(spark, sf_dir)``; the default is behavior-identical."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(d, "doc_id", "text", **_MINHASH)
    clusters = dedup.connected_components(pairs, stats=stats)
    drop = clusters.filter(F.col("id") != F.col("component")).select("id")
    return d.join(drop, d["doc_id"] == drop["id"], "left_anti").select(
        "doc_id", "lang", "source"
    )


# ---- incremental (delta-vs-store) dedup — operators/incremental.py.
# The registry split is an md5-hash split of doc_id (engine-portable:
# md5 of the decimal id string), NOT a modulo/range split, so
# generator-planted near-dup clusters land members on BOTH sides and
# the against-store path is genuinely exercised. The store half
# bootstraps the store; the delta half runs against it.

_INC_SPLIT_SPARK = "substring(md5(cast(doc_id as string)), 1, 1) < '8'"
_INC_SPLIT_DUCK = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'"


def _inc_exact_oracle() -> str:
    return f"""
    WITH store_kept AS (
      SELECT DISTINCT text FROM documents WHERE {_INC_SPLIT_DUCK}),
    delta_kept AS (
      SELECT doc_id, lang, source, text FROM documents
      WHERE NOT ({_INC_SPLIT_DUCK})
      QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1)
    SELECT k.doc_id, k.lang, k.source FROM delta_kept k
    WHERE NOT EXISTS (
      SELECT 1 FROM store_kept s WHERE s.text IS NOT DISTINCT FROM k.text)
    """


@_register("incremental_exact_survivors", _inc_exact_oracle())
def incremental_exact_survivors(spark, sf_dir):
    """Delta-vs-store exact dedup (operators/incremental.py:136): the
    store half bootstraps a sha256 digest store; the delta half is
    deduped within itself (keep-first by doc_id) and anti-joined
    against the store on the digest. The oracle replays both stages
    on text directly — content_digest is injective on (NULL-tagged)
    text, so digest-set membership ≡ text-set membership under
    IS NOT DISTINCT FROM. At 100 TB only 64-char digests shuffle."""
    d = load_table(spark, sf_dir, "documents")
    split = F.expr(_INC_SPLIT_SPARK)
    _, store = incremental.incremental_exact_dedup(
        d.filter(split), ["text"], "doc_id"
    )
    surv, _ = incremental.incremental_exact_dedup(
        d.filter(~split), ["text"], "doc_id", seen_digests=store
    )
    return surv.select("doc_id", "lang", "source")


def _inc_minhash_oracle() -> str:
    nh = _MINHASH["num_hashes"]
    thr = _MINHASH["threshold"]
    return f"""
    WITH RECURSIVE
    store_docs AS (
      SELECT doc_id, text FROM documents WHERE {_INC_SPLIT_DUCK}),
    delta_docs AS (
      SELECT doc_id, lang, source, text FROM documents
      WHERE NOT ({_INC_SPLIT_DUCK})),
    {_minhash_ctes("store_docs", "s_")},
    s_pairs AS (SELECT a_id, b_id FROM s_verified WHERE jaccard >= {thr}),
    {_cc_sql("s_pairs", "s_")},
    store_banded AS (
      SELECT b.doc_id, b.sig, b.band, b.bhash
      FROM s_banded b JOIN s_sh ss ON ss.doc_id = b.doc_id
      WHERE len(ss.sh) > 0
        AND NOT EXISTS (SELECT 1 FROM s_comp c
                        WHERE c.id = b.doc_id AND c.component <> c.id)),
    {_minhash_ctes("delta_docs", "d_")},
    d_pairs AS (SELECT a_id, b_id FROM d_verified WHERE jaccard >= {thr}),
    {_cc_sql("d_pairs", "d_")},
    delta_surv AS (
      SELECT d.doc_id, d.lang, d.source FROM delta_docs d
      WHERE NOT EXISTS (SELECT 1 FROM d_comp c
                        WHERE c.id = d.doc_id AND c.component <> c.id)),
    matched AS (
      SELECT DISTINCT nb.doc_id
      FROM d_banded nb
      JOIN d_sh ns ON ns.doc_id = nb.doc_id
      JOIN delta_surv ds ON nb.doc_id = ds.doc_id
      JOIN store_banded ob ON nb.band = ob.band AND nb.bhash = ob.bhash
      WHERE len(ns.sh) > 0
        AND len(list_filter(generate_series(1, {nh}),
                            i -> nb.sig[i] = ob.sig[i]))::DOUBLE / {nh} >= {thr})
    SELECT ds.doc_id, ds.lang, ds.source FROM delta_surv ds
    WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.doc_id = ds.doc_id)
    """


@_register("incremental_minhash_survivors", _inc_minhash_oracle())
def incremental_minhash_survivors(spark, sf_dir):
    """Delta-vs-store near-dup dedup (operators/incremental.py:229):
    the store half bootstraps a signature store (its own batch-run
    survivors' minhash signatures — no text); the delta half runs the
    full in-batch pipeline, then its survivors are banded against the
    stored signatures and dropped on lane agreement ≥ threshold. The
    oracle replays the whole thing in DuckDB — both halves' LSH +
    exact-Jaccard + recursive-CTE components, band keys recomputed by
    array slicing from the stored signatures, and the lane-agreement
    estimate as a generate_series filter over paired sig lanes — so
    the driver value-gates the one surface round 10 left pytest-only
    (VERDICT r10 item 1)."""
    from exporter_spark.operators.partitioning import materialize

    d = load_table(spark, sf_dir, "documents")
    split = F.expr(_INC_SPLIT_SPARK)
    _, store = incremental.incremental_minhash_dedup(
        d.filter(split), "doc_id", "text", **_MINHASH
    )
    # The store must be PINNED data: chaining a live signature
    # lineage would let Catalyst's project collapse inline the whole
    # 32-lane minhash expression into every one of the 8 band slices
    # (the round-4 double-eval trap, 8-fold: measured 51s vs 6s at
    # sf0.1). The bootstrap return is materialize()d by the operator
    # since the round-11 review; this explicit pin is kept as the
    # entry's own guard so an operator-side change cannot silently
    # reintroduce the inlining (persist on an already-persisted frame
    # is a no-op).
    store = materialize(store)
    surv, _ = incremental.incremental_minhash_dedup(
        d.filter(~split), "doc_id", "text", store, **_MINHASH
    )
    return surv.select("doc_id", "lang", "source")


# Bloom screen literals for the oracle entry: small enough that the
# sf0.01 increment produces OBSERVABLE false positives (m=1024 bits,
# k=2 over ~250 store digests -> ~38% fill, ~15% FP rate), large
# enough that the arithmetic is non-trivial. Production sizing comes
# from bloom_params() instead (~10 bits/doc).
_BLOOM_BITS = 1024
_BLOOM_K = 2

# The screen entry dedups on a document-HEAD fingerprint (first 64
# chars) rather than full text: the synthetic corpus has zero exact
# full-text dups (all 500 texts distinct), but its planted near-dup
# clusters share heads across the md5 doc_id split — so head-keying
# gives the store probe real cross-increment matches (confirmed_dup
# > 0 at sf0.01) AND leaves observable false positives, exercising
# every branch of the accounting. Head/prefix keys are also a real
# dedup mode (boilerplate-lead and truncated-mirror detection).
_HEAD_LEN = 64

# content_digest(["text_head"]) replica: sha256 over the NULL-tagged
# length-prefixed encoding (operators/dedup.py:65)
_DIGEST_DUCK = (
    f"sha256(CASE WHEN text IS NULL THEN 'n:'"
    f" ELSE 'v' || length(substr(text, 1, {_HEAD_LEN})) || ':'"
    f" || substr(text, 1, {_HEAD_LEN}) END)"
)


def _inc_bloom_oracle() -> str:
    m, k = _BLOOM_BITS, _BLOOM_K
    idx = ", ".join(str(i) for i in range(k))
    return f"""
    WITH dg AS (
      SELECT doc_id, source, {_DIGEST_DUCK} AS digest,
             ({_INC_SPLIT_DUCK}) AS in_store
      FROM documents),
    store_digests AS (SELECT DISTINCT digest FROM dg WHERE in_store),
    bloom AS (
      SELECT pos // 32 AS block,
             bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS mask
      FROM (SELECT ('0x' || substr(md5(digest || ':' || i), 1, 8))::BIGINT
                     % {m} AS pos
            FROM store_digests, UNNEST([{idx}]) AS t(i))
      GROUP BY 1),
    delta_kept AS (
      SELECT doc_id, source, digest FROM dg WHERE NOT in_store
      QUALIFY ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) = 1),
    probe AS (
      SELECT d.digest,
             ('0x' || substr(md5(d.digest || ':' || i), 1, 8))::BIGINT
               % {m} AS pos
      FROM (SELECT DISTINCT digest FROM delta_kept) d,
           UNNEST([{idx}]) AS t(i)),
    hits AS (
      SELECT p.digest,
             MIN(CASE WHEN b.mask IS NOT NULL
                       AND ((b.mask >> CAST(p.pos % 32 AS INT)) & 1) = 1
                      THEN 1 ELSE 0 END) = 1 AS maybe
      FROM probe p LEFT JOIN bloom b ON b.block = p.pos // 32
      GROUP BY 1),
    flags AS (
      SELECT d.doc_id, d.source, h.maybe,
             EXISTS (SELECT 1 FROM store_digests s
                     WHERE s.digest = d.digest) AS confirmed
      FROM delta_kept d JOIN hits h ON h.digest = d.digest),
    delta_counts AS (
      SELECT source, COUNT(*)::BIGINT AS delta_rows
      FROM dg WHERE NOT in_store GROUP BY 1)
    SELECT c.source, c.delta_rows,
           COUNT(f.doc_id)::BIGINT AS batch_kept,
           COALESCE(SUM(CASE WHEN f.maybe THEN 1 ELSE 0 END), 0)::BIGINT
             AS bloom_maybe,
           COALESCE(SUM(CASE WHEN f.confirmed THEN 1 ELSE 0 END), 0)::BIGINT
             AS confirmed_dup,
           COALESCE(SUM(CASE WHEN f.maybe AND NOT f.confirmed
                        THEN 1 ELSE 0 END), 0)::BIGINT AS bloom_fp,
           COALESCE(SUM(CASE WHEN NOT f.confirmed THEN 1 ELSE 0 END),
                    0)::BIGINT AS survivors
    FROM delta_counts c LEFT JOIN flags f ON f.source = c.source
    GROUP BY 1, 2
    ORDER BY 1
    """


@_register("incremental_bloom_stats", _inc_bloom_oracle())
def incremental_bloom_stats(spark, sf_dir):
    """The Bloom membership screen for incremental dedup
    (operators/bloom.py, round 17): the store half bootstraps a
    digest store keyed on the 64-char document head (``_HEAD_LEN``
    note above — the key with real cross-half matches in this
    corpus), the delta half is screened by an md5-derived
    1024-bit/2-hash Bloom filter rebuilt from it, maybes are
    confirmed against the exact store, and the per-source accounting
    — delta rows, in-batch kept, bloom maybes, confirmed dups,
    observable FALSE POSITIVES, survivors — is emitted. The oracle
    rebuilds the filter bit-for-bit in SQL (bit positions are md5
    literals, blocks are bit_or-folded 32-bit masks), so the driver
    value-gates the screen itself, FP count included — not just the
    screened outcome. Survivor parity with the exact face is pinned
    separately in tests/test_bloom.py."""
    from exporter_spark.operators import bloom

    d = load_table(spark, sf_dir, "documents").withColumn(
        "text_head", F.substring("text", 1, _HEAD_LEN)
    )
    split = F.expr(_INC_SPLIT_SPARK)
    _, store = incremental.incremental_exact_dedup(
        d.filter(split), ["text_head"], "doc_id"
    )
    return bloom.bloom_screen_stats(
        d.filter(~split),
        ["text_head"],
        "doc_id",
        store,
        "source",
        num_bits=_BLOOM_BITS,
        num_hashes=_BLOOM_K,
    ).orderBy("source")


def _simhash_oracle(max_hamming: int = 3, num_tables: int = 4) -> str:
    """DuckDB replica of dedup.simhash32 + the pigeonhole chunk join:
    per token, 32 bits of md5 ('0x'||hex → BIGINT); each bit votes ±1
    into its lane; fingerprint = sign vector; candidates share an
    exact 8-bit chunk. Tokenless docs get fingerprint 0 (the UDF
    returns 0 for them), hence the LEFT JOIN + COALESCE."""
    lanes = ", ".join(
        f"SUM(2 * ((h >> {b}) & 1) - 1) AS l_{b}" for b in range(32)
    )
    fp_expr = " + ".join(f"((l_{b} > 0)::BIGINT << {b})" for b in range(32))
    chunk_bits = 32 // num_tables
    tbls = ", ".join(str(i) for i in range(num_tables))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS t
      FROM documents
    ),
    hv AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM toks
    ),
    lanes AS (SELECT doc_id, {lanes} FROM hv GROUP BY doc_id),
    fps AS (
      SELECT d.doc_id, COALESCE({fp_expr}, 0) AS fp
      FROM documents d LEFT JOIN lanes l ON d.doc_id = l.doc_id
    ),
    chunks AS (
      SELECT doc_id, fp, tbl,
             (fp >> (tbl * {chunk_bits})) & {(1 << chunk_bits) - 1} AS chunk
      FROM fps, (SELECT unnest([{tbls}]) AS tbl)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
      FROM chunks a JOIN chunks b
        ON a.tbl = b.tbl AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= {max_hamming}
    """


@_register("simhash_near_dup_pairs", _simhash_oracle())
def simhash_near_dup_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_dup_pairs(d, "doc_id", "text", max_hamming=3)
    return pairs.select(
        "a_id", "b_id", F.col("hamming").cast("long").alias("hamming")
    )


