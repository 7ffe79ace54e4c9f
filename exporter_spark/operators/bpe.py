"""Distributed BPE merge learning — tokenizer training as Spark
aggregations.

Every pretraining corpus trains its tokenizer FROM the corpus, so a
100 TB pipeline needs merge learning that runs where the data lives.
The reference (go-data-exporter/exporter) has no tokenizer support;
this module is part of the mandated LLM-pipeline scope extension.

Algorithm (byte-pair encoding, Sennrich et al. 2016, public):

1. One corpus-size pass rolls text up to the DISTINCT-WORD frequency
   table — by Zipf's law orders of magnitude smaller than the corpus
   (the only stage whose shuffle scales with corpus bytes; the
   iterations below never touch the corpus again).
2. Each word is a symbol sequence, initially its characters. Per
   merge iteration: count adjacent symbol pairs weighted by word
   frequency (shuffle bounded by the DISTINCT-PAIR count, map-side
   combined), take the single top pair (count desc, pair asc — a
   total order, so the learned table is deterministic), and rewrite
   every word's sequence with that pair fused.

Engine mapping — the whole loop is JVM-side (zero Python UDFs):

* A word's symbol sequence is a string with single boundary spaces
  and DOUBLE interior separators (``"bpe"`` → ``" b  p  e "``).
  Symbols are drawn from ``[a-z]+`` words, so spaces never collide
  with symbol bytes.
* Pair extraction: ``split`` → ``transform(sequence(...))`` over
  adjacent indices → ``explode`` → ``groupBy(lhs, rhs)`` — all
  whole-stage-codegen expressions.
* The merge rewrite is ``F.replace(rep, " l  r ", " lr ")``: literal,
  left-to-right, non-overlapping. The double interior separator is
  load-bearing: the pattern consumes ONE space on each side and the
  replacement restores it, so a run like ``" a  a  a  a "`` matches
  at both positions in one pass (→ ``[aa, aa]``) — exactly the
  textbook greedy left-to-right merge scan, which a single-space
  encoding cannot reproduce (adjacent matches would share the middle
  space and the second occurrence would be skipped, yielding
  ``[aa, a, a]``). ANSI/DuckDB ``replace`` has identical semantics,
  which is what makes a pure-SQL oracle for the learned table
  possible (``queries/text_quality.py:bpe_merges_learned``).
* Iteration control is driver-side Pregel-style: one job per merge,
  one ROW back per merge (the learned merge itself) — never the data.

Pair COUNTS are overlapping adjacent occurrences (the classic
``get_stats``); the REWRITE is non-overlapping. Both engines implement
both halves identically, so oracle hashes match bit-for-bit.

Scale posture (SCALE.md round-16 note): per-iteration shuffle is the
distinct-pair count — independent of corpus size once the word table
is built; the plan deepens by one crossJoin+agg per merge, so
``checkpoint_every`` truncates lineage with ``localCheckpoint`` for
production vocab sizes (32k merges ≈ 32k stages is real work on any
engine; the per-iteration cost here is one pass over DISTINCT WORDS,
not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Lowercased alphabetic words, extracted by SPLITTING on non-letter
# runs (4.7x faster than regexp_extract_all in Spark's regex engine;
# the oracle mirrors it with regexp_split_to_array + list_filter).
# Keeps the symbol alphabet disjoint from the space separator by
# construction.
WORD_SPLIT_PATTERN = "[^a-z]+"

_PAIRS_EXPR = (
    "transform(sequence(1, size(syms) - 1),"
    " i -> struct(syms[i-1] AS lhs, syms[i] AS rhs))"
)


def word_frequencies(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """The corpus-size pass: ``(rep, freq)`` distinct-word table where
    ``rep`` is the separator-encoded character sequence
    (``" b  p  e  "`` — single leading space, double interior; see the
    module docstring for why double). Everything after this pass is
    corpus-size-independent."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), WORD_SPLIT_PATTERN)).alias("w")
    ).where(F.col("w") != "")
    freqs = words.groupBy("w").agg(F.count("*").alias("freq"))
    if min_freq > 1:
        freqs = freqs.where(F.col("freq") >= min_freq)
    return freqs.select(
        F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1  ")).alias("rep"),
        "freq",
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the word table, frequency-weighted:
    ``(lhs, rhs, cnt)``. Overlapping occurrences all count (classic
    BPE ``get_stats``); map-side combine bounds the shuffle by the
    distinct-pair count per partition."""
    syms = F.filter(F.split("rep", " "), lambda x: x != F.lit(""))
    return (
        words.withColumn("syms", syms)
        # single-symbol (fully merged) words have no pairs; the filter
        # also dodges Spark's DESCENDING sequence(1, 0) == [1, 0]
        # (DuckDB's range(1, 1) is empty — engines differ here)
        .where(F.size("syms") >= 2)
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "freq")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_pair(words: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Rewrite every word with (lhs, rhs) fused — the textbook greedy
    left-to-right merge scan, expressed as one ANSI ``replace`` (the
    double-separator encoding makes the two equivalent; see module
    docstring). Map-only."""
    return words.select(
        F.replace(
            "rep", F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} ")
        ).alias("rep"),
        "freq",
    )


def select_disjoint(candidates, k: int):
    """Greedy top-k SYMBOL-DISJOINT pair selection from an ordered
    (cnt desc, lhs, rhs) candidate list: a pair is taken only if
    neither of its symbols appears in an already-taken pair. Merging
    pair A can only change the count of pairs sharing one of A's
    symbols (an " a  b " rewrite touches no other symbol's
    adjacencies), so every selected pair's count — and the rewrite
    itself — is EXACT within the round; the chained application
    equals applying the selected pairs sequentially in selection
    order."""
    taken: list = []
    used: set[str] = set()
    for row in candidates:
        if len(taken) >= k:
            break
        lhs, rhs = row["lhs"], row["rhs"]
        if lhs in used or rhs in used:
            continue
        taken.append(row)
        used.update((lhs, rhs))
    return taken


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    *,
    min_freq: int = 1,
    checkpoint_every: int = 0,
    batch_k: int = 1,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a text corpus; returns the
    merge table ``(merge_rank, lhs, rhs, pair_count)`` in learned
    order. Deterministic: ties on count break by (lhs, rhs)
    ascending, and counts are exact integers.

    Iterative control flow is driver-side in the Pregel style: each
    round runs ONE job (pair count → top candidates) over the cached
    word table and brings back the learned merges themselves — O(k)
    rows, never the data. Chaining the sort-limits into a single lazy
    plan instead re-evaluates every prior round's subtree (O(k^2)
    passes; measured 34s vs ~2s for k=8 at sf0.01).

    ``batch_k > 1`` is the production-vocab path: each round applies
    the top ``batch_k`` SYMBOL-DISJOINT pairs in one rewrite pass
    (:func:`select_disjoint`), cutting the round count — and the
    number of Spark jobs — by up to ``batch_k``x (32k merges ≈ 64
    rounds at batch_k=512 instead of 32k). Within a round the
    disjointness rule keeps every applied count exact and makes the
    chained rewrite equal to sequential application in selection
    order; ACROSS rounds the selection uses round-start counts, so
    ranks 2..k of a round may differ from what strict one-at-a-time
    BPE would pick next (the standard batched-BPE approximation —
    ``batch_k=1`` IS strict textbook BPE, and the
    ``bpe_merges_learned`` oracle entry pins that path).

    ``checkpoint_every > 0`` truncates plan lineage with
    ``localCheckpoint`` every that-many rounds — pair it with
    ``batch_k`` for production vocab sizes."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if batch_k < 1:
        raise ValueError("batch_k must be >= 1")
    spark = df.sparkSession

    def _release(d: DataFrame | None) -> None:
        # a superseded table must leave executor storage NOW, not at
        # the nondeterministic ContextCleaner: unpersist() handles the
        # cache-manager entry, and the analyzed-plan RDD unpersist
        # frees localCheckpoint blocks, which DataFrame.unpersist does
        # NOT touch (round-16 review: one full word-table copy stayed
        # pinned per checkpoint interval — ~320 copies at production
        # sizing. Same hygiene as dedup.connected_components.)
        if d is None:
            return
        d.unpersist()
        try:
            d._jdf.queryExecution().analyzed().rdd().unpersist(False)  # noqa: SLF001
        except Exception:  # noqa: BLE001 — best-effort hygiene
            pass

    words = word_frequencies(df, text_col, min_freq=min_freq).cache()
    prev = None
    rows: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(rows) < n_merges:
        rounds += 1
        want = min(batch_k, n_merges - len(rows))
        # over-fetch so greedy disjoint selection can skip conflicts
        # (each taken pair blocks at most its two symbols; 4x + 16 is
        # comfortably past the worst case at small k, and a short
        # round just means one extra round)
        fetch = want if want == 1 else 4 * want + 16
        top = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(fetch)
            .collect()
        )
        if prev is not None:
            # this round's candidate job materialized the current
            # table, so the predecessor can go
            _release(prev)
            prev = None
        picked = select_disjoint(top, want)
        if not picked:
            break  # alphabet fully merged before n_merges
        nxt = words
        for row in picked:
            lhs, rhs = row["lhs"], row["rhs"]
            rows.append((len(rows) + 1, lhs, rhs, int(row["cnt"])))
            nxt = merge_pair(nxt, lhs, rhs)
        prev, words = words, nxt.cache()
        if checkpoint_every and rounds % checkpoint_every == 0:
            ck = words.localCheckpoint(eager=True)
            _release(words)
            words = ck
    _release(words)
    _release(prev)
    return spark.createDataFrame(
        rows, "merge_rank int, lhs string, rhs string, pair_count bigint"
    )


def apply_bpe(
    df: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Tokenize with a learned merge table: adds a ``bpe_tokens``
    ``array<string>`` column. The merge table is collected to the
    driver (it is vocab-sized by contract — tens of kB even at 32k
    merges) and applied as a chain of JVM ``replace`` expressions in
    learned order over each word's sentinel-spaced form."""
    table = [
        (r["lhs"], r["rhs"])
        for r in merges.orderBy("merge_rank").select("lhs", "rhs").collect()
    ]
    words = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT_PATTERN),
        lambda x: x != F.lit(""),
    )

    def _encode_one(w):
        r = F.concat(F.lit(" "), F.regexp_replace(w, "(.)", "$1  "))
        for lhs, rhs in table:
            r = F.replace(r, F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} "))
        return F.filter(F.split(F.trim(r), " "), lambda x: x != F.lit(""))

    return df.withColumn(
        "bpe_tokens",
        F.flatten(F.transform(words, _encode_one)),
    )


def bpe_encode_table(
    words: DataFrame, merges: DataFrame, word_col: str = "w"
) -> DataFrame:
    """Encode a DISTINCT-word table once: ``(word_col, bpe_toks
    array<string>)``. The same sentinel-spaced replace chain as
    :func:`apply_bpe`, applied to each word exactly once — the
    dictionary half of :func:`apply_bpe_dict`, exposed because the
    common 100 TB consumers (token counting, packing, vocab stats)
    aggregate at token level and never need per-document arrays: they
    join word OCCURRENCES to this table and skip the reassembly
    shuffle entirely (see ``queries/text_quality.py:
    bpe_encoded_token_stats`` — though the oracle-gated entry runs
    the per-occurrence chain face, with the two faces parity-pinned
    in tests/test_bpe.py)."""
    table = [
        (r["lhs"], r["rhs"])
        for r in merges.orderBy("merge_rank").select("lhs", "rhs").collect()
    ]
    rep = F.concat(
        F.lit(" "), F.regexp_replace(F.col(word_col), "(.)", "$1  ")
    )
    for lhs, rhs in table:
        rep = F.replace(rep, F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} "))
    toks = F.filter(F.split(F.trim(rep), " "), lambda x: x != F.lit(""))
    return words.select(F.col(word_col), toks.alias("bpe_toks"))


def apply_bpe_dict(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
) -> DataFrame:
    """:func:`apply_bpe`'s production-vocab twin: identical
    ``bpe_tokens`` output (parity-pinned in tests/test_bpe.py), but
    each DISTINCT word is encoded ONCE via :func:`bpe_encode_table`
    and occurrences are dictionary-joined, instead of running the
    merge chain on every occurrence.

    Why a twin exists: the chain face is map-only (no shuffle at all)
    but builds one Catalyst ``replace`` expression per merge — fine at
    the tens-of-merges scale the oracle entry pins, unworkable at a
    32k-merge production vocab (expression-tree depth). This face
    prices the vocab work at distinct-words x merges (Zipf-small) and
    pays instead one occurrence-level shuffle to reassemble per-row
    arrays. Consumers that don't need per-row arrays should use
    :func:`bpe_encode_table` directly and skip that shuffle too.

    ``id_col``: a unique row key, used to reassemble rows. Pass one
    whenever the data has it (any real corpus does). ``None`` falls
    back to ``monotonically_increasing_id`` over a re-partition-stable
    base — correct for deterministic file scans, but the documented
    contract prefers an explicit key."""
    rid = "__bpe_rid__"
    words_arr = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT_PATTERN),
        lambda x: x != F.lit(""),
    )
    base = df.withColumn(
        rid,
        F.col(id_col) if id_col is not None else F.monotonically_increasing_id(),
    ).withColumn("__bpe_words__", words_arr)
    occ = base.select(
        rid, F.posexplode("__bpe_words__").alias("__bpe_pos__", "__bpe_w__")
    )
    dic = bpe_encode_table(
        occ.select(F.col("__bpe_w__").alias("w")).distinct(), merges
    )
    enc = (
        occ.join(dic, occ["__bpe_w__"] == dic["w"])
        .groupBy(rid)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__bpe_pos__", "bpe_toks"))
                    ),
                    lambda s: s["bpe_toks"],
                )
            ).alias("__bpe_toks__")
        )
    )
    empty = F.array().cast("array<string>")
    return (
        base.join(enc, rid, "left")
        .withColumn(
            "bpe_tokens",
            F.when(F.col("__bpe_words__").isNull(), F.lit(None).cast("array<string>"))
            .otherwise(F.coalesce(F.col("__bpe_toks__"), empty)),
        )
        .drop(rid, "__bpe_words__", "__bpe_toks__")
    )
