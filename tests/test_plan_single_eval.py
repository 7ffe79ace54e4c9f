"""Plan-level guards against the filter-pushdown double-eval trap.

Catalyst pushes a Filter on a freshly-projected column through the
Project, substituting the column's defining expression into the
predicate — so an expensive expression (shingle transform, normalize
regexp, tokenizing split) silently runs twice per row (measured +35%
on the minhash pair pipeline at sf0.1; BASELINE.md records the
bisect). The operators were reworked to cut rows via raw-input
predicates or empty explode arguments instead; these tests pin the
invariant directly: the expensive expression must never appear inside
a Filter node's predicate. (Global occurrence counts are NOT the
invariant — plans legitimately instantiate a pipeline once per join
branch, deduped at runtime by ReusedExchange.)
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from exporter_spark.operators import dedup, text
from exporter_spark.sources.files import load_table


def _filter_lines_with(df, marker: str) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        ln
        for ln in plan.splitlines()
        if re.search(r"\bFilter\b", ln) and marker in ln
    ]


def test_winnow_normalize_not_in_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # normalize_text = trim(regexp_replace(lower(...))); the old
    # char_length Filter re-ran the whole chain per row
    bad = _filter_lines_with(text.winnow_fingerprints(d), "regexp_replace")
    assert not bad, bad


def test_bigram_split_not_in_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bad = _filter_lines_with(text.bigram_lm_scores(d), "split(")
    assert not bad, bad


def test_minhash_shingles_not_in_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    cands = dedup.minhash_candidate_pairs(d, "doc_id", "text")
    bad = _filter_lines_with(cands, "array_distinct")
    assert not bad, bad


def test_span_grams_split_not_in_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    spans = dedup.exact_substring_spans(d, k=10, min_count=2)
    bad = _filter_lines_with(spans, "split(")
    assert not bad, bad


def test_raw_text_guard_drops_short_docs(spark, sf_dir):
    """The minhash short-doc cut must still drop sub-shingle docs
    (now via the cheap raw-text length predicate)."""
    d = load_table(spark, sf_dir, "documents")
    short = d.withColumn("text", F.lit("ab"))  # all below shingle_n=8
    cands = dedup.minhash_candidate_pairs(short, "doc_id", "text")
    assert cands.count() == 0


# ------------------------------------------------------------- cache
# lifecycle: materialize() tracks every persist; cache_scope() owns
# the release (round 5 — the round-4 mid-bench regressions traced to
# never-unpersisted caches accumulating across a 36-entry session).

def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()  # noqa: SLF001


def test_cache_scope_releases_materialized_frames(spark, sf_dir):
    from exporter_spark.operators.partitioning import cache_scope, materialize

    base = _n_cached(spark)
    with cache_scope(blocking=True):
        d = materialize(load_table(spark, sf_dir, "region"))
        d.count()  # populate the cache
        assert _n_cached(spark) >= base + 1
    assert _n_cached(spark) <= base


def test_cache_scope_nests_and_release_is_idempotent(spark, sf_dir):
    from exporter_spark.operators.partitioning import (
        cache_scope,
        materialize,
        release_caches,
    )

    release_caches()  # drain frames tracked by earlier scope-less tests
    base = _n_cached(spark)
    with cache_scope(blocking=True):
        outer = materialize(load_table(spark, sf_dir, "nation"))
        outer.count()
        marks = _n_cached(spark)
        with cache_scope(blocking=True):
            inner = materialize(load_table(spark, sf_dir, "region"))
            inner.count()
            assert _n_cached(spark) == marks + 1
        # inner scope released only its own frame
        assert _n_cached(spark) == marks
    assert _n_cached(spark) <= base
    assert release_caches() == 0  # nothing tracked → no-op


def test_operator_materialize_is_scope_released(spark, sf_dir):
    """A real operator that materializes internally (tf-idf) must
    leave no cached RDDs once the owning scope exits."""
    from exporter_spark.operators.partitioning import cache_scope

    d = load_table(spark, sf_dir, "documents")
    base = _n_cached(spark)
    with cache_scope(blocking=True):
        text.tfidf_top_terms(d).count()
        assert _n_cached(spark) > base  # the tf frame was tracked
    assert _n_cached(spark) <= base


def test_stats_join_back_plans_serve_branches_from_cache(spark, sf_dir):
    """The round-4 scan audit found stats-then-join-back operators
    re-reading AND re-tokenizing the corpus once per branch (bigram LM
    5 scans, pretraining composition 12). materialize() fixed it; this
    pins the plan shape so a refactor can't silently lose the sharing:
    every such query's executed plan must serve >= 2 branches from
    InMemoryTableScan (actual release is owned by cache_scope at
    execution time)."""
    from exporter_spark.operators.partitioning import release_caches
    from exporter_spark.queries import QUERIES

    try:
        # exact_substring_strip left this list in the r17 optimization
        # round: the span-array rewrite made it single-pass (no
        # multi-consumer frame, hence nothing to cache) — its new
        # shape is pinned by test_strip_is_span_array_single_pass
        for name in (
            "dsir_importance_weights",
            "bigram_lm_scores",
            "tfidf_top_terms",
            "conversion_funnel",
        ):
            plan = (
                QUERIES[name].fn(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString()
            )
            n = plan.count("InMemoryTableScan")
            assert n >= 2, f"{name}: {n} InMemoryTableScan branches — " \
                f"the materialize() scan sharing was lost"
    finally:
        release_caches()


def test_strip_is_span_array_single_pass(spark, sf_dir):
    """Pins the r17 span-array shape of exact_substring_strip
    (commit 4fd6682): spans aggregate to ONE array row per spanned
    doc (collect_list), the per-token covered-by-a-span decision is a
    scan-local array lambda, and the corpus-token explode + its
    corpus-sized cache are GONE. A refactor that reintroduces the
    (id, pos, token) posexplode or a cached token frame fails here."""
    from exporter_spark.operators.partitioning import release_caches
    from exporter_spark.queries import QUERIES

    try:
        plan = (
            QUERIES["exact_substring_strip"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("posexplode") == 0, \
            "corpus-token posexplode reintroduced"
        assert plan.count("InMemoryTableScan") == 0, \
            "strip should need no cached frame after the span-array cut"
        assert plan.count("collect_list") >= 1, \
            "span-array aggregation missing"
        assert plan.count("lambdafunction") >= 1, \
            "scan-local covered-by-span lambda missing"
    finally:
        release_caches()


# ------------------------------------------------------------ round 6
# tracker hardening: thread-local scopes, weakref no-scope entries,
# loud checkpoint registration (VERDICT r05 item 5 + ADVICE lows).

def test_cache_scopes_are_thread_isolated(spark, sf_dir):
    """Two concurrent scopes on different threads must each release
    only their OWN frame — a scope exit in one thread can no longer
    unpersist a frame another thread is mid-consuming."""
    import threading

    from exporter_spark.operators.partitioning import cache_scope, materialize

    base = _n_cached(spark)
    both_open = threading.Barrier(2, timeout=60)
    b_done = threading.Event()
    state: dict = {}

    def thread_a():
        with cache_scope(blocking=True):
            d = materialize(load_table(spark, sf_dir, "region"))
            d.count()
            both_open.wait()          # B's frame is also cached now
            assert b_done.wait(60)    # B's scope has exited
            # B released ONLY its own frame; A's survives and serves
            state["after_b_exit"] = _n_cached(spark)
            state["a_rows"] = d.count()

    def thread_b():
        with cache_scope(blocking=True):
            d = materialize(load_table(spark, sf_dir, "nation"))
            d.count()
            both_open.wait()
        b_done.set()

    ta = threading.Thread(target=thread_a)
    tb = threading.Thread(target=thread_b)
    ta.start(); tb.start()
    ta.join(120); tb.join(120)
    assert not ta.is_alive() and not tb.is_alive()
    # after B exited, exactly A's frame remained above the baseline
    assert state["after_b_exit"] == base + 1
    assert state["a_rows"] > 0
    assert _n_cached(spark) <= base  # A's exit released the rest


def test_scopeless_materialize_is_weakly_tracked(spark, sf_dir):
    """Outside any cache_scope the tracker must hold only a weak
    reference: dropping the frame keeps it GC-eligible (no unbounded
    strong-ref accumulation in unscoped long sessions), and a later
    release_caches() treats the dead entry as a no-op."""
    import gc
    import weakref

    from exporter_spark.operators.partitioning import materialize, release_caches

    release_caches()  # drain anything earlier tests left behind
    d = materialize(load_table(spark, sf_dir, "region"))
    ref = weakref.ref(d)
    del d
    gc.collect()
    assert ref() is None, "scope-less tracker kept the frame alive"
    # dead weak entry: must not raise, and must NOT be counted as a
    # release (round-6 ADVICE: counting dead no-ops as 'processed'
    # made skipped releases invisible to callers)
    assert release_caches() == 0
    # the JVM-side CacheManager entry is the CALLER's to drop in the
    # unscoped case (the documented tradeoff) — drop it here so it
    # can't be repopulated by a later test's identical plan
    load_table(spark, sf_dir, "region").unpersist(True)


def test_track_checkpoint_rejects_non_checkpointed_frames(spark, sf_dir):
    """Registration must fail loudly when the frame is not
    checkpoint-backed — otherwise the release silently no-ops and the
    storage leak the tracker exists to fix returns without signal."""
    import pytest as _pytest

    from exporter_spark.operators.partitioning import track_checkpoint

    plain = load_table(spark, sf_dir, "region")  # analyzed plan: relation
    with _pytest.raises(TypeError, match="LogicalRDD"):
        track_checkpoint(plain)
    # and the positive case still registers + releases cleanly
    from exporter_spark.operators.partitioning import cache_scope

    base = _n_cached(spark)
    with cache_scope(blocking=True):
        ck = track_checkpoint(plain.localCheckpoint())
        assert ck.count() > 0
    assert _n_cached(spark) <= base


def test_scopeless_track_checkpoint_releasable_while_frame_held(spark, sf_dir):
    """Round-6 review regression guard: outside any scope the weak
    entry must target the FRAME, not the _CheckpointHandle wrapper —
    a weakref to the freshly-made handle dies at registration, and
    release_caches() would silently no-op while the caller still
    holds the checkpointed frame (the exact storage leak the tracker
    exists to prevent)."""
    from exporter_spark.operators.partitioning import (
        release_caches,
        track_checkpoint,
    )

    release_caches()
    base = _n_cached(spark)
    ck = track_checkpoint(load_table(spark, sf_dir, "region").localCheckpoint())
    assert ck.count() > 0
    assert _n_cached(spark) > base
    released = release_caches(blocking=True)  # caller still holds ck
    assert released >= 1
    assert _n_cached(spark) <= base, "checkpoint blocks not released"


# ------------------------------------------------------------ round 7
# spread() probe: partition count must come from the physical plan's
# own (cached) RDD, never the df.rdd property — .rdd builds a fresh
# javaToPython serialization plan on every call, pure driver overhead
# multiplied across every operator invocation (VERDICT r06 note 2).

def test_spread_probe_avoids_df_rdd():
    import ast
    import inspect

    from exporter_spark.operators import partitioning

    src = inspect.getsource(partitioning.spread)
    fn = ast.parse(src).body[0]
    rdd_attrs = [
        n.attr for n in ast.walk(fn)
        if isinstance(n, ast.Attribute) and n.attr == "rdd"
    ]
    assert not rdd_attrs, "spread() regressed to the df.rdd probe"


def test_spread_widens_narrow_input_and_passes_wide_through(spark, sf_dir):
    from exporter_spark.operators.partitioning import spread

    p = spark.sparkContext.defaultParallelism

    def n_parts(df):
        return df._jdf.queryExecution().toRdd().getNumPartitions()  # noqa: SLF001

    narrow = load_table(spark, sf_dir, "nation")  # single parquet file
    assert n_parts(narrow) < p
    assert n_parts(spread(narrow)) == p
    # keyed spread replaces the downstream exchange on the same key
    assert n_parts(spread(narrow, "n_nationkey")) == p

    wide = spark.range(0, 1000, 1, p * 2)  # already well-partitioned
    assert spread(wide) is wide, "wide input must pass through untouched"


# ------------------------------------------------------------ round 8
# release_caches contract hardening (ADVICE r07): (a) the return value
# counts only ACTUAL releases — a logged unpersist failure must not
# inflate it; (b) resolve() may itself touch the JVM (it rebuilds a
# _CheckpointHandle, whose __init__ re-validates the analyzed plan via
# Py4J), so a dead gateway must be swallowed there too, preserving the
# documented 'safe to call at any time / session may already be gone'
# contract.

def test_release_caches_does_not_count_failed_unpersist():
    from exporter_spark.operators import partitioning
    from exporter_spark.operators.partitioning import release_caches

    release_caches()  # drain anything earlier tests left behind

    class _FailingFrame:
        def unpersist(self, blocking=False):
            raise RuntimeError("simulated dead session")

    partitioning._TRACKER.entries.append(_FailingFrame())
    assert release_caches() == 0, (
        "a failed unpersist was counted as a release"
    )
    assert not partitioning._TRACKER.entries


def test_release_caches_survives_resolve_raising():
    """A weak checkpoint entry resolved after the JVM gateway is gone
    raises from _CheckpointHandle.__init__ — release_caches must log
    and continue, not propagate (the finally-block caller in
    cache_scope would otherwise mask the original exception)."""
    from exporter_spark.operators import partitioning
    from exporter_spark.operators.partitioning import (
        _WeakEntry,
        release_caches,
    )

    release_caches()

    class _GatewayGoneEntry(_WeakEntry):
        def __init__(self):  # no referent needed
            pass

        def resolve(self):
            raise RuntimeError("Py4J gateway is shut down")

    partitioning._TRACKER.entries.append(_GatewayGoneEntry())
    assert release_caches() == 0  # must not raise, must not count
    assert not partitioning._TRACKER.entries


def test_ngram_jaccard_guard_shares_the_join_exchange(spark, sf_dir):
    """VERDICT r08 watch item: the max_block guard computes a
    count-over-Window partitioned by __blk__ immediately before the
    block-key self-join. Spark satisfies the SortMergeJoin's
    distribution requirement with the Window's OWN exchange, so the
    guard must add ZERO extra shuffles: exactly one
    hashpartitioning(__blk__) exchange per self-join side. If a
    Catalyst change ever inserts a second block-key exchange above
    the Window, the guard silently doubles the pipeline's largest
    shuffle — this pins that it can't."""
    d = load_table(spark, sf_dir, "documents")
    df = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", "lang", threshold=0.5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    blk_exchanges = len(
        re.findall(r"Exchange hashpartitioning\(__blk__", plan)
    )
    assert blk_exchanges == 2, (
        f"expected 2 block-key exchanges (one per self-join side), "
        f"found {blk_exchanges}:\n"
        + "\n".join(
            ln for ln in plan.splitlines() if "Exchange" in ln
        )
    )
    # and the guard's Window sits directly on that exchange (no
    # intervening exchange between Window and its block-key shuffle)
    lines = plan.splitlines()
    guard_windows = 0
    for i, ln in enumerate(lines):
        if "Window" in ln and "__bn__" in ln:
            guard_windows += 1
            below = "\n".join(lines[i + 1 : i + 4])
            assert "hashpartitioning(__blk__" in below, (
                "guard Window no longer fed by the block-key "
                f"exchange:\n{below}"
            )
    # the loop must actually have verified something — if the guard's
    # Window vanishes or __bn__ is renamed, fail instead of silently
    # passing an empty check (one Window per self-join side expected)
    assert guard_windows >= 1, (
        "no 'Window ... __bn__' line found — the max_block guard "
        "Window is gone or renamed; update this sentinel with it"
    )
