"""Shared partitioning helpers for the operator modules."""

from __future__ import annotations

import contextlib
from typing import Iterator

from pyspark.sql import DataFrame

# Every frame materialize() persists, in creation order. Persist is
# lazy and the cached frame is consumed when the CALLER executes the
# returned plan, so the operator that created it can never unpersist
# it safely — ownership has to sit with whoever forces the plan.
# cache_scope()/release_caches() are that owner: without them a long
# session (the driver's 36-entry bench, a real multi-job cluster)
# accumulates MEMORY_AND_DISK entries from every dsir/tfidf/LM/strip/
# funnel call until LRU pressure evicts them mid-job — measured as the
# round-4 mid-bench slowdown cluster (VERDICT r04 §Performance).
# Entries are DataFrames (from materialize) or _CheckpointHandles
# (from track_checkpoint) — anything with .unpersist(blocking).
# Process-global and NOT thread-safe by design: the tracker mirrors
# Spark's driver-side single-plan-builder usage. Concurrent job
# submission from multiple driver threads should serialize plan
# BUILDING (execution may overlap freely), or scope each thread's
# builds with its own release_caches(from_index=...) watermark.
_LIVE_CACHES: list = []


def release_caches(*, blocking: bool = False, from_index: int = 0) -> int:
    """Unpersist every frame materialize() has tracked since
    ``from_index`` (default: all of them). Returns how many were
    released. Safe to call at any time — releasing before the plan
    runs merely costs the re-scan the cache would have saved."""
    n = 0
    while len(_LIVE_CACHES) > from_index:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist(blocking)
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
        n += 1
    return n


class _CheckpointHandle:
    """Duck-typed tracker entry for a (local)checkpointed frame:
    ``unpersist`` releases the block-backed RDD underneath the
    LogicalRDD. After release the frame CANNOT be recomputed (its
    lineage was truncated at checkpoint time), so the handle must be
    released only after the consuming plan has executed — which is
    exactly the cache_scope exit contract."""

    def __init__(self, df: DataFrame) -> None:
        self._df = df

    def unpersist(self, blocking: bool = False) -> None:
        rdd = self._df._jdf.queryExecution().analyzed().rdd()  # noqa: SLF001
        rdd.unpersist(blocking)


def track_checkpoint(df: DataFrame) -> DataFrame:
    """Register a checkpointed frame with the cache tracker so the
    owning cache_scope() releases its blocks. localCheckpoint blocks
    otherwise linger until the ContextCleaner notices the RDD is
    unreferenced — nondeterministic, and a storage-pressure source in
    long sessions (each connected_components call used to leave its
    edges + final-labels blocks behind)."""
    _LIVE_CACHES.append(_CheckpointHandle(df))  # type: ignore[arg-type]
    return df


@contextlib.contextmanager
def cache_scope(*, blocking: bool = False) -> Iterator[None]:
    """Owns the lifecycle of every materialize() cache created inside
    the ``with`` block: build the plan, force it, and the caches are
    unpersisted on exit. Nests correctly — an inner scope releases
    only its own frames. This is what bench.py and the oracle tests
    wrap each query in, so a 36-entry session holds at most one
    query's worth of cached data at a time."""
    mark = len(_LIVE_CACHES)
    try:
        yield
    finally:
        release_caches(blocking=blocking, from_index=mark)


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Ensure at least default-parallelism partitions before heavy
    map-side work. A small dimension table (or a single parquet file)
    arrives as 1 partition and would serialize the whole
    hash/shingle/vector pipeline onto one core; a table that's
    already well-partitioned (the 100 TB case) passes through
    untouched — no extra shuffle. When key columns are given the
    spread hashes on them, so it REPLACES the downstream exchange on
    the same key instead of adding one.

    Streaming DataFrames pass through untouched: ``.rdd`` cannot be
    introspected on them, and micro-batches are already split by the
    source.
    """
    if df.isStreaming:
        return df
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, *key_cols) if key_cols else df.repartition(p)
    return df


def materialize(df: DataFrame) -> DataFrame:
    """Persist a frame that multiple downstream branches will consume.

    Spark cannot share a scan between plan branches: every branch of a
    stats-then-join-back pipeline (vocabulary + total + score join,
    bucket distributions + weight join, span detection + strip)
    otherwise re-reads the corpus and re-tokenizes it — a round-4
    audit measured the bigram LM at FIVE full corpus scans per run
    with zero ReusedExchange. MEMORY_AND_DISK persist (not
    localCheckpoint) is deliberate: it spills instead of OOMing and
    KEEPS lineage, so an executor loss on a 1000-node run recomputes
    the lost blocks instead of failing the job.

    Lifecycle: the persisted frame is registered in a module-level
    list; the caller that forces the final plan releases it via
    ``cache_scope()`` (or ``release_caches()``). The operator itself
    cannot unpersist — persist is lazy and the cache is only consumed
    when the returned plan executes, after this function has returned.

    Streaming frames pass through untouched (persist is a batch-only
    concept)."""
    if df.isStreaming:
        return df
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_CACHES.append(df)
    return df
