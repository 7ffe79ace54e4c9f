"""Shared partitioning helpers for the operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
    the lost blocks instead of failing the job. The cache is LRU — a
    long session evicts cold entries; callers that own the lifecycle
    can ``unpersist()`` the returned frame when done.

    Streaming frames pass through untouched (persist is a batch-only
    concept)."""
    if df.isStreaming:
        return df
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)
