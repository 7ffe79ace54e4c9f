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
