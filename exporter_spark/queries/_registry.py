"""Registry plumbing shared by every query module.

``QUERIES`` preserves insertion order — the driver's correctness
window is the FIRST 50 entries, so the per-pillar modules are
imported by ``exporter_spark.queries`` in a fixed order and the
window contract there re-orders the dict once all are registered.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over pre-registered views, or None


QUERIES: dict[str, Query] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: QueryFn):
        QUERIES[name] = Query(fn, oracle)
        return fn

    return deco


def _dsum(col, scale: int):
    """Order-independent float sum: decimal-cast terms, exact decimal
    add, result back to double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
