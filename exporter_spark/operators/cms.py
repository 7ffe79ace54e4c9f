"""Count-min sketch — fixed-memory frequency estimation for token
statistics at corpus scale (round 17, the CMS half of VERDICT r16
#5's "bloom/CMS sketch store" proposal).

Exact token counting shuffles one key per DISTINCT token — at
web-corpus scale (billions of n-grams) that shuffle dominates the
job. The count-min sketch (Cormode & Muthukrishnan 2005, public)
replaces it with a ``depth x width`` counter grid in FIXED memory:

* update: for each hash row i, ``cell[i][h_i(x)] += w`` — in Spark a
  ``groupBy(row, col)`` whose map-side combine bounds the shuffle by
  ``depth x width`` CELLS per partition, independent of both corpus
  size and distinct-token count;
* estimate: ``min_i cell[i][h_i(x)]`` — never an undercount, over-
  counts only on hash collisions (eps = e/width with probability
  1 - delta = 1 - e^-depth; :func:`cms_params` does the textbook
  sizing);
* the sketch is MERGEABLE (cell-wise sum), so per-increment sketches
  union into a store-side sketch exactly like the Bloom face's
  bitwise OR (:func:`cms_merge`) — the fifth incremental store face,
  composing with the same sidecar flow.

Engine mapping — deterministic and engine-portable by the repo's
md5-only discipline: ``h_i(x) = int(md5(x || ':' || i)[:8 hex], 16)
% width`` (DuckDB: ``('0x' || substr(md5(x || ':' || i), 1, 8))
::BIGINT % w``), so the ``cms_top_tokens`` oracle rebuilds the whole
grid in SQL and the driver value-gates estimates, exact counts and
per-token overcounts — collisions included, not averaged away.

The reference (go-data-exporter/exporter) has no analytics surface;
this module is part of the mandated LLM-pipeline scope extension.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_params(eps: float = 0.001, delta: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: ``(width, depth)`` for an overcount bound of
    ``eps * total_weight`` with probability ``1 - delta`` —
    ``w = ceil(e / eps)``, ``d = ceil(ln(1 / delta))``."""
    if not 0.0 < eps < 1.0:
        raise ValueError("eps must be in (0, 1)")
    if not 0.0 < delta < 1.0:
        raise ValueError("delta must be in (0, 1)")
    return math.ceil(math.e / eps), math.ceil(math.log(1.0 / delta))


def _check_params(depth: int, width: int, family: str = "md5") -> None:
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    if family not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash family {family!r} (md5 | xxhash64)")


def _col_expr(item_col: str, i: int, width: int, family: str) -> Column:
    """Bit position of hash row ``i`` — the repo's two-family
    discipline (operators/dedup.py:hashed_shingles_sql): ``md5`` is
    the ORACLE family (identical hex in any engine, what the
    ``cms_top_tokens`` DuckDB oracle replays); ``xxhash64`` is the
    PRODUCTION family (native JVM codegen, no hex-string
    materialization or conv() parse — the r17 sweep's md5 build wall
    is map-CPU-bound at ~5x the exact agg it replaces, and the hash
    is most of that map work). Same grid bounds and estimate
    guarantees either way; oracle queries stay on md5, and the
    family-pin test keeps both faces honest."""
    if family == "xxhash64":
        return F.expr(f"pmod(xxhash64(concat({item_col}, ':{i}')), {width})")
    if family != "md5":
        raise ValueError(f"unknown hash family {family!r} (md5 | xxhash64)")
    return F.expr(
        f"cast(conv(substring(md5(concat({item_col}, ':{i}')), 1, 8),"
        f" 16, 10) as bigint) % {width}"
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    weight_col: str | None = None,
    *,
    depth: int,
    width: int,
    family: str = "md5",
) -> DataFrame:
    """Build the sketch ``(row int, col bigint, cnt bigint)`` from an
    item frame (one row per OCCURRENCE, or per item with
    ``weight_col``). Only nonzero cells materialize; the shuffle is
    bounded by ``depth x width`` cells per map partition — corpus-
    and vocabulary-size-independent."""
    _check_params(depth, width, family)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _col_expr(item_col, i, width, family).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
        w.alias("__w__"),
    )
    return (
        rows.groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.sum("__w__").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the SAME (depth,
    width): the sketch of the concatenated corpora. This is the
    increment append — delta-sized build, grid-bounded merge, the
    corpus never re-read (the Bloom face's ``bloom_union``, additively)."""
    return (
        a.unionByName(b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    item_col: str,
    *,
    depth: int,
    width: int,
    family: str = "md5",
    broadcast_sketch: bool = True,
    est_col: str = "est_count",
) -> DataFrame:
    """Add ``est_col`` — the count-min estimate ``min_i
    cell[i][h_i(x)]`` — to a candidate frame. The sketch broadcasts
    (<= depth x width cells); the only shuffle is the per-candidate
    regroup. Estimates are never undercounts; a candidate absent
    from the sketched corpus reads 0 only if some row's cell is
    empty (COALESCE 0)."""
    _check_params(depth, width, family)
    posed = candidates.select(
        item_col,
        F.posexplode(
            F.array(
                *[_col_expr(item_col, i, width, family) for i in range(depth)]
            )
        ).alias("__row__", "__col__"),
    )
    s = sketch.select(
        F.col("row").alias("__srow__"),
        F.col("col").alias("__scol__"),
        F.col("cnt").alias("__cnt__"),
    )
    if broadcast_sketch:
        s = F.broadcast(s)
    return (
        posed.join(
            s,
            (F.col("__row__") == F.col("__srow__"))
            & (F.col("__col__") == F.col("__scol__")),
            "left",
        )
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("__cnt__"), F.lit(0).cast("long"))).alias(
                est_col
            )
        )
    )
