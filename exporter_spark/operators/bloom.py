"""Bloom-filter membership screen for the incremental dedup store
family (round 17, VERDICT r16 #5).

The incremental family's three store faces (sha256 digest, minhash
signature, pHash — operators/incremental.py, operators/phash.py) all
carry EXACT stores: ~32 bytes/doc for digests. At 10^12 documents
that is ~32 TB of store — cheap to append, but every increment must
probe it, and even the never-shuffle broadcast-delta discipline still
SCANS the store once per increment. The standard fix (Bloom, 1970;
every warehouse's runtime row-filter) is a bits-only membership
sketch in front of the exact store:

* ~10 bits/doc (m = 10n, k = 2..7 hashes) instead of 256 — a 25x
  smaller structure that an executor can hold in memory across
  increments;
* NO false negatives by construction, so screening can never drop a
  genuinely-new document;
* false positives only COST a probe: the maybe-set — typically a few
  permille of the delta — is then confirmed against the exact store,
  so survivors are IDENTICAL to the exact face's
  (``incremental_bloom_dedup`` below is a drop-in for
  ``incremental_exact_dedup``, probing the SAME digest store);
* when an increment's maybe-set is empty, AQE's empty-relation
  propagation collapses the confirm join and the exact store is
  never scanned at all — the common case for append-mostly corpora;
* the sketch is INCREMENTAL for free: a Bloom filter of a union is
  the bitwise OR of the filters, so appending an increment is
  delta-sized work OR-merged into a blocks-sized table
  (:func:`bloom_union`) — the store itself is never re-read.

Engine mapping — deterministic and engine-portable by construction
(the repo's md5-only hash discipline):

* bit positions of digest d: ``int(md5(d || ':' || i)[:8 hex], 16)
  % num_bits`` for i in 0..k-1 — DuckDB spells it
  ``('0x' || substr(md5(d || ':' || i), 1, 8))::BIGINT % m``, so an
  oracle can rebuild the filter bit-for-bit in SQL
  (``queries/dedup.py:incremental_bloom_stats``);
* the filter is a DataFrame of 32-bit blocks ``(block, mask)`` —
  ``block = pos div 32``, ``mask = bit_or(1 << (pos % 32))`` — all
  whole-stage-codegen expressions, masks strictly positive so BIGINT
  semantics agree across engines (no 1<<63 sign edge);
* build shuffle is bounded by ``num_bits/32`` blocks x map
  partitions (map-side bit_or combine), independent of store size;
  probe shuffle is delta-sized (the blocks table broadcasts).

The reference (go-data-exporter/exporter) has no dedup surface; this
module is part of the mandated LLM-pipeline scope extension.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from exporter_spark.operators.dedup import content_digest, exact_dedup
from exporter_spark.operators.incremental import DIGEST_COL
from exporter_spark.operators.partitioning import materialize

BLOCK_BITS = 32  # positive masks in both engines' signed BIGINT


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: ``(num_bits, num_hashes)`` for an expected
    item count and target false-positive rate — ``m = -n ln p /
    (ln 2)^2`` rounded up to a full block, ``k = (m/n) ln 2`` (>= 1).
    At p=0.01 that is ~9.6 bits and 7 hashes per item; the default
    registry entry pins small literals instead so the oracle SQL
    stays readable."""
    if n_items < 1:
        raise ValueError("n_items must be >= 1")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + BLOCK_BITS - 1) // BLOCK_BITS) * BLOCK_BITS
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions(digest_col: str, num_bits: int, num_hashes: int) -> Column:
    """``array<bigint>`` of the k bit positions for one digest —
    md5-derived, engine-portable (module docstring)."""
    return F.array(
        *[
            F.expr(
                f"cast(conv(substring(md5(concat({digest_col}, ':{i}')),"
                f" 1, 8), 16, 10) as bigint) % {num_bits}"
            )
            for i in range(num_hashes)
        ]
    )


def _check_params(num_bits: int, num_hashes: int) -> None:
    if num_bits < BLOCK_BITS:
        raise ValueError(f"num_bits must be >= {BLOCK_BITS}, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")


def bloom_build(
    digests: DataFrame,
    digest_col: str = DIGEST_COL,
    *,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Build the blocks table ``(block int, mask bigint)`` from a
    digest frame. Map-side ``bit_or`` combine bounds the shuffle by
    ``num_bits/32`` blocks per map partition — store-size-independent.
    Blocks with no set bit are absent (probes treat absent as
    all-zero)."""
    _check_params(num_bits, num_hashes)
    return (
        digests.select(
            F.explode(
                _positions(digest_col, num_bits, num_hashes)
            ).alias("__pos__")
        )
        .groupBy(F.expr("cast(__pos__ div 32 as int)").alias("block"))
        .agg(
            F.expr(
                "bit_or(shiftleft(1L, cast(__pos__ % 32 as int)))"
            ).alias("mask")
        )
    )


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two blocks tables built with the SAME (num_bits,
    num_hashes): the filter of the union of their digest sets. This
    is the increment append: build a delta-sized filter, union it
    into the persisted one — the digest store is never re-read. The
    parquet sidecar flow mirrors ``append_digest_increment``
    (operators/incremental.py): write the merged blocks table
    atomically next to the digest store."""
    return (
        a.unionByName(b)
        .groupBy("block")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_might_contain(
    digests: DataFrame,
    bloom: DataFrame,
    digest_col: str = DIGEST_COL,
    *,
    num_bits: int,
    num_hashes: int,
    broadcast_bloom: bool = True,
) -> DataFrame:
    """Screen a digest frame: adds ``__bloom_maybe__`` (true iff all
    k bits are set — i.e. "possibly in the set the filter was built
    from"; false is DEFINITE absence). The blocks table broadcasts
    (<= num_bits/32 rows); the only shuffle is the per-digest
    regroup, bounded by the probe size at any store scale."""
    _check_params(num_bits, num_hashes)
    posed = digests.select(
        digest_col,
        F.explode(_positions(digest_col, num_bits, num_hashes)).alias(
            "__pos__"
        ),
    )
    b = bloom.select(
        F.col("block").alias("__block__"), F.col("mask").alias("__mask__")
    )
    if broadcast_bloom:
        b = F.broadcast(b)
    hit = F.expr(
        "__mask__ is not null and"
        " (shiftright(__mask__, cast(__pos__ % 32 as int)) & 1) = 1"
    )
    return (
        posed.join(
            b, F.expr("cast(__pos__ div 32 as int)") == F.col("__block__"),
            "left",
        )
        .groupBy(digest_col)
        .agg(F.min(hit).alias("__bloom_maybe__"))
    )


def incremental_bloom_dedup(
    new_df: DataFrame,
    cols: list[str],
    order_col: str,
    seen_digests: DataFrame | None = None,
    seen_bloom: DataFrame | None = None,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    broadcast_delta: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Drop-in for ``incremental_exact_dedup`` with the Bloom screen
    in front of the store probe: same ``(survivors, digest_append)``
    contract, same digest store schema, IDENTICAL survivors (no false
    negatives; false positives are confirmed against the exact store
    before anything is dropped — parity-pinned in
    tests/test_bloom.py).

    ``seen_bloom``: the persisted blocks table for the store. When
    ``None`` (and a store exists) it is rebuilt from ``seen_digests``
    — correct but store-scan-priced; long-running pipelines should
    persist it and OR-merge increments via :func:`bloom_union`.

    Scale contract: per-increment work is delta-sized (screen) plus
    a maybe-set-sized confirm against the store under the same
    broadcast-delta discipline as the exact face; with an empty
    maybe-set AQE collapses the confirm join and the store is not
    scanned at all."""
    tagged = new_df.withColumn(DIGEST_COL, content_digest(cols))
    batch = materialize(exact_dedup(tagged, [DIGEST_COL], order_col))
    if seen_digests is not None:
        if seen_bloom is None:
            seen_bloom = bloom_build(
                seen_digests, num_bits=num_bits, num_hashes=num_hashes
            )
        screened = bloom_might_contain(
            batch.select(DIGEST_COL),
            seen_bloom,
            num_bits=num_bits,
            num_hashes=num_hashes,
        )
        probe = screened.where(F.col("__bloom_maybe__")).select(DIGEST_COL)
        if broadcast_delta:
            probe = F.broadcast(probe)
        matched = materialize(
            seen_digests.select(DIGEST_COL).join(probe, DIGEST_COL).distinct()
        )
        batch = batch.join(matched, DIGEST_COL, "left_anti")
    return batch.drop(DIGEST_COL), batch.select(DIGEST_COL)


def bloom_screen_stats(
    new_df: DataFrame,
    cols: list[str],
    order_col: str,
    seen_digests: DataFrame,
    group_col: str,
    *,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Per-group accounting of one screened increment — the shape the
    ``incremental_bloom_stats`` oracle entry pins: ``(group,
    delta_rows, batch_kept, bloom_maybe, confirmed_dup, bloom_fp,
    survivors)``. All exact integers; ``confirmed_dup <= bloom_maybe``
    (no false negatives) and ``survivors = batch_kept -
    confirmed_dup`` hold by construction, so the false-positive count
    is directly observable (and, seeds being literals, reproducible
    in any engine)."""
    tagged = new_df.withColumn(DIGEST_COL, content_digest(cols))
    delta_counts = tagged.groupBy(group_col).agg(
        F.count("*").alias("delta_rows")
    )
    batch = materialize(exact_dedup(tagged, [DIGEST_COL], order_col))
    bloom = bloom_build(
        seen_digests, num_bits=num_bits, num_hashes=num_hashes
    )
    screened = bloom_might_contain(
        batch.select(DIGEST_COL).distinct(),
        bloom,
        num_bits=num_bits,
        num_hashes=num_hashes,
    )
    probe = F.broadcast(
        screened.where(F.col("__bloom_maybe__")).select(DIGEST_COL)
    )
    matched = (
        seen_digests.select(DIGEST_COL)
        .join(probe, DIGEST_COL)
        .distinct()
        .withColumn("__dup__", F.lit(True))
    )
    flags = (
        batch.join(screened, DIGEST_COL, "left")
        .join(matched, DIGEST_COL, "left")
        .withColumn("__dup__", F.coalesce("__dup__", F.lit(False)))
    )
    per_group = flags.groupBy(group_col).agg(
        F.count("*").alias("batch_kept"),
        F.sum(F.col("__bloom_maybe__").cast("long")).alias("bloom_maybe"),
        F.sum(F.col("__dup__").cast("long")).alias("confirmed_dup"),
        F.sum(
            (F.col("__bloom_maybe__") & ~F.col("__dup__")).cast("long")
        ).alias("bloom_fp"),
        F.sum((~F.col("__dup__")).cast("long")).alias("survivors"),
    )
    zero = F.lit(0).cast("long")
    return delta_counts.join(per_group, group_col, "left").select(
        group_col,
        "delta_rows",
        F.coalesce("batch_kept", zero).alias("batch_kept"),
        F.coalesce("bloom_maybe", zero).alias("bloom_maybe"),
        F.coalesce("confirmed_dup", zero).alias("confirmed_dup"),
        F.coalesce("bloom_fp", zero).alias("bloom_fp"),
        F.coalesce("survivors", zero).alias("survivors"),
    )
