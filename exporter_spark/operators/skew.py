"""Skew and co-location helpers — the knobs a 100 TB job reaches for
when AQE alone isn't enough.

* ``salted_join`` — for a join whose key distribution is heavily
  skewed (a handful of hot keys receive most rows): the big side gets
  a uniform salt, the small side is replicated once per salt value,
  and the join key becomes (key, salt) — hot keys fan out across
  ``salt_buckets`` tasks instead of landing on one straggler.
  Results are identical to the unsalted join (inner/left semantics
  preserved; the replicated small side matches exactly one salt per
  big-side row).

* ``write_bucketed`` / ``read_bucketed`` — persist a table bucketed
  by its join key so repeated joins on that key skip the shuffle
  entirely (SortMergeJoin over pre-bucketed scans shows no Exchange).
  This is the batch analog of co-partitioned storage, and the main
  lever for iterative pipelines that join the same giant fact table
  every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side salted across ``salt_buckets`` sub-keys.

    ``small`` is replicated ``salt_buckets``× (keep it genuinely
    small); ``big`` rows are assigned a uniform pseudo-random salt
    derived from a per-row id, so one hot key spreads over many tasks.
    """
    big_s = big.withColumn(
        "__salt__",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    small_s = small.withColumn(
        "__salt__", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, [on, "__salt__"], how)
    return out.drop("__salt__")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    *,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark, table: str) -> DataFrame:
    return spark.table(table)
