"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (TPC-H Q1-flavored pricing summary)
at sf0.001; ``queries``/``oracle_sql`` expose the full corpus from
exporter_spark.queries — one entry per implemented operator family
(SURVEY.md §2 + §2.5), each Spark implementation paired with a DuckDB
oracle except the three genuinely non-portable ones (HLL approx
distinct, trained-KMeans IVF — with the oracle-paired deterministic
sibling ``ivf_fixed_topk`` — and the order-dependent greedy SemDeDup,
with the oracle-paired ``semdedup_survivors``; the latter two are
pinned at sf0.1 by tools/pin_no_oracle.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exporter_spark import queries as _corpus  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _corpus.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _corpus.get_queries()


def oracle_sql() -> dict[str, str]:
    return _corpus.get_oracles()
