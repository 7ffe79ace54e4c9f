"""JDBC source — parity target /root/reference/scanner/sql.go.

The reference wraps an already-executed *sql.Rows cursor; on Spark the
idiomatic equivalent is the JDBC DataSource, which additionally gives
us partitioned parallel reads — the thing a single database cursor
fundamentally cannot do at 100 TB. ``partition_column`` +
``num_partitions`` split the read into concurrent range queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from exporter_spark.sources.meta import tag_driver


def from_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **properties: str,
) -> DataFrame:
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url)
    if table is not None:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        if query is not None:
            raise ValueError("partitioned reads require table=, not query=")
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return tag_driver(reader.load(), "sql")
