"""Hive source — parity target /root/reference/scanner/hive.go.

The reference drives a Thrift cursor row-by-row (hive.go:30-52) and
normalizes metadata: a ``table.``-qualifier is stripped from column
names at the first '.' and a trailing ``_TYPE`` suffix is stripped
from type names (hive.go:71-75). Spark reads Hive natively through
the metastore (enableHiveSupport), so there is no cursor to manage;
we keep the name de-qualification as a utility since Hive result sets
surfaced through SQL can carry qualified names the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from exporter_spark.sources.meta import tag_driver


def dequalify_columns(df: DataFrame) -> DataFrame:
    """Strip a leading 'table.' qualifier from column names
    (hive.go:71-74)."""
    renames = {}
    for c in df.columns:
        if "." in c:
            renames[c] = c.split(".", 1)[1]
    if not renames:
        return df
    return df.toDF(*[renames.get(c, c) for c in df.columns])


def hive_session(app_name: str = "exporter_spark-hive") -> SparkSession:
    return (
        SparkSession.builder.appName(app_name).enableHiveSupport().getOrCreate()
    )


def from_hive(spark: SparkSession, table_or_sql: str) -> DataFrame:
    """Read a Hive table (db.tbl) or run HiveQL; requires a
    Hive-enabled session."""
    import re

    s = table_or_sql.strip()
    # word boundary: a table named "withdrawals" or "selections" is a
    # table, not HiveQL
    if re.match(r"(?i)^(select|with)\b", s):
        return tag_driver(dequalify_columns(spark.sql(s)), "hive")
    return tag_driver(dequalify_columns(spark.table(s)), "hive")
