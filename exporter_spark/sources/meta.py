"""Source driver tags — the Spark analog of the reference scanner's
``Driver()`` (/root/reference/scanner/scanner.go:19-20), which codecs
surface to custom mappers via ``Metadata.Driver``
(scanner/scanner.go:27-31).

A DataFrame has no instance-level metadata slot, so the tag rides on
every column's StructField metadata. It survives anything that keeps
the column (projection, filter, sort, join); columns materialized by
aggregation are new data and legitimately untagged — ``driver_of``
answers from the first tagged column it finds and falls back to
"memory" (the reference's FromData in-memory scanner analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DRIVER_META_KEY = "exporter.driver"


def tag_driver(df: DataFrame, name: str) -> DataFrame:
    """Stamp every column with the originating driver name. Column
    references are backtick-quoted so names containing dots (a CSV
    header like ``price.usd``) resolve as columns, not struct-field
    paths."""
    return df.select(
        [
            F.col("`" + f.name.replace("`", "``") + "`").alias(
                f.name, metadata={**(f.metadata or {}), DRIVER_META_KEY: name}
            )
            for f in df.schema.fields
        ]
    )


def driver_of(df: DataFrame) -> str:
    """The driver name a custom mapper sees in ``CellMeta.driver``."""
    for f in df.schema.fields:
        v = (f.metadata or {}).get(DRIVER_META_KEY)
        if v:
            return str(v)
    return "memory"
