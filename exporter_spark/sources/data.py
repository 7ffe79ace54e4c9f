"""In-memory source — parity target /root/reference/scanner/slice.go.

``from_data(spark, rows)`` reproduces the slice scanner's contract:
column names are synthesized as ``column_0..column_{n-1}`` and the
schema is inferred **from row 0 only** (slice.go:68-87); later rows
are validated for arity, not type (slice.go:57-61). The original Go
type name of each row-0 cell is recorded in the column metadata as
``source_type`` (the analog of DatabaseTypeName, slice.go:78-82).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_PY_TO_SPARK: list[tuple[type, T.DataType, str]] = [
    (bool, T.BooleanType(), "bool"),
    (int, T.LongType(), "int64"),
    (float, T.DoubleType(), "float64"),
    (str, T.StringType(), "string"),
    (bytes, T.BinaryType(), "[]uint8"),
    (bytearray, T.BinaryType(), "[]uint8"),
    (dt.datetime, T.TimestampType(), "time.Time"),
    (dt.date, T.DateType(), "time.Time"),
    (Decimal, T.DecimalType(38, 18), "decimal"),
]


def _infer_cell(v: Any) -> tuple[T.DataType, str]:
    if v is None:
        # slice.go:80-82 — nil cell ⇒ DatabaseTypeName "nil"; type
        # unknowable, default string (everything casts to display anyway).
        return T.StringType(), "nil"
    for py, spark_t, go_name in _PY_TO_SPARK:
        if type(v) is py or (py not in (bool,) and isinstance(v, py)):
            return spark_t, go_name
    if isinstance(v, (list, tuple)):
        elem, _ = _infer_cell(v[0]) if v else (T.StringType(), "nil")
        return T.ArrayType(elem), "[]any"
    if isinstance(v, dict):
        if v:
            k0 = next(iter(v))
            vt, _ = _infer_cell(v[k0])
        else:
            vt = T.StringType()
        return T.MapType(T.StringType(), vt), "map[string]any"
    return T.StringType(), type(v).__name__


def _go_display(v: Any) -> str | None:
    """Driver-side Go-style rendering for cells of a demoted
    mixed-type column — the same value each cell would produce
    through tostring.go when the slice scanner hands its dynamic
    type to the codec."""
    import datetime as dt

    from exporter_spark.functions.tostring import _go_fixed_repr

    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _go_fixed_repr(v)
    if isinstance(v, dt.datetime):
        from exporter_spark.formatters.json import _rfc3339nano_py

        if v.replace(tzinfo=None) == dt.datetime(1, 1, 1):
            return None  # Go zero time ⇒ NULL (tostring.go:67-69)
        return _rfc3339nano_py(v)
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    return str(v)


def from_data(spark: SparkSession, rows: Sequence[Sequence[Any]]) -> DataFrame:
    """[][]any → DataFrame with column_i names and row-0 schema
    inference. Later rows are validated for arity ONLY (slice.go's
    contract): a column whose later cells stray from the row-0 type
    is demoted to string, each cell rendered with its OWN dynamic
    type's Go display rules — exactly what the reference produces
    when such a slice reaches a codec. (A typed Spark column cannot
    hold heterogeneous values; createDataFrame would otherwise
    reject row 2+ and break the documented contract.)"""
    rows = [list(r) for r in rows]
    if not rows:
        return spark.createDataFrame([], T.StructType([]))
    width = len(rows[0])
    for i, r in enumerate(rows[1:], start=2):
        if len(r) != width:  # arity check, slice.go:57-61
            raise ValueError(f"row {i} has {len(r)} cells, expected {width}")
    fields = []
    demote: list[bool] = []
    for i, cell in enumerate(rows[0]):
        spark_t, go_name = _infer_cell(cell)
        mixed = any(
            r[i] is not None and _infer_cell(r[i])[0] != spark_t for r in rows[1:]
        )
        demote.append(mixed)
        fields.append(
            T.StructField(
                f"column_{i}",
                T.StringType() if mixed else spark_t,
                nullable=True,
                metadata={"source_type": go_name},
            )
        )
    if any(demote):
        rows = [
            [_go_display(c) if demote[i] else c for i, c in enumerate(r)]
            for r in rows
        ]
    return spark.createDataFrame([tuple(r) for r in rows], T.StructType(fields))
