"""Display-string expression library.

Re-expresses the reference's value→string serialization table
(/root/reference/tostring/tostring.go:34-98) as Spark column
expressions. A "display string" of NULL means the cell is NULL; the
formatter layer decides how NULL is rendered (empty string for CSV,
element omission for XML, ``[NULL]`` span for HTML, native null for
JSON) — see /root/reference/codec/*/ and SURVEY.md §2.3 T3/T4.

Semantics implemented:
  nil                  → NULL                         (tostring.go:35-37)
  string / []byte      → identity / UTF-8 decode      (tostring.go:39-42)
  bool                 → "true" / "false"             (tostring.go:43-44)
  ints / uints         → base-10                      (tostring.go:45-64)
  time.Time            → zero time ⇒ NULL, else
                         RFC3339Nano (trailing frac
                         zeros trimmed, "Z" for UTC)  (tostring.go:65-70)
  float32/float64      → shortest round-trip decimal,
                         fixed notation, no exponent,
                         integral values lose ".0"    (tostring.go:71-74)
  complex (array/map/
  struct)              → JSON; "[]"/"{}"/"null" ⇒ NULL (tostring.go:76-96)

Everything except the Go-exact float path is a JVM-side expression
(whole-stage-codegen friendly). The Go-exact float formatter needs
shortest-round-trip digits re-rendered without exponent notation,
which no Spark builtin produces — it is an Arrow-vectorized pandas
UDF, opt-in via ``float_mode="go"``. The default ``float_mode="java"``
uses Spark's CAST (Java ``Double.toString``) and stays fully codegen'd;
at 100 TB that is the path you want unless byte-parity with the Go
library is required.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["display_expr", "display_columns", "go_float_str"]

# Go's zero time.Time (tostring.go:67-69: IsZero() ⇒ NULL).
_GO_ZERO_TIME = "0001-01-01 00:00:00"


def _go_fixed_repr(v: float) -> str | None:
    """Python port of strconv.FormatFloat(v, 'f', -1, 64).

    repr() gives the shortest round-trip digits (same algorithm family
    as Go); Decimal re-renders them in fixed notation; the trailing
    ".0" of integral values is stripped (Go prints 3.0 as "3").
    """
    if v != v:  # NaN (also how nulls arrive through Arrow; caller masks them)
        return "NaN"
    if v == float("inf"):
        return "+Inf"
    if v == float("-inf"):
        return "-Inf"
    s = format(Decimal(repr(v)), "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s or "0"


def _make_go_float_udf():
    """Build the UDF with the conversion logic in a closure so
    cloudpickle serializes it BY VALUE — executors then don't need
    exporter_spark on their PYTHONPATH (important when the caller's
    session wasn't created by our get_spark).

    Kernel: numpy's ``format_float_positional(unique=True, trim='-')``
    is the same shortest-round-trip fixed-notation rendering as the
    Decimal-based ``_go_fixed_repr`` (hypothesis-pinned equal in
    tests/test_extension_points.py) at ~1.7x the throughput — this is
    the hot path of ``float_mode="go"`` exports and the JSON array
    serializer."""
    import numpy as _np

    _fmt = _np.format_float_positional

    def fixed(v):
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "+Inf"
        if v == float("-inf"):
            return "-Inf"
        return _fmt(v, unique=True, trim="-")

    @pandas_udf(T.StringType())
    def go_float_str(s: pd.Series) -> pd.Series:
        return pd.Series(
            [fixed(v) for v in s.to_numpy()], index=s.index, dtype="object"
        )

    return go_float_str


go_float_str = _make_go_float_udf()


def _go_float_expr(d: Column) -> Column:
    """The Go-parity renderer as a Column.

    Default: the Arrow/numpy kernel — numpy's C Dragon4
    (format_float_positional) MEASURED 2.8× faster end-to-end than the
    compiled BigDecimal JVM twin on the sf0.1 lineitem float_go export
    (2.36s vs 6.58s, byte-identical output; SCALE.md round 5). The JVM
    kernel (javakernel/GoFloat.java, fuzz-pinned byte-identical over
    187k multi-regime doubles incl. binade-boundary
    asymmetric-interval cases) exists for deployments where executor
    Python workers are unavailable — opt in via
    EXPORTER_SPARK_GO_FLOAT_KERNEL=java."""
    import os

    if os.environ.get("EXPORTER_SPARK_GO_FLOAT_KERNEL") == "java":
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            try:
                from exporter_spark.javakernel import ensure_go_float_java

                return F.call_udf(ensure_go_float_java(spark), d)
            except Exception:  # noqa: BLE001 — no JDK / build failure
                pass
    return go_float_str(d)


def _rfc3339nano(col: Column) -> Column:
    """RFC3339Nano with trailing fractional zeros trimmed, per Go
    time.Format(time.RFC3339Nano). Session timezone is UTC ⇒ "Z".

    Spark's timestamp→string CAST already renders with trailing
    fractional zeros trimmed (and no fraction at all for whole
    seconds), so one cast + separator swap replaces the previous
    two-date_format + regexp formulation (~40% less render time on a
    one-timestamp-column export; measured sf0.1 lineitem)."""
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(F.replace(col.cast("string"), F.lit(" "), F.lit("T")), F.lit("Z"))
    )


def display_expr(
    col: Column,
    dt: T.DataType,
    *,
    float_mode: str = "java",
) -> Column:
    """Column expression producing the display string for one column.

    NULL result ⇔ NULL cell (formatters decide the rendering).
    float_mode: "java" (CAST, codegen fast path) | "go" (byte-parity
    with strconv.FormatFloat via Arrow pandas UDF).
    """
    if isinstance(dt, T.StringType):
        return col
    if isinstance(dt, T.BinaryType):
        return col.cast("string")  # UTF-8 decode, matches Go string(v)
    if isinstance(dt, T.BooleanType):
        return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(col, "true").otherwise("false")
        )
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType)):
        return col.cast("string")
    if isinstance(dt, T.TimestampType):
        return F.when(
            col.isNull() | (col == F.to_timestamp(F.lit(_GO_ZERO_TIME))),
            F.lit(None).cast("string"),
        ).otherwise(_rfc3339nano(col))
    if isinstance(dt, T.DateType):
        # Go has no date type (time.Time covers it); ISO date chosen.
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        d = col.cast("double")
        if float_mode == "go":
            return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
                _go_float_expr(d)
            )
        return d.cast("string")
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        j = F.to_json(col)
        # tostring.go:80-83 / :92-95 — empty/null JSON payloads are NULL cells.
        return F.when(j.isin("[]", "{}", "null") | j.isNull(), F.lit(None)).otherwise(j)
    # Fallback mirrors the reference's final fmt.Sprintf("%v") (tostring.go:96).
    return col.cast("string")


def qcol(name: str) -> Column:
    """Exact top-level column reference for a KNOWN column name.

    The reference treats column names as opaque strings; Spark parses
    them — ``F.col("a.b")`` reads the dot as struct access, and even
    positional ``df[i]`` routes through ``Dataset.apply``'s name
    parser, which rejects an embedded backtick outright. Backtick-
    quote with doubled inner backticks (the SQL identifier escape)
    and every name resolves literally. Use ONLY for names taken from
    ``df.columns``/schema — user expression strings (struct access,
    SQL fragments) must keep plain parsing."""
    return F.col("`" + name.replace("`", "``") + "`")


def display_columns(
    df,
    *,
    float_mode: str = "java",
    formatters: dict[str, Column] | None = None,
    timestamp_mode: str = "rfc3339nano",
    only: list[str] | None = None,
) -> list[Column]:
    """One display-string Column per df column, preserving names.

    ``formatters`` maps column name → ready Column expression and
    overrides the default (resolved by ExportSpec from its column- and
    type-keyed mapper registries — the reference's custom-mapper
    dispatch, codec/csv/csv.go:195-205). ``only`` restricts output to
    the named columns (used to exclude internal helper columns like
    the mapper RowID).
    """
    formatters = formatters or {}
    out = []
    for i, f in enumerate(df.schema.fields):
        if only is not None and f.name not in only:
            continue
        if f.name in formatters:
            expr = formatters[f.name]
        else:
            # qcol, not df[i]: positional access still parses the
            # name (Dataset.apply) and chokes on backticks/dots
            expr = display_expr(qcol(f.name), f.dataType, float_mode=float_mode)
        out.append(expr.alias(f.name))
    return out
