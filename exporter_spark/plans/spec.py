"""ExportSpec — the reference's functional-option surface, compiled to
Spark transformations.

Covers (SURVEY.md §2.3): header control (eager/lazy/custom,
codec/csv/csv.go:88-106), delimiter + CRLF (csv.go:74-85), custom NULL
string (csv.go:109-113, html.go:74-78), per-type/-column value mappers
(csv.go:52-63), the row preprocessor/filter hook (csv.go:67-71), and
post-filter LIMIT (csv.go:116-120, applied after the filter hook —
csv.go:170-185 ordering).

Design stance: the declarative members (``filter``, ``limit``,
``formatters``) compile to Catalyst expressions so pushdown/pruning
still work; the imperative ``preprocessor`` escape hatch runs as an
Arrow-batched hook over already-stringified rows and is the slow path,
exactly like the reference's per-row Go hook.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field, replace
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exporter_spark.functions.tostring import display_columns

# preprocessor: (row_id | None, {col: display_str|None}) -> (dict | None)
# Returning None drops the row — the reference's (nil, false) return
# (codec/csv/csv.go:170-173). row_id is the 1-based *output* row number
# and is only defined when the spec has an ``order_by`` (a distributed
# engine has no inherent row order; the reference is single-threaded).
PreProcessor = Callable[[int | None, dict[str, Any]], dict[str, Any] | None]


@dataclass(frozen=True)
class ExportSpec:
    """Immutable export configuration; ``with_*`` methods mirror the
    reference's functional options."""

    header: bool = True
    header_when_no_data: bool = True
    custom_header: list[str] | None = None
    delimiter: str = ","
    crlf: bool = False
    null_value: str = ""
    limit: int = -1
    filter: Column | str | None = None
    order_by: list[str] | None = None
    preprocessor: PreProcessor | None = None
    formatters: dict[str, Column] = field(default_factory=dict)
    float_mode: str = "java"
    # JSON
    newline_delimited: bool = False
    sort_keys: bool = True  # jsoniter std-compat sorts map keys (json.go:17)
    # XML
    root_tag: str = "data"
    row_tag: str = "row"
    declaration: bool = True

    # -- functional options ------------------------------------------------
    def with_header(self, on: bool = True) -> "ExportSpec":
        return replace(self, header=on)

    def with_header_when_no_data(self, on: bool) -> "ExportSpec":
        return replace(self, header_when_no_data=on)

    def with_custom_header(self, names: list[str]) -> "ExportSpec":
        return replace(self, custom_header=list(names))

    def with_delimiter(self, d: str) -> "ExportSpec":
        return replace(self, delimiter=d)

    def with_crlf(self, on: bool = True) -> "ExportSpec":
        return replace(self, crlf=on)

    def with_null(self, s: str) -> "ExportSpec":
        return replace(self, null_value=s)

    def with_limit(self, n: int) -> "ExportSpec":
        return replace(self, limit=n)

    def with_filter(self, predicate: Column | str) -> "ExportSpec":
        return replace(self, filter=predicate)

    def with_order_by(self, *cols: str) -> "ExportSpec":
        return replace(self, order_by=list(cols))

    def with_preprocessor(self, fn: PreProcessor) -> "ExportSpec":
        return replace(self, preprocessor=fn)

    def with_formatter(self, column: str, expr: Column) -> "ExportSpec":
        return replace(self, formatters={**self.formatters, column: expr})

    def with_newline_delimited(self, on: bool = True) -> "ExportSpec":
        return replace(self, newline_delimited=on)

    def with_float_mode(self, mode: str) -> "ExportSpec":
        if mode not in ("java", "go"):
            raise ValueError("float_mode must be 'java' or 'go'")
        return replace(self, float_mode=mode)

    def with_float_go(self) -> "ExportSpec":
        """Byte-parity floats (strconv.FormatFloat 'f' -1) via the
        Arrow pandas-UDF path — fidelity over codegen speed."""
        return self.with_float_mode("go")

    # -- compilation ---------------------------------------------------------
    def header_names(self, df: DataFrame) -> list[str]:
        if self.custom_header is not None:
            if len(self.custom_header) != len(df.columns):
                raise ValueError(
                    f"custom header has {len(self.custom_header)} names, "
                    f"dataframe has {len(df.columns)} columns"
                )
            return self.custom_header
        return df.columns

    def compile(self, df: DataFrame) -> DataFrame:
        """source df → display-string df with filter → preprocessor →
        post-filter limit applied, in the reference's ordering
        (codec/csv/csv.go:156-188)."""
        return self._compile(df, display=True)

    def compile_raw(self, df: DataFrame) -> DataFrame:
        """Same pipeline but values stay in their native Spark types —
        the JSON codec path, which hands raw values to the serializer
        (codec/json/json.go:108-130) instead of display strings."""
        return self._compile(df, display=False)

    def _compile(self, df: DataFrame, *, display: bool) -> DataFrame:
        if self.filter is not None:
            df = df.filter(self.filter)
        if self.order_by:
            df = df.orderBy(*self.order_by)
        if display:
            out = df.select(
                display_columns(
                    df, float_mode=self.float_mode, formatters=self.formatters
                )
            )
        else:
            out = df
            for name, expr in self.formatters.items():
                out = out.withColumn(name, expr)
        if self.preprocessor is not None:
            out = self._apply_preprocessor(out, schema=None if display else out.schema)
        if self.limit == 0:
            out = out.limit(0)
        elif self.limit > 0:
            out = out.limit(self.limit)
        return out

    def _apply_preprocessor(
        self, df: DataFrame, schema: T.StructType | None = None
    ) -> DataFrame:
        fn = self.preprocessor
        cols = df.columns
        if schema is None:
            schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
        ordered = bool(self.order_by)

        if ordered:
            # Deterministic 1-based output row ids. monotonically
            # increasing ids respect the just-established global sort,
            # so numbering by them reproduces it; the single window
            # partition makes this the ordered/correctness path only —
            # the distributed path runs with row_id=None.
            w_df = df.withColumn(
                "__rid__",
                F.row_number().over(Window.orderBy(F.monotonically_increasing_id())),
            )
        else:
            w_df = df.withColumn("__rid__", F.lit(None).cast("long"))

        def run(iterator):
            for pdf in iterator:
                kept = []
                for rec in pdf.to_dict("records"):
                    rid = rec.pop("__rid__", None)
                    rid = int(rid) if rid is not None and rid == rid else None
                    res = fn(rid, rec)
                    if res is not None:
                        kept.append({c: res.get(c) for c in cols})
                import pandas as pd

                yield pd.DataFrame(kept, columns=cols) if kept else pd.DataFrame(
                    {c: pd.Series(dtype="object") for c in cols}
                )

        return w_df.mapInPandas(run, schema)
