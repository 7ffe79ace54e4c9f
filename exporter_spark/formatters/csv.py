"""CSV formatter — parity target /root/reference/codec/csv/csv.go.

Option surface (SURVEY.md §2.2 K1): delimiter, CRLF, header on/off,
custom header, header-when-no-data (eager vs lazy), custom NULL
string, per-column formatters, filter hook, post-filter limit.

Scale path: the display-string projection plus ``df.write.csv`` — the
whole pipeline (format expressions included) stays inside whole-stage
codegen and writes partition-parallel part files.

Fidelity path: Go ``encoding/csv`` quoting re-implemented exactly
(quotes when the field contains the delimiter, a quote, CR/LF, or
*begins with any unicode.IsSpace rune* — the leading-whitespace rule
is a Go quirk Python's csv module does not share).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from exporter_spark.formatters.base import BaseFormatter, jvm_str, qcol

# Go unicode.IsSpace set (encoding/csv fieldNeedsQuotes quotes a field
# whose FIRST rune is any of these — not just space/tab):
# Latin-1 fast path + the Unicode White_Space ranges.
GO_SPACE_CHARS = (
    "\t\n\v\f\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def csv_field_expr(col: Column, delimiter: str, null_value: str) -> Column:
    """Go encoding/csv field quoting as a Catalyst expression (the
    exact rule set of _go_csv_field below, but JVM-side). NULL cells
    become the configured null string first, then quote like any
    field — matching the reference (csv.go:196-210)."""
    s = F.coalesce(col, F.lit(null_value))
    needs = (
        (F.instr(s, delimiter) > 0)
        | (F.instr(s, '"') > 0)
        | (F.instr(s, "\r") > 0)
        | (F.instr(s, "\n") > 0)
        | F.substring(s, 1, 1).isin(*GO_SPACE_CHARS)
        | (s == "\\.")
    )
    quoted = F.concat(F.lit('"'), F.replace(s, F.lit('"'), F.lit('""')), F.lit('"'))
    return F.when(needs, quoted).otherwise(s)


def csv_line_expr(cols: list[str], delimiter: str, null_value: str) -> Column:
    """One CSV record (no line terminator) as a single expression."""
    return F.concat_ws(
        delimiter, *[csv_field_expr(qcol(c), delimiter, null_value) for c in cols]
    )


def _go_csv_field(s: str, delimiter: str) -> str:
    # JVM-domain projection (formatters/base.jvm_str): unpaired
    # surrogates become U+FFFD exactly as they would crossing into a
    # DataFrame, keeping this twin byte-identical to csv_field_expr
    # on ALL Python inputs, not just boundary-representable ones.
    s = jvm_str(s)
    if s == r"\.":  # encoding/csv special-cases a lone `\.`
        return '"\\."'
    needs = (
        delimiter in s
        or '"' in s
        or "\r" in s
        or "\n" in s
        or (s[:1] and s[0] in GO_SPACE_CHARS)
    )
    if not needs:
        return s
    return '"' + s.replace('"', '""') + '"'


class CSVFormatter(BaseFormatter):
    def __init__(self, spec=None, *, go_quoting: bool = False):
        super().__init__(spec)
        self.go_quoting = go_quoting

    def _line_end(self) -> str:
        return "\r\n" if self.spec.crlf else "\n"

    def _row(self, cells: list[str]) -> str:
        d = self.spec.delimiter
        return d.join(_go_csv_field(c, d) for c in cells) + self._line_end()

    # -- fidelity path ---------------------------------------------------------
    def iter_chunks(self, df: DataFrame) -> Iterator[str]:
        spec = self.spec
        header = spec.header_names(df)
        out = spec.compile(df)
        # record strings are assembled JVM-side (codegen) — the driver
        # only concatenates; quoting parity with Go encoding/csv is in
        # csv_field_expr / _go_csv_field (same rules, two dialects)
        lines = out.select(
            csv_line_expr(
                out.columns, spec.delimiter, spec.resolved_null("")
            ).alias("__line__")
        )
        end = self._line_end()
        wrote_header = False
        if spec.header and spec.header_when_no_data:
            # eager header (codec/csv/csv.go:147-151)
            yield self._row(header)
            wrote_header = True
        for row in lines.toLocalIterator():
            if spec.header and not wrote_header:
                # lazy header: only once a surviving row exists (:175-179)
                yield self._row(header)
                wrote_header = True
            yield row["__line__"] + end

    # -- scale path --------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        path: str,
        partition_by: list[str] | None = None,
        go_quoting: bool | None = None,
        *,
        _spread: bool = True,
    ) -> None:
        """Distributed part files. Two shapes:

        * default: the native CSV writer — header-per-part, readable
          by ``spark.read.csv``. Whitespace trimming is DISABLED
          (Spark's write default silently strips leading/trailing
          whitespace from unquoted fields — data corruption, not
          formatting). Quoting is RFC-4180 quote-doubling; Go's two
          extra quote triggers (leading IsSpace rune, lone ``\\.``)
          do not fire here, so bytes can differ from the fidelity
          stream on such fields while VALUES round-trip identically.
        * ``go_quoting=True`` (here or on the constructor): bare
          records via the SAME ``csv_line_expr`` as the fidelity path
          through the text writer — byte-identical records including
          the Go quoting quirks; parts carry no header (splice one in
          on assembly, as write_single_part cannot — use the default
          path when per-part headers matter)."""
        spec = self.spec
        out = spec.compile(self._spread_unordered(df, _spread))
        use_go = self.go_quoting if go_quoting is None else go_quoting
        if use_go:
            # hive-style convention: partition columns ride in the
            # directory name, not the record (matches the native path)
            cols = [c for c in out.columns if c not in (partition_by or [])]
            line = csv_line_expr(cols, spec.delimiter, spec.resolved_null(""))
            if spec.crlf:
                line = F.concat(line, F.lit("\r"))  # text writer adds \n
            writer = (
                out.select(*[qcol(c) for c in (partition_by or [])], line.alias("value"))
                .write.mode("overwrite")
            )
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.text(path)
            return
        if spec.custom_header is not None:
            out = out.toDF(*spec.header_names(df))
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        (
            writer
            .option("header", str(spec.header).lower())
            .option("sep", spec.delimiter)
            .option("nullValue", spec.resolved_null(""))
            .option("emptyValue", "")
            # escape = quote char ⇒ RFC-4180 quote doubling, matching
            # Go encoding/csv and our fidelity path (Spark's default
            # backslash-escape would write "\"" instead of "\"\"")
            .option("quote", '"')
            .option("escape", '"')
            # Spark's WRITE defaults trim unquoted fields — that is
            # silent data corruption, never acceptable
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .option("lineSep", "\r\n" if spec.crlf else "\n")
            .csv(path)
        )
