"""CSV formatter — parity target /root/reference/codec/csv/csv.go.

Option surface (SURVEY.md §2.2 K1): delimiter, CRLF, header on/off,
custom header, header-when-no-data (eager vs lazy), custom NULL
string, per-column formatters, filter hook, post-filter limit.

Scale path: the display-string projection plus ``df.write.csv`` — the
whole pipeline (format expressions included) stays inside whole-stage
codegen and writes partition-parallel part files.

Fidelity path: Go ``encoding/csv`` quoting re-implemented exactly
(quotes when the field contains the delimiter, a quote, CR/LF, or
*begins with a space or tab* — the leading-whitespace rule is a Go
quirk Python's csv module does not share).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from exporter_spark.formatters.base import BaseFormatter


def _go_csv_field(s: str, delimiter: str) -> str:
    if s == r"\.":  # encoding/csv special-cases a lone `\.`
        return '"\\."'
    needs = (
        delimiter in s
        or '"' in s
        or "\r" in s
        or "\n" in s
        or (s[:1] in (" ", "\t"))
    )
    if not needs:
        return s
    return '"' + s.replace('"', '""') + '"'


class CSVFormatter(BaseFormatter):
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
        wrote_header = False
        if spec.header and spec.header_when_no_data:
            # eager header (codec/csv/csv.go:147-151)
            yield self._row(header)
            wrote_header = True
        for row in out.toLocalIterator():
            if spec.header and not wrote_header:
                # lazy header: only once a surviving row exists (:175-179)
                yield self._row(header)
                wrote_header = True
            cells = [
                spec.null_value if row[c] is None else row[c] for c in out.columns
            ]
            yield self._row(cells)

    # -- scale path --------------------------------------------------------------
    def write(self, df: DataFrame, path: str) -> None:
        spec = self.spec
        out = spec.compile(df)
        if spec.custom_header is not None:
            out = out.toDF(*spec.header_names(df))
        (
            out.write.mode("overwrite")
            .option("header", str(spec.header).lower())
            .option("sep", spec.delimiter)
            .option("nullValue", spec.null_value)
            .option("emptyValue", "")
            .option("lineSep", "\r\n" if spec.crlf else "\n")
            .csv(path)
        )
