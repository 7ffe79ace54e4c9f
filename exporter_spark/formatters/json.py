"""JSON formatter — parity target /root/reference/codec/json/json.go.

Two framings (SURVEY.md §2.2 K2):
  * NDJSON (``with_newline_delimited(True)``) — one object per line.
    Scale path is Spark's native JSON writer (Spark JSON *is* NDJSON).
  * JSON array — ``[`` emitted with the first row, ``,\n`` separators,
    ``]\n`` close; an empty result emits NOTHING (not ``[]``) —
    json.go:94-98,135-147.

Key order is alphabetical (jsoniter std-compat marshals maps with
sorted keys, json.go:17); values are RAW (nested structures stay
structural, json.go:108-130), except timestamps which marshal as
RFC3339Nano (Go's time.Time MarshalJSON) and floats which marshal
with Go's shortest-round-trip rules.
"""

from __future__ import annotations

import datetime as dt
import json
import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exporter_spark.formatters.base import BaseFormatter
from exporter_spark.functions.tostring import _go_fixed_repr


def _rfc3339nano_py(v: dt.datetime) -> str:
    s = v.strftime("%Y-%m-%dT%H:%M:%S")
    if v.microsecond:
        s += (".%06d" % v.microsecond).rstrip("0")
    return s + "Z"


def _json_token(v) -> str:
    """Serialize one value as Go's encoding/json would (compact)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            raise ValueError("json: unsupported value: " + repr(v))
        return _go_fixed_repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, (bytes, bytearray)):
        import base64

        return '"' + base64.b64encode(bytes(v)).decode() + '"'  # Go []byte → base64
    if isinstance(v, dt.datetime):
        return '"' + _rfc3339nano_py(v) + '"'
    if isinstance(v, dt.date):
        return '"' + v.isoformat() + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_json_token(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: str(kv[0]))
        return (
            "{"
            + ",".join(
                json.dumps(str(k), ensure_ascii=False) + ":" + _json_token(x)
                for k, x in items
            )
            + "}"
        )
    if hasattr(v, "asDict"):  # pyspark Row
        return _json_token(v.asDict(recursive=False))
    return json.dumps(str(v), ensure_ascii=False)


def assemble_json_array(parts_dir: str, out_file: str) -> None:
    """Concatenate a distributed NDJSON write into the reference's
    array framing ('[' with first row, ',\\n' separators, ']\\n'
    close, empty ⇒ empty file) without re-reading through Spark."""
    import glob

    first = True
    with open(out_file, "w", encoding="utf-8") as out:
        for part in sorted(glob.glob(f"{parts_dir}/part-*")):
            if part.endswith(".crc"):
                continue
            with open(part, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    out.write("[\n" if first else ",\n")
                    out.write(line)
                    first = False
        if not first:
            out.write("\n]\n")


class JSONFormatter(BaseFormatter):
    def _obj(self, row, cols: list[str]) -> str:
        names = sorted(cols) if self.spec.sort_keys else cols
        return (
            "{"
            + ",".join(
                json.dumps(c, ensure_ascii=False) + ":" + _json_token(row[c])
                for c in names
            )
            + "}"
        )

    # -- fidelity path ---------------------------------------------------------
    def iter_chunks(self, df: DataFrame) -> Iterator[str]:
        spec = self.spec
        out = spec.compile_raw(df)
        cols = out.columns
        first = True
        for row in out.toLocalIterator():
            obj = self._obj(row, cols)
            if spec.newline_delimited:
                yield obj + "\n"
            else:
                yield ("[\n" if first else ",\n") + obj
                first = False
        if not spec.newline_delimited and not first:
            yield "\n]\n"
        # empty result ⇒ empty output, not "[]" (json.go:94-98)

    # -- scale path --------------------------------------------------------------
    def write(self, df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
        """Distributed NDJSON via the native writer. Array framing is a
        single-stream format by construction; for scale we still write
        NDJSON part files (callers needing one array concatenate with
        the fidelity path)."""
        spec = self.spec
        out = spec.compile_raw(df)
        # Timestamps must serialize as RFC3339Nano with TRIMMED
        # fractional zeros (Go time.Time marshaling); no writer
        # timestampFormat can trim, so convert to the display string
        # first — keeps the distributed output byte-compatible with
        # the fidelity path (same class of divergence as the CSV
        # quote-escape bug).
        from pyspark.sql import types as T

        from exporter_spark.functions.tostring import _rfc3339nano

        for f in out.schema.fields:
            if isinstance(f.dataType, T.TimestampType):
                out = out.withColumn(f.name, _rfc3339nano(F.col(f.name)))
            elif isinstance(f.dataType, T.DateType):
                out = out.withColumn(f.name, F.date_format(f.name, "yyyy-MM-dd"))
        if spec.sort_keys:
            out = out.select(*sorted(out.columns))
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        (
            writer
            .option("ignoreNullFields", "false")
            .json(path)
        )
