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

from exporter_spark import fsio
from exporter_spark.formatters.base import BaseFormatter, qcol
from exporter_spark.functions.tostring import _go_fixed_repr


def _rfc3339nano_py(v: dt.datetime) -> str:
    """Fallback for temporals NESTED inside arrays/structs (top-level
    timestamp columns are rendered JVM-side before collection, so the
    driver's OS timezone never touches them). Aware datetimes are
    converted to UTC; naive ones are trusted to already be UTC (the
    engine session runs with spark.sql.session.timeZone=UTC)."""
    if v.tzinfo is not None:
        v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
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


def assemble_json_array(parts_dir: str, out_file: str, spark=None) -> None:
    """Concatenate a distributed NDJSON write into the reference's
    array framing ('[' with first row, ',\\n' separators, ']\\n'
    close, empty ⇒ empty file) without re-reading through Spark.

    All IO via the Hadoop FS API (works against hdfs:/s3a: paths, not
    just the driver's disk). Each part's text is transformed in the
    driver one part at a time — parts are bounded by the write's
    partition sizing, and single-document assembly is inherently a
    one-stream step (the array format has no parallel form)."""
    def pieces():
        # generator: one part's text in memory at a time (concat_files
        # consumes lazily), not the whole document
        first = True
        for part in fsio.list_parts(parts_dir, spark):
            body = fsio.read_text(part, spark).rstrip("\n")
            if not body:
                continue
            rows = "\n".join(l for l in body.split("\n") if l)
            yield ("text", ("[\n" if first else ",\n") + rows.replace("\n", ",\n"))
            first = False
        if not first:
            yield ("text", "\n]\n")

    fsio.concat_files(out_file, pieces(), spark)


def _json_fragment(col, dt):
    """Raw JSON token for one column as a Catalyst expression,
    matching ``_json_token``'s rendering (the fidelity serializer):
    Go-style shortest floats ("11", not "11.0") via the go-float UDF,
    RFC3339Nano timestamps, Jackson-escaped strings (extracted from
    ``to_json(array(col))`` so escaping stays JVM-side, with the
    uppercase-hex control escapes Jackson emits folded to the fidelity
    serializer's lowercase). Nested arrays/structs render via
    ``to_json`` with NULL fields preserved (``ignoreNullFields`` is
    false, matching the NDJSON writer path) and full-microsecond
    timestamps; three documented divergences from the fidelity
    serializer remain inside nested values: map keys keep their stored
    order (``_json_token`` sorts them), floats render Jackson-style
    ("11.0") rather than Go-style ("11"), and timestamp fractions are
    zero-padded to six digits rather than zero-trimmed. Top-level
    columns are exact; callers needing byte parity on nested
    float/timestamp values should use the fidelity path."""
    from pyspark.sql import types as T

    from exporter_spark.functions.tostring import go_float_str

    def _quoted_escaped(c):
        j = F.to_json(F.array(c))  # ["escaped"] — strip the brackets
        j = j.substr(F.lit(2), F.length(j) - F.lit(2))
        # Jackson writes \\u-escaped control chars with UPPERCASE hex;
        # the fidelity path's json.dumps writes lowercase. Only nine
        # sequences can differ (\\b \\t \\n \\f \\r have short forms).
        # A blind substring replace would also down-case literal text
        # like "\\u000B" (whose backslash Jackson doubles), so first
        # hide escaped-backslash pairs behind a sentinel: Jackson
        # output contains no RAW control characters (they are all
        # escaped), making \\x01 a collision-free choice. Gated on a
        # cheap contains() probe — real text almost never carries raw
        # control characters, so the fold chain almost never runs.
        sentinel = "\x01"
        folded = F.replace(j, F.lit("\\\\"), F.lit(sentinel))
        for seq in ("000B", "000E", "000F", "001A", "001B", "001C", "001D",
                    "001E", "001F"):
            folded = F.replace(
                folded, F.lit("\\u" + seq), F.lit("\\u" + seq.lower())
            )
        folded = F.replace(folded, F.lit(sentinel), F.lit("\\\\"))
        return F.when(j.contains("\\u00"), folded).otherwise(j)

    if isinstance(dt, (T.StringType, T.BinaryType)):
        frag = _quoted_escaped(col)
    elif isinstance(dt, T.BooleanType):
        frag = F.when(col, F.lit("true")).otherwise(F.lit("false"))
    elif isinstance(dt, (T.FloatType, T.DoubleType)):
        # NaN/Inf: Go's encoding/json errors — so does the fidelity
        # serializer; the distributed twin must fail loudly too, not
        # silently emit an unparseable bare NaN token
        d = col.cast("double")
        frag = F.when(
            F.isnan(d) | (F.abs(d) == F.lit(float("inf"))),
            F.raise_error(F.lit("json: unsupported value: NaN/Inf")),
        ).otherwise(go_float_str(d))
    elif isinstance(dt, T.TimestampType):
        from exporter_spark.functions.tostring import _rfc3339nano

        frag = F.concat(F.lit('"'), _rfc3339nano(col), F.lit('"'))
    elif isinstance(dt, T.TimestampNTZType):
        # naive timestamps are trusted UTC (engine contract), matching
        # _rfc3339nano_py's rendering of naive datetimes
        frag = F.concat(
            F.lit('"'),
            F.replace(col.cast("string"), F.lit(" "), F.lit("T")),
            F.lit('Z"'),
        )
    elif isinstance(dt, T.DateType):
        frag = F.concat(F.lit('"'), F.date_format(col, "yyyy-MM-dd"), F.lit('"'))
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        frag = col.cast("string")
    elif isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        # NULL struct fields / map values must stay (the NDJSON writer
        # path sets the same option); nested timestamps keep full
        # microsecond precision (the default format truncates to
        # milliseconds — silent data loss, not just rendering drift)
        frag = F.to_json(
            col,
            {
                "ignoreNullFields": "false",
                "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
            },
        )
    else:
        # every other scalar (Decimal included) mirrors _json_token's
        # fallthrough: the value's string form as a QUOTED JSON string
        # (a bare to_json on a scalar column would not even plan)
        frag = _quoted_escaped(col.cast("string"))
    return F.when(col.isNull(), F.lit("null")).otherwise(frag)


def json_line_expr(schema, cols: list[str]):
    """One NDJSON object per row as a single Catalyst expression —
    the executor-side twin of ``JSONFormatter._obj`` (same bytes,
    serialized in parallel instead of on the driver)."""
    by_name = {f.name: f.dataType for f in schema.fields}
    if not cols:
        return F.lit("{}")  # the '{' prefix below rides the first column
    parts = []
    for i, c in enumerate(cols):
        prefix = ("{" if i == 0 else ",") + json.dumps(c, ensure_ascii=False) + ":"
        parts.append(F.lit(prefix))
        parts.append(_json_fragment(qcol(c), by_name[c]))
    parts.append(F.lit("}"))
    return F.concat(*parts)


def _render_temporals(out: DataFrame) -> DataFrame:
    """Timestamps must serialize as RFC3339Nano with TRIMMED fractional
    zeros (Go time.Time marshaling). Rendering happens JVM-side, under
    the session timezone (UTC), BEFORE any collection — the fidelity
    path's toLocalIterator would otherwise deserialize through the
    driver's OS-local timezone and shift instants on non-UTC drivers;
    the distributed writer has no trimming timestampFormat at all.
    Both paths share this projection, so they stay byte-identical."""
    from pyspark.sql import types as T

    from exporter_spark.functions.tostring import _rfc3339nano

    exprs = []
    changed = False
    for i, f in enumerate(out.schema.fields):
        # qcol, not out[i]: positional access still parses the name
        # (Dataset.apply) and fails on dotted/backticked columns
        c = qcol(f.name)
        if isinstance(f.dataType, T.TimestampType):
            exprs.append(_rfc3339nano(c).alias(f.name))
            changed = True
        elif isinstance(f.dataType, T.TimestampNTZType):
            # naive timestamps are trusted UTC (engine contract); the
            # native writer would truncate to ms and omit the Z
            exprs.append(
                F.concat(
                    F.replace(c.cast("string"), F.lit(" "), F.lit("T")), F.lit("Z")
                ).alias(f.name)
            )
            changed = True
        elif isinstance(f.dataType, T.DateType):
            exprs.append(F.date_format(c, "yyyy-MM-dd").alias(f.name))
            changed = True
        else:
            exprs.append(c)
    return out.select(*exprs) if changed else out


class JSONFormatter(BaseFormatter):
    def _dedup_columns(self, out: DataFrame) -> DataFrame:
        """Duplicate output names: strict-reject by default; in
        "collapse" mode the LAST occurrence wins — the reference's
        map-overwrite semantics (codec/json/json.go:108-110), where
        later row values silently replace earlier ones under the same
        key. Selection is positional (duplicate names can't be
        referenced by name)."""
        cols = out.columns
        if len(set(cols)) == len(cols):
            return out
        if self.spec.duplicate_columns == "error":
            dups = sorted({c for c in cols if cols.count(c) > 1})
            raise ValueError(
                f"duplicate output column names {dups}; use "
                f"with_duplicate_columns('collapse') for the reference's "
                f"last-wins map semantics"
            )
        # df[name] / df[i] both resolve BY NAME in PySpark, so true
        # positional selection needs a rename pass: unique temp names,
        # select the kept positions, restore the real names.
        last = {c: i for i, c in enumerate(cols)}
        keep = sorted(last.values())
        tmp = out.toDF(*[f"__c{i}__" for i in range(len(cols))])
        return tmp.select(*[f"__c{i}__" for i in keep]).toDF(
            *[cols[i] for i in keep]
        )

    def _obj(self, row, names: list[str], prefixes: list[str]) -> str:
        return (
            "{"
            + ",".join(
                p + _json_token(row[c]) for p, c in zip(prefixes, names)
            )
            + "}"
        )

    # -- fidelity path ---------------------------------------------------------
    def iter_chunks(self, df: DataFrame) -> Iterator[str]:
        spec = self.spec
        out = _render_temporals(self._dedup_columns(spec.compile_raw(df)))
        # key order and the '"name":' prefixes are row-invariant —
        # computed once, not per row of the single-stream loop
        names = sorted(out.columns) if spec.sort_keys else out.columns
        prefixes = [json.dumps(c, ensure_ascii=False) + ":" for c in names]
        first = True
        for row in out.toLocalIterator():
            obj = self._obj(row, names, prefixes)
            if spec.newline_delimited:
                yield obj + "\n"
            else:
                yield ("[\n" if first else ",\n") + obj
                first = False
        if not spec.newline_delimited and not first:
            yield "\n]\n"
        # empty result ⇒ empty output, not "[]" (json.go:94-98)

    # -- scale path --------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        path: str,
        partition_by: list[str] | None = None,
        *,
        _spread: bool = True,
    ) -> None:
        """Distributed NDJSON via the native writer. Array framing is a
        single-stream format by construction; for scale we still write
        NDJSON part files (callers needing one array concatenate with
        the fidelity path)."""
        spec = self.spec
        out = _render_temporals(
            self._dedup_columns(spec.compile_raw(self._spread_unordered(df, _spread)))
        )
        if spec.sort_keys:
            # qcol: a plain string select parses the names
            out = out.select(*[qcol(c) for c in sorted(out.columns)])
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        (
            writer
            .option("ignoreNullFields", "false")
            # NESTED timestamps (structs/arrays/maps) are rendered by
            # the writer, not _render_temporals; without these the
            # default format truncates to milliseconds — data loss
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
            .json(path)
        )

    def write_array_file(self, df: DataFrame, out_file: str, tmp_dir: str | None = None) -> None:
        """One array-framed document via the DISTRIBUTED writer:
        executors serialize object strings in parallel (the
        ``json_line_expr`` fidelity twin — Go-style floats included,
        which the native NDJSON writer cannot produce), then the
        driver splices the parts into the reference's array framing.
        Byte-identical to the fidelity stream under an order_by
        (tested); the fidelity path serializes every row on the
        driver, here the driver only splices bytes.

        Splice trick: every record is written as ``\\nobj`` with the
        text writer's line separator set to ``,`` — so the document is
        ``[`` + (all parts, byte-concatenated JVM-side, minus the
        final trailing comma) + ``\\n]\\n``. Part bytes never transit
        Python (a 132 MB sf0.1 lineitem assembly previously spent most
        of its time round-tripping text through py4j).

        ROW-ORDER CONTRACT: with an ``order_by`` the document's row
        order is the spec's order, byte-identical to the fidelity
        stream (name-ordered parts preserve the range partitioning).
        WITHOUT one, row order is UNSPECIFIED — the render input is
        round-robin spread across executors (``_spread_unordered``) so
        the dominant per-row serialization runs on every core; the
        document is the same row MULTISET in some permutation (pinned
        by tests/test_export_contracts.py). Callers needing source
        order in a single array document must give an ``order_by`` —
        on a distributed engine 'input order' of an unordered frame is
        not a stable notion to preserve in the first place."""
        tmp = tmp_dir or out_file + "._spark_parts"
        spark = df.sparkSession
        spec = self.spec
        out = self._dedup_columns(spec.compile_raw(self._spread_unordered(df)))
        cols = sorted(out.columns) if spec.sort_keys else out.columns
        lines = out.select(
            F.concat(F.lit("\n"), json_line_expr(out.schema, cols)).alias("value")
        )
        try:
            # inside the cleanup scope: a failed distributed write (a
            # NaN double raises in json_line_expr) must not leak the
            # tmp parts directory
            lines.write.mode("overwrite").option("lineSep", ",").text(tmp)
            fsio.splice_parts(
                tmp,
                out_file,
                prefix="[",
                suffix="\n]\n",
                drop_last_bytes=1,  # the final record's trailing ","
                spark=spark,
            )
        finally:
            fs, jpath = fsio._fs_path(spark, tmp)
            fs.delete(jpath, True)
