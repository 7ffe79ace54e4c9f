"""Partitioned writes, single-part writes, simhash UDF/SQL parity."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from exporter_spark import Exporter, ExportSpec
from exporter_spark.operators import dedup
from exporter_spark.sources.files import load_table


def test_partitioned_csv_write(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "by_type")
    Exporter(e, "csv", ExportSpec()).write(out, partition_by=["event_type"])
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/event_type=*")}
    assert {"event_type=click", "event_type=purchase"} <= dirs
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == e.count()
    # partition pruning reaches the file listing: the scan node must
    # carry the partition predicate, not just produce correct rows
    pruned = back.filter(F.col("event_type") == "click")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "click" in plan, plan
    assert pruned.count() > 0


def test_write_single_part(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").limit(50)
    target = str(tmp_path / "events.csv")
    Exporter(e, "csv", ExportSpec()).write_single_part(target)
    assert os.path.isfile(target)
    back = spark.read.option("header", "true").csv(target)
    assert back.count() == 50


def test_ndjson_paths_agree_on_timestamps(spark, sf_dir, tmp_path):
    """Distributed NDJSON and the fidelity stream must serialize
    timestamps identically (RFC3339Nano, trimmed fractional zeros)."""
    e = load_table(spark, sf_dir, "events").limit(10)
    spec = ExportSpec().with_newline_delimited(True).with_order_by("event_id")
    fid = set(Exporter(e, "json", spec).write_string().splitlines())
    out = str(tmp_path / "nd")
    Exporter(e, "json", spec).write(out)
    native = set()
    for p in glob.glob(f"{out}/part-*"):
        if not p.endswith(".crc"):
            native.update(l for l in open(p).read().splitlines() if l)
    assert fid == native


def test_csv_paths_agree_on_quoting(spark, tmp_path):
    """The distributed writer and the fidelity stream must emit
    byte-identical records (regression: Spark's default backslash
    escape diverged from Go quote-doubling)."""
    df = spark.createDataFrame(
        [(1, 'say "hi"'), (2, "a,b"), (3, "plain")], "id long, v string"
    )
    spec = ExportSpec().with_order_by("id")
    fid = Exporter(df, "csv", spec).write_string().splitlines()
    target = str(tmp_path / "one.csv")
    Exporter(df, "csv", spec).write_single_part(target)
    native = open(target).read().splitlines()
    assert fid == native
    assert '"say ""hi"""' in fid[1]


def test_simhash_udf_matches_sql_expr(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    both = docs.select(
        dedup.simhash32("text").alias("sql_fp"),
        dedup._simhash32_fast()(F.col("text")).alias("udf_fp"),
    )
    rows = both.collect()
    assert all(r["sql_fp"] == r["udf_fp"] for r in rows)


def test_xml_single_part_matches_fidelity(spark, sf_dir, tmp_path):
    """XML single-part (executor-formatted row stream + wrapper) must
    be byte-identical to the driver-streamed fidelity document."""
    from exporter_spark.formatters.xml import XMLFormatter

    e = load_table(spark, sf_dir, "events").limit(25)
    spec = ExportSpec().with_order_by("event_id")
    fmt = XMLFormatter(spec)
    target = str(tmp_path / "events.xml")
    fmt.write_single_part(e, target)
    assert open(target, encoding="utf-8").read() == fmt.format_string(e)


def test_xml_single_part_empty(spark, sf_dir, tmp_path):
    """Empty input ⇒ empty file, matching the fidelity path's
    no-output behavior (xml.go:68-70)."""
    from exporter_spark.formatters.xml import XMLFormatter

    e = load_table(spark, sf_dir, "events").limit(0)
    target = str(tmp_path / "empty.xml")
    XMLFormatter(ExportSpec()).write_single_part(e, target)
    assert os.path.getsize(target) == 0


def test_xml_stream_parts_concat(spark, sf_dir, tmp_path):
    """Default scale path: concatenated parts + wrapper == the full
    document body (rows come from the same Catalyst expression)."""
    from exporter_spark.formatters.xml import XMLFormatter

    e = load_table(spark, sf_dir, "events").limit(40)
    out = str(tmp_path / "xml_stream")
    fmt = XMLFormatter(ExportSpec())
    fmt.write(e, out)
    lines = []
    for p in sorted(glob.glob(f"{out}/part-*")):
        if not p.endswith(".crc"):
            lines += open(p, encoding="utf-8").read().splitlines()
    assert len(lines) == 40
    assert all(l.startswith("<row>") and l.endswith("</row>") for l in lines)


def test_json_array_file_matches_fidelity(spark, sf_dir, tmp_path):
    """Distributed array assembly (executor NDJSON parts + driver
    splice) must be byte-identical to the driver-streamed fidelity
    array document."""
    from exporter_spark.formatters.json import JSONFormatter

    e = load_table(spark, sf_dir, "events").limit(120)
    spec = ExportSpec().with_order_by("event_id")
    target = str(tmp_path / "arr.json")
    JSONFormatter(spec).write_array_file(e, target)
    assert open(target, encoding="utf-8").read() == Exporter(
        e, "json", spec
    ).write_string()
    assert not os.path.exists(target + "._spark_parts")  # tmp cleaned

    # empty input => empty file, not "[]" (json.go:94-98)
    empty_target = str(tmp_path / "empty.json")
    JSONFormatter(spec).write_array_file(e.limit(0), empty_target)
    assert open(empty_target).read() == ""


def test_html_sidecars_on_hadoop_scheme(spark, sf_dir, tmp_path):
    """HTML scale path + assembly through explicit file:-scheme Hadoop
    paths (the object-store-safe route): assembled document equals the
    fidelity stream."""
    from exporter_spark.formatters.html import HTMLFormatter, assemble_html

    e = load_table(spark, sf_dir, "events").limit(30)
    spec = ExportSpec().with_order_by("event_id")
    parts = "file://" + str(tmp_path / "html_parts")
    fmt = HTMLFormatter(spec)
    fmt.write(e, parts)
    assembled = "file://" + str(tmp_path / "all.html")
    assemble_html(parts, assembled, spark)
    got = open(str(tmp_path / "all.html"), encoding="utf-8").read()
    assert got == fmt.format_string(e)


def test_csv_native_path_preserves_whitespace(spark, tmp_path):
    """Spark's CSV write defaults trim unquoted fields — silent data
    corruption the scale path must disable. Values (not bytes) must
    round-trip identically to the fidelity stream."""
    df = spark.createDataFrame(
        [(1, "  leading"), (2, "trailing  "), (3, "\tTabbed")], "id long, v string"
    )
    spec = ExportSpec().with_order_by("id")
    out = str(tmp_path / "ws")
    Exporter(df, "csv", spec).write(out)
    back = spark.read.options(header="true", quote='"', escape='"').csv(out)
    got = {r["id"]: r["v"] for r in back.collect()}
    assert got == {"1": "  leading", "2": "trailing  ", "3": "\tTabbed"}


def test_csv_go_quoting_parts_match_fidelity(spark, tmp_path):
    """go_quoting=True: distributed records are byte-identical to the
    fidelity stream, Go quirks included (leading-IsSpace quoting, the
    lone backslash-dot)."""
    from exporter_spark.formatters.csv import CSVFormatter

    df = spark.createDataFrame(
        [(1, "  leading"), (2, 'say "hi"'), (3, "a,b"), (4, r"\."), (5, "plain")],
        "id long, v string",
    )
    spec = ExportSpec().with_order_by("id")
    out = str(tmp_path / "goq")
    CSVFormatter(spec).write(df, out, go_quoting=True)
    lines = []
    for p in sorted(glob.glob(f"{out}/part-*")):
        if not p.endswith(".crc"):
            lines += open(p, encoding="utf-8").read().splitlines()
    fid = Exporter(df, "csv", spec).write_string().splitlines()
    assert lines == fid[1:]  # bare records: no header in parts
    assert '"  leading"' in lines[0] and '"\\."' in lines[3]


def test_xml_stream_parts_partitioned(spark, sf_dir, tmp_path):
    """Default XML scale path under hive-style partition_by: rows land
    under their partition directories as bare <row> records."""
    from exporter_spark.formatters.xml import XMLFormatter

    e = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "xml_part")
    XMLFormatter(ExportSpec()).write(e, out, partition_by=["event_type"])
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/event_type=*")}
    assert {"event_type=click", "event_type=purchase"} <= dirs
    lines = []
    for p in glob.glob(f"{out}/event_type=*/part-*"):
        if not p.endswith(".crc"):
            lines += open(p, encoding="utf-8").read().splitlines()
    assert len(lines) == e.count()
    assert all(l.startswith("<row>") and l.endswith("</row>") for l in lines)
    # partition column is carried by the directory, not the row body
    assert all("<event_type>" not in l for l in lines[:50])


def test_html_assemble_lazy_header_empty(spark, sf_dir, tmp_path):
    """Lazy header (with_header_when_no_data(False)) + empty input:
    assembled document is EMPTY, matching the fidelity stream's
    no-output rule (html.go:146-157); the default eager spec keeps
    the skeleton."""
    from exporter_spark.formatters.html import HTMLFormatter

    e = load_table(spark, sf_dir, "events").limit(0)
    lazy_spec = ExportSpec().with_header_when_no_data(False)
    fmt = HTMLFormatter(lazy_spec)
    parts = str(tmp_path / "empty_parts")
    fmt.write(e, parts)
    out = str(tmp_path / "empty.html")
    fmt.assemble(parts, out, spark)
    assert open(out).read() == "" == fmt.format_string(e)

    eager = HTMLFormatter(ExportSpec())
    eager.write(e, str(tmp_path / "eager_parts"))
    eager.assemble(str(tmp_path / "eager_parts"), str(tmp_path / "eager.html"), spark)
    assert open(str(tmp_path / "eager.html")).read() == eager.format_string(e)


def test_xml_documents_mode_omits_null_elements(spark, tmp_path):
    """documents=True (StAX writer) must keep the reference's NULL
    rule — a NULL cell omits its element entirely (xml.go:113-115) —
    even though its pretty-printed layout is not byte-parity."""
    from exporter_spark.formatters.xml import XMLFormatter

    df = spark.createDataFrame([(1, None, "x")], "id long, a string, b string")
    out = str(tmp_path / "docs")
    XMLFormatter(ExportSpec()).write(df, out, documents=True)
    body = "".join(
        open(p, encoding="utf-8").read()
        for p in glob.glob(f"{out}/part-*")
        if not p.endswith(".crc")
    )
    assert "<a>" not in body and "<b>x</b>" in body


def test_json_array_decimal_and_ntz_parity(spark, tmp_path):
    """json_line_expr's fallback branches: decimals render as QUOTED
    strings (matching _json_token's str() fallthrough) and
    timestamp_ntz columns plan and render instead of crashing."""
    from decimal import Decimal

    from exporter_spark.formatters.json import JSONFormatter

    df = spark.createDataFrame(
        [(1, Decimal("11.50")), (2, Decimal("0.07"))], "id long, d decimal(10,2)"
    )
    spec = ExportSpec().with_order_by("id")
    target = str(tmp_path / "dec.json")
    JSONFormatter(spec).write_array_file(df, target)
    got = open(target).read()
    assert got == Exporter(df, "json", spec).write_string()
    assert '"d":"11.50"' in got

    import datetime as dt

    ntz = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 3, 4, 5, 500000))], "id long, ts timestamp_ntz"
    )
    t2 = str(tmp_path / "ntz.json")
    JSONFormatter(spec).write_array_file(ntz, t2)
    assert '"ts":"2024-01-02T03:04:05.5Z"' in open(t2).read()


def test_json_array_nan_raises(spark, tmp_path):
    """NaN/Inf doubles: Go's encoding/json errors, the fidelity path
    raises — the distributed array writer must fail loudly too."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from exporter_spark.formatters.json import JSONFormatter

    df = spark.createDataFrame([(1, float("nan"))], "id long, v double")
    # only the two Spark-side error wrappers: a bare Exception would
    # also accept unrelated crashes and make the test meaningless
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        JSONFormatter(ExportSpec()).write_array_file(df, str(tmp_path / "nan.json"))


def test_json_array_nan_cleans_tmp(spark, tmp_path):
    """A failed distributed write must not leak the parts directory."""
    import pytest

    from exporter_spark.formatters.json import JSONFormatter

    df = spark.createDataFrame([(1, float("nan"))], "id long, v double")
    target = str(tmp_path / "nan.json")
    with pytest.raises(Exception):
        JSONFormatter(ExportSpec()).write_array_file(df, target)
    assert not os.path.exists(target + "._spark_parts")


def test_json_array_nested_null_fields_and_timestamps(spark, tmp_path):
    """Nested struct NULL fields must survive (Jackson's default drops
    them) and nested timestamps must keep full microsecond precision
    (the default to_json format truncates to milliseconds)."""
    import datetime as dt

    from exporter_spark.formatters.json import JSONFormatter

    df = spark.createDataFrame(
        [(1, (None, 2), [dt.datetime(2024, 1, 2, 3, 4, 5, 123456)])],
        "id long, s struct<a:long,b:long>, ts array<timestamp>",
    )
    spec = ExportSpec().with_order_by("id")
    target = str(tmp_path / "nested.json")
    JSONFormatter(spec).write_array_file(df, target)
    got = open(target, encoding="utf-8").read()
    assert '"s":{"a":null,"b":2}' in got
    assert "123456" in got  # microseconds not truncated to .123


def test_json_array_control_char_escape_case(spark, tmp_path):
    """Jackson up-cases \\u escapes; the fidelity serializer's
    json.dumps writes lowercase. The array path must byte-match the
    fidelity stream on raw control characters AND must not touch
    literal backslash-u text (whose backslash Jackson doubles)."""
    from exporter_spark.formatters.json import JSONFormatter

    df = spark.createDataFrame(
        [
            (1, "a\x0bb"),  # raw vertical tab
            (2, "x\x1a\x1a\x1ay"),  # adjacent identical escapes
            (3, "lit \\u000B text"),  # literal text, case preserved
            (4, "\\\\u000E"),  # doubled literal backslashes
        ],
        "id long, t string",
    )
    spec = ExportSpec().with_order_by("id")
    target = str(tmp_path / "ctrl.json")
    JSONFormatter(spec).write_array_file(df, target)
    got = open(target, encoding="utf-8").read()
    assert got == Exporter(df, "json", spec).write_string()
    assert '"a\\u000bb"' in got
    assert "\\u001a\\u001a\\u001a" in got
    assert "lit \\\\u000B text" in got


def test_xml_single_part_object_store_path(spark, sf_dir, tmp_path):
    """write_single_part assembles through the Hadoop FS API — drive
    it with an explicit file:-scheme path (the object-store-safe
    route) and check byte parity with the fidelity stream, plus the
    empty-input empty-file rule and tmp cleanup."""
    from exporter_spark.formatters.xml import XMLFormatter

    e = load_table(spark, sf_dir, "events").limit(40)
    spec = ExportSpec().with_order_by("event_id")
    target = str(tmp_path / "doc.xml")
    XMLFormatter(spec).write_single_part(e, "file:" + target)
    assert open(target, encoding="utf-8").read() == Exporter(
        e, "xml", spec
    ).write_string()
    assert not os.path.exists(target + "._spark_tmp")

    empty_target = str(tmp_path / "empty.xml")
    XMLFormatter(spec).write_single_part(e.limit(0), "file:" + empty_target)
    assert open(empty_target).read() == ""


def test_html_single_part_is_complete_document(spark, sf_dir, tmp_path):
    """write_single_part must assemble the skeleton sidecars, not
    promote the bare rows part."""
    from exporter_spark.formatters.html import HTMLFormatter

    e = load_table(spark, sf_dir, "events").limit(10)
    spec = ExportSpec().with_order_by("event_id")
    target = str(tmp_path / "doc.html")
    HTMLFormatter(spec).write_single_part(e, target)
    got = open(target, encoding="utf-8").read()
    assert got == Exporter(e, "html", spec).write_string()
    assert got.startswith("<!DOCTYPE html>") and got.rstrip().endswith("</html>")
    assert not os.path.exists(target + "._spark_tmp")

    # lazy-header rule: empty input => empty file
    empty = str(tmp_path / "empty.html")
    HTMLFormatter(
        ExportSpec().with_order_by("event_id").with_header_when_no_data(False)
    ).write_single_part(e.limit(0), empty)
    assert open(empty).read() == ""


def test_exporter_rejects_conflicting_spec(spark, sf_dir):
    from exporter_spark.formatters.csv import CSVFormatter

    e = load_table(spark, sf_dir, "events").limit(1)
    import pytest

    with pytest.raises(ValueError, match="formatter instance"):
        Exporter(e, CSVFormatter(), ExportSpec().with_limit(5))
    # same spec object through the formatter is fine
    spec = ExportSpec()
    Exporter(e, CSVFormatter(spec), spec).write_string()


def test_ndjson_write_preserves_ntz_and_nested_micros(spark, tmp_path):
    """The distributed NDJSON writer must not truncate temporal
    precision: top-level NTZ renders like the fidelity path, nested
    timestamps keep microseconds."""
    import datetime as dt
    import glob

    from exporter_spark.formatters.json import JSONFormatter

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 3, 4, 5, 500000),
          [dt.datetime(2024, 1, 2, 3, 4, 5, 123456)])],
        "id long, nt timestamp_ntz, ts array<timestamp>",
    )
    out = str(tmp_path / "ndjson_out")
    JSONFormatter(ExportSpec().with_newline_delimited(True)).write(df, out)
    text = "".join(
        open(p, encoding="utf-8").read()
        for p in sorted(glob.glob(f"{out}/part-*"))
        if not p.endswith(".crc")
    )
    assert '"nt":"2024-01-02T03:04:05.5Z"' in text
    assert "123456" in text  # nested micros survive


def test_splice_parts_rejects_overlong_drop(spark, tmp_path):
    import pytest

    from exporter_spark import fsio

    d = str(tmp_path / "parts")
    os.makedirs(d)
    open(f"{d}/part-00000", "w").write("x")
    with pytest.raises(ValueError, match="exceeds"):
        fsio.splice_parts(d, str(tmp_path / "out"), drop_last_bytes=2, spark=spark)


def test_xml_documents_mode_honors_declaration_off(spark, sf_dir, tmp_path):
    import glob

    from exporter_spark.formatters.xml import XMLFormatter

    import dataclasses

    e = load_table(spark, sf_dir, "events").limit(5)
    spec = dataclasses.replace(ExportSpec(), declaration=False)
    out = str(tmp_path / "xml_docs")
    XMLFormatter(spec).write(e.coalesce(1), out, documents=True)
    part = [p for p in glob.glob(f"{out}/part-*") if not p.endswith(".crc")][0]
    assert not open(part, encoding="utf-8").read().startswith("<?xml")
