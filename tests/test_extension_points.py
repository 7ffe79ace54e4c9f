"""Open extension points: custom formatter (codec.Codec analog,
SURVEY §2.2 K5) and property-based checks of the Go float formatter."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from exporter_spark import Exporter, ExportSpec
from exporter_spark.formatters.base import BaseFormatter
from exporter_spark.functions.tostring import _go_fixed_repr


class MarkdownFormatter(BaseFormatter):
    """A user-defined codec: GitHub-flavored markdown table."""

    def iter_chunks(self, df):
        spec = self.spec
        out = spec.compile(df)
        header = spec.header_names(out)
        yield "| " + " | ".join(header) + " |\n"
        yield "|" + "|".join("---" for _ in header) + "|\n"
        for row in out.toLocalIterator():
            cells = [row[c] if row[c] is not None else "" for c in out.columns]
            yield "| " + " | ".join(cells) + " |\n"


def test_custom_formatter_plugs_in(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], "a long, b string")
    out = Exporter(df, MarkdownFormatter(ExportSpec().with_order_by("a"))).write_string()
    lines = out.splitlines()
    assert lines[0] == "| a | b |"
    assert lines[2] == "| 1 | x |"
    assert lines[3] == "| 2 |  |"


# --------------------------------------------- custom mappers + CellMeta


def test_type_keyed_mapper_all_codecs(spark):
    """Ported shape of reference TestWithCustomType
    (codec/xml/xml_test.go:27-54): one type-keyed registration covers
    every column of that type, across all four codecs, and the mapper
    observes CellMeta (RowID + Driver + Column)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "y")], "a long, b long, s string"
    )

    def custom(col, meta):
        assert meta.driver == "memory"
        assert meta.column.name in ("a", "b")
        return F.concat(
            F.lit("custom:"), col.cast("string"), F.lit("@"),
            F.coalesce(meta.row_id.cast("string"), F.lit("-")),
        )

    spec = ExportSpec().with_order_by("a").with_type_formatter(T.LongType, custom)
    csv = Exporter(df, "csv", spec).write_string()
    assert "custom:1@1,custom:10@1,x" in csv
    assert "custom:2@2,custom:20@2,y" in csv
    xml = Exporter(df, "xml", spec).write_string()
    assert "<a>custom:1@1</a>" in xml and "<b>custom:20@2</b>" in xml
    html = Exporter(df, "html", spec).write_string()
    assert "<td>custom:2@2</td>" in html
    # JSON raw path: mapper output is the serialized value
    js = Exporter(df, "json", spec).write_string()
    assert '"a":"custom:1@1"' in js and '"b":"custom:20@2"' in js


def test_type_mapper_null_bypass_and_column_key_wins(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, None), (2, "v")], "a long, s string")
    spec = (
        ExportSpec()
        .with_order_by("a")
        .with_null("[N]")
        .with_type_formatter(T.StringType, lambda c, m: F.upper(c))
        .with_formatter("a", lambda c, m: F.concat(F.lit(m.driver), c.cast("string")))
    )
    out = Exporter(df, "csv", spec).write_string().splitlines()
    # NULL string bypasses the upper() mapper and renders the custom null
    assert out[1] == "memory1,[N]"
    assert out[2] == "memory2,V"


def test_driver_tag_from_parquet(spark, sf_dir):
    from pyspark.sql import functions as F

    from exporter_spark.sources.files import load_table
    from exporter_spark.sources.meta import driver_of

    df = load_table(spark, sf_dir, "region")
    assert driver_of(df) == "parquet"
    # tag survives projection/filter; mapper sees it
    spec = ExportSpec().with_formatter(
        "r_name", lambda c, m: F.concat(F.lit(m.driver + ":"), c)
    ).with_order_by("r_regionkey").with_limit(1)
    out = Exporter(df.select("r_regionkey", "r_name"), "csv", spec).write_string()
    assert "parquet:" in out


# --------------------------------------------------------- float property

finite_floats = st.floats(allow_nan=False, allow_infinity=False)


@given(finite_floats)
@settings(max_examples=500, deadline=None)
def test_go_float_round_trips(v):
    s = _go_fixed_repr(v)
    assert float(s) == v  # shortest round-trip: parses back exactly


@given(finite_floats)
@settings(max_examples=500, deadline=None)
def test_go_float_fixed_notation(v):
    s = _go_fixed_repr(v)
    assert "e" not in s and "E" not in s  # never exponent notation
    if "." in s:
        assert not s.endswith("0") and not s.endswith(".")  # no trailing zeros
    # note: -0.0 renders as "-0", matching Go strconv.FormatFloat


@given(st.floats(min_value=-1e15, max_value=1e15, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_go_float_integral_has_no_point(v):
    v = float(int(v))  # force integral
    s = _go_fixed_repr(v)
    assert "." not in s


@given(finite_floats)
@settings(max_examples=500, deadline=None)
def test_np_positional_matches_decimal_repr(v):
    """The UDF kernel (np.format_float_positional) must render exactly
    like the Decimal-based reference _go_fixed_repr for every finite
    float — same shortest-round-trip digits, fixed notation, trimmed."""
    import numpy as np

    assert np.format_float_positional(v, unique=True, trim="-") == _go_fixed_repr(v)
