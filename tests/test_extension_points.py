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
