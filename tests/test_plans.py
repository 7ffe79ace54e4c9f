"""Physical-plan regression tests — the scale posture (pushdown,
pruning, broadcast, codegen) asserted, not just observed."""

from __future__ import annotations

import pytest

from exporter_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = QUERIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")  # untruncated filter/schema lists
    return buf.getvalue()


def test_q6_filters_pushed_to_scan(spark):
    plan = _plan(spark, "q6_revenue_change")
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan


def test_q1_scan_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_quantity" in read and "l_returnflag" in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_small_dim_joins_broadcast(spark):
    for name in ("q3_top_orders", "q5_region_revenue"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_fingerprints_read_only_needed_columns(spark):
    plan = _plan(spark, "doc_fingerprints")
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read and "lang" not in read


def test_java_float_export_has_no_python_eval(spark, sf_dir):
    """The default (float_mode=java) display projection must stay
    fully JVM-side — no Python/Arrow eval stages in the plan."""
    from exporter_spark.functions.tostring import display_columns
    from exporter_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "events")
    out = e.select(display_columns(e, float_mode="java"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # neither Batch- nor Arrow-


def test_go_float_uses_arrow_not_row_python(spark, sf_dir):
    from exporter_spark.functions.tostring import display_columns
    from exporter_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "events")
    out = e.select(display_columns(e, float_mode="go"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized
    assert "BatchEvalPython" not in plan  # never row-at-a-time
