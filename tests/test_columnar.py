"""Parquet/ORC sinks: spec pipeline applied, typed round-trip."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from exporter_spark.exporter import Exporter
from exporter_spark.plans.spec import ExportSpec
from exporter_spark.sources.files import load_table


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_round_trip_typed(spark, sf_dir, tmp_path, fmt):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / fmt)
    Exporter(events, fmt, ExportSpec()).write(out)
    back = spark.read.format(fmt).load(out)
    # typed, not stringified (field metadata like the loader's
    # source_type tag intentionally doesn't round-trip)
    assert back.schema.simpleString() == events.schema.simpleString()
    assert back.count() == events.count()
    a = sorted(map(tuple, events.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_columnar_spec_filter_limit_header(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    spec = (
        ExportSpec()
        .with_filter(F.col("event_type") == "click")
        .with_order_by("event_id")
        .with_limit(7)
        .with_custom_header(["id", "when", "user", "kind", "v", "p"])
    )
    out = str(tmp_path / "pq")
    Exporter(events, "parquet", spec).write(out)
    back = spark.read.parquet(out)
    assert back.columns == ["id", "when", "user", "kind", "v", "p"]
    assert back.count() == 7
    assert back.filter(F.col("kind") != "click").count() == 0


def test_columnar_partition_by_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "pq_parts")
    Exporter(events, "parquet", ExportSpec()).write(out, partition_by=["event_type"])
    back = spark.read.parquet(out)
    plan = (
        back.filter(F.col("event_type") == "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition filter reaches the scan: no data-column filter remains
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_columnar_no_text_mode(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    with pytest.raises(NotImplementedError):
        Exporter(events, "parquet", ExportSpec()).write_string()


def test_columnar_single_part(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "one.parquet")
    Exporter(events, "parquet", ExportSpec().with_limit(5)).write_single_part(path)
    assert spark.read.parquet(path).count() == 5
