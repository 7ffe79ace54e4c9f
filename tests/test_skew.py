"""Skew/co-location helpers: salted join equivalence, bucketed join
shuffle elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from exporter_spark.operators.skew import read_bucketed, salted_join, write_bucketed
from exporter_spark.sources.files import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # skew it: everything onto one hot supplier key
    hot = li.withColumn("k", F.when(F.col("l_orderkey") % 3 == 0, 1).otherwise(F.col("l_suppkey")))
    dim = load_table(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "k")
    plain = hot.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    salted = salted_join(hot, dim, "k", salt_buckets=8).agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    assert plain["n"] == salted["n"]
    assert abs(plain["q"] - salted["q"]) < 1e-6


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "dim")], "k long, d string")
    out = salted_join(big, small, "k", salt_buckets=4, how="left").collect()
    by_k = {r["k"]: r["d"] for r in out}
    assert by_k == {1: "dim", 99: None}
    assert len(out) == 2


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # restore the SAVED value, not a copy of session.py's constant —
    # a hard-coded restore silently desyncs the shared session when
    # the factory's threshold is tuned
    saved_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        write_bucketed(li, "li_b", "l_orderkey", num_buckets=4, sort_col="l_orderkey")
        write_bucketed(o, "o_b", "o_orderkey", num_buckets=4, sort_col="o_orderkey")
        joined = read_bucketed(spark, "li_b").join(
            read_bucketed(spark, "o_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing co-located the join
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_thr)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
