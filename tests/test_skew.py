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


def test_aqe_skew_split_fires_on_hot_key(spark):
    """Sentinel for the session's skew posture: a sort-merge join with
    one hot key must come out of AQE with the hot partition SPLIT
    (``skewed`` marker in the AQEShuffleRead of the final plan).

    Thresholds are lowered for the test because the stock 256 MB
    trigger is sized for cluster-scale partitions (the round-10 skew
    sweep documents the same scaling); broadcast is disabled so the
    join models the big-big case where skew splitting is the only
    AQE remedy. If a Spark upgrade or a session-config edit ever
    stops the split from firing, this fails before a straggler does."""
    saved = {
        c: spark.conf.get(c, None)
        for c in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        fact = spark.range(0, 1_000_000, 1, 32).select(
            F.when(F.col("id") % 10 < 8, F.lit(0))  # 80% on one key
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)))
            .alias("k"),
            # incompressible payload that SURVIVES column pruning:
            # skew detection is shuffle-BYTE based, and 800k copies of
            # a constant key alone lz4-compress below any threshold
            F.xxhash64("id", F.lit(1)).alias("v"),
        )
        dim = spark.range(0, 100_001, 1, 32).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("w")
        )
        joined = fact.join(dim, "k").agg(
            F.count("*").alias("n"), F.sum(F.col("v").cast("double") * F.col("w")).alias("t")
        )
        # collect() THIS frame — first()/head() clone a new query
        # execution, leaving joined's own plan pre-execution
        assert joined.collect()[0]["n"] == 1_000_000  # every key matches
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan  # broadcast really was off
        assert "skewed" in plan, f"AQE skew split did not fire:\n{plan}"
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


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
