"""Relational extras — windowing, set ops, sessions, attribution.

Split out of the monolithic queries.py in round 15 (second half of
the relational pillar: everything past the 22 TPC-H-flavored
queries); registration order within this module is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from exporter_spark.queries._registry import _dsum, _register
from exporter_spark.sources.files import load_table

@_register(
    "top_customers_per_nation",
    """
    WITH spend AS (
      SELECT n_name, c_custkey, c_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN orders ON o_custkey = c_custkey
      GROUP BY n_name, c_custkey, c_name)
    SELECT n_name, c_custkey, c_name, total_spend, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
                                   ORDER BY total_spend DESC, c_custkey ASC) AS rnk
      FROM spend)
    WHERE rnk <= 3
    """,
)
def top_customers_per_nation(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(_dsum(F.col("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey").asc()
    )
    return (
        spend.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_spend", "rnk")
    )


@_register(
    "distinct_counts",
    """
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def distinct_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@_register(
    "mktsegment_stats",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def mktsegment_stats(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    total = _dsum(F.col("c_acctbal"), 2)
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        total.alias("total_bal"),
        F.round(total / F.count("*"), 6).alias("avg_bal"),
    )


@_register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_register(
    "events_hourly",
    """
    SELECT strftime(ts, '%Y-%m-%d %H') AS hour_bucket, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY hour_bucket, event_type
    """,
)
def events_hourly(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour_bucket"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        _dsum(F.col("value"), 2).alias("total_value"),
    )


@_register(
    "events_sessions",
    """
    WITH gaps AS (
      SELECT user_id, epoch_us(ts) -
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           1 + COUNT(*) FILTER (gap_us > 1800000000) AS n_sessions
    FROM gaps GROUP BY user_id
    """,
)
def events_sessions(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (
            1
            + F.count(F.when(F.col("gap_us") > 1_800_000_000, 1))
        ).cast("bigint").alias("n_sessions"),
    )


@_register(
    "rollup_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_rows"),
        _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")


@_register(
    "order_status_setops",
    """
    SELECT c_custkey FROM customer JOIN orders ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT c_custkey FROM customer JOIN orders ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def order_status_setops(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    open_k = joined.filter(F.col("o_orderstatus") == "O").select("c_custkey")
    fin_k = joined.filter(F.col("o_orderstatus") == "F").select("c_custkey")
    return open_k.subtract(fin_k)  # EXCEPT (set) semantics


@_register(
    "part_brand_stats",
    """
    SELECT p_brand, COUNT(*) AS n_parts,
           COUNT(DISTINCT p_size) AS n_sizes,
           MIN(p_retailprice) AS min_price,
           MAX(p_retailprice) AS max_price
    FROM part GROUP BY p_brand
    """,
)
def part_brand_stats(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("p_size").alias("n_sizes"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
    )


@_register(
    "purchase_attribution",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def purchase_attribution(spark, sf_dir):
    """As-of join: each purchase attributed to the user's most recent
    click at-or-before it (operators/relational.py vs DuckDB ASOF)."""
    from exporter_spark.operators.relational import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "ts"],
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("event_id_asof").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).alias("gap_us"),
    )


@_register(
    "cube_order_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_orders"),
        _dsum(F.col("o_totalprice"), 2).alias("total_price"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")


@_register(
    "running_customer_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def running_customer_revenue(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@_register(
    "purchases_near_errors",
    """
    WITH errors AS (SELECT epoch_us(ts) AS et FROM events WHERE event_type = 'error'),
    purch AS (SELECT event_id AS purchase_id, epoch_us(ts) AS pt
              FROM events WHERE event_type = 'purchase')
    SELECT purchase_id, COUNT(*) AS n_nearby_errors
    FROM purch JOIN errors
      ON pt >= et - 600000000 AND pt < et + 600000000
    GROUP BY purchase_id
    """,
)
def purchases_near_errors(spark, sf_dir):
    """Range join (operators/relational.py): purchases within ±10min
    of any error event, bucketized to avoid the nested-loop plan."""
    from exporter_spark.operators.relational import range_join

    e = load_table(spark, sf_dir, "events")
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.unix_micros("ts").alias("pt")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        (F.unix_micros("ts") - 600_000_000).alias("lo"),
        (F.unix_micros("ts") + 600_000_000).alias("hi"),
    )
    joined = range_join(
        purch, errors, fact_col="pt", lo_col="lo", hi_col="hi", bucket=600_000_000
    )
    return joined.groupBy("purchase_id").agg(F.count("*").alias("n_nearby_errors"))


@_register(
    "lineitem_dispersion",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_discount), 6) AS var_disc,
           ROUND(stddev_pop(l_extendedprice), 2) AS sdp_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_dispersion(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.stddev_pop("l_extendedprice"), 2).alias("sdp_price"),
    )


@_register("approx_distinct_events", None)  # HLL sketches differ per engine
def approx_distinct_events(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


