"""Relational / TPC-H-ish queries: joins, aggs, windows, sessionization
and JSON extraction over the star schema + events tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastobo_py_spark.queries._registry import QUERIES, STATIC_SQLS
from fastobo_py_spark.operators.hints import gated_broadcast
from fastobo_py_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Relational / TPC-H-ish (exercise joins, aggs, windows on the star schema)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with partial aggregation."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)        AS sum_qty,
       round(sum(l_extendedprice), 2)   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4)        AS avg_qty,
       round(avg(l_discount), 4)        AS avg_disc,
       count(*)                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k."""
    cust = load_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(gated_broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


SQL_TOP_REVENUE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join; small dims broadcast, the
    orders join shuffled-hash (optimization r6, guide §3.1): orders is
    the one "dim" that grows with the fact table, and building/shipping
    its 1.5M-row broadcast hash relation cost more than shuffling both
    sides (measured 1.28s vs 0.57s for the isolated join at sf1; full
    query 2.44s -> 2.16s). At 100 TB orders cannot broadcast at all, so
    the hint also pins the plan the cluster would need."""
    region = F.broadcast(load_table(spark, sf, "region"))
    nation = F.broadcast(load_table(spark, sf, "nation"))
    supplier = gated_broadcast(load_table(spark, sf, "supplier"))
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").hint("shuffle_hash")
    # project the revenue product BEFORE the one big exchange (guide
    # §2.3 "shuffle fewer bytes"): the join shuffles (key, suppkey, rev)
    # = 24 B/row instead of price+discount = 32 B/row, and the
    # multiplication runs once scan-side. The sum sees the identical
    # multiset of products, so results are unchanged.
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(supplier, (li["l_suppkey"] == supplier["s_suppkey"]) & (customer["c_nationkey"] == supplier["s_nationkey"]))
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum("_rev"), 2).alias("revenue"))
        .orderBy("r_name", "n_name")
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_orders_topk_window(spark: SparkSession, sf: str) -> DataFrame:
    """Window top-k: 3 priciest orders per priority (O17 pattern).

    The partial WindowGroupLimit (top-3 per priority per partition) runs
    fused with the scan; the driver parquet has 2 row groups, so without
    spreading, two tasks sort the whole table (guide §2.5 input skew).
    spread_by is a no-op at real scale and does not change row_number
    output (ties broken by o_orderkey)."""
    from fastobo_py_spark.operators.spread import spread_by

    orders = spread_by(
        load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderpriority", "rank")
    )


SQL_ORDERS_TOPK = """
SELECT o_orderpriority, rank, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3
ORDER BY o_orderpriority, rank
"""


def q_orders_with_returns(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders having at least one
    returned lineitem, counted per priority (LeftSemi, no row blowup)."""
    orders = load_table(spark, sf, "orders")
    returned = load_table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SQL_ORDERS_WITH_RETURNS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS anti-join — customers with no orders,
    counted per market segment (LeftAnti)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Events: time windowing + sessionization
# ---------------------------------------------------------------------------


def q_events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("hour", "event_type")
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30 min) — lag + cumulative sum windows.

    The lag runs over ``ts`` itself and converts to micros AFTER the
    window (optimization r6, guide §2.3): the planner was extracting the
    pre-computed epoch column below the exchange, shipping an extra 8
    B/row; unix_micros is an exact monotone bijection on timestamps, so
    lag/max/min commute with it and every value is unchanged."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lag_us = F.unix_micros(F.lag(F.col("ts"), 1).over(w).cast("timestamp"))
    gap = F.when(us - lag_us > 1800 * 1_000_000, 1).otherwise(0)
    sess = ev.withColumn("new_sess", F.coalesce(gap, F.lit(0))).withColumn(
        "session_ix", F.sum("new_sess").over(w)
    )
    return (
        sess.groupBy("user_id", "session_ix")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp"))).alias("duration_us"),
        )
        .orderBy("user_id", "session_ix")
    )


SQL_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         -- DuckDB sum() OVER returns HUGEINT; Spark emits BIGINT — cast so
         -- the driver's value hash agrees (same fix as duration_us below)
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_ix
  FROM flagged
)
SELECT user_id, session_ix, count(*) AS n_events,
       CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us
FROM numbered
GROUP BY user_id, session_ix
ORDER BY user_id, session_ix
"""


def q_events_props_json(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured extraction: parse the props JSON column and profile
    the extracted key per event type (get_json_object stays JVM-side)."""
    ev = load_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_PROPS = """
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k)   AS min_k,
       max(k)   AS max_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
ORDER BY event_type
"""


def q_events_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time join (operators/asof.py::asof_join): every purchase
    event paired with the user's most recent STRICTLY-prior click — the
    attribution / feature-as-of-sample-time shape of training-data
    assembly. Spark side is the union+window composition (ONE shuffle,
    |L|+|R| rows, no range-join explosion); the oracle is DuckDB's
    native ASOF LEFT JOIN, so two independent as-of implementations must
    agree row for row, including purchases with no prior click (NULLs)."""
    from fastobo_py_spark.operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    j = asof_join(purchases, clicks, on=["user_id"], left_ts="ts", right_ts="click_ts")
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "click_id",
        F.unix_micros(F.col("click_ts").cast("timestamp")).alias("click_ts_us"),
    ).orderBy("event_id")


SQL_EVENTS_ASOF = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
       r.click_id, epoch_us(r.click_ts) AS click_ts_us
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND r.click_ts < l.ts
ORDER BY l.event_id
"""


# ---------------------------------------------------------------------------
# Text analysis (documents table)
# ---------------------------------------------------------------------------


QUERIES.update(
    {
        "pricing_summary": q_pricing_summary,
        "top_revenue_orders": q_top_revenue_orders,
        "region_revenue": q_region_revenue,
        "orders_topk_window": q_orders_topk_window,
        "orders_with_returns": q_orders_with_returns,
        "customers_without_orders": q_customers_without_orders,
        "events_hourly": q_events_hourly,
        "events_sessionize": q_events_sessionize,
        "events_props_json": q_events_props_json,
        "events_asof_join": q_events_asof_join,
    }
)
STATIC_SQLS.update(
    {
        "pricing_summary": SQL_PRICING,
        "top_revenue_orders": SQL_TOP_REVENUE,
        "region_revenue": SQL_REGION_REVENUE,
        "orders_topk_window": SQL_ORDERS_TOPK,
        "orders_with_returns": SQL_ORDERS_WITH_RETURNS,
        "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
        "events_hourly": SQL_EVENTS_HOURLY,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "events_props_json": SQL_EVENTS_PROPS,
        "events_asof_join": SQL_EVENTS_ASOF,
    }
)
