"""Window functions (SURVEY §2.9): ranking, offsets, frames.

Each query is a single window exchange — partitionBy keys are chosen
so the shuffle key matches the analytical key (no secondary shuffle).
Every ORDER BY includes a unique tiebreaker: row_number/lag/lead over
non-unique orderings are nondeterministic across engines (and across
Spark runs), which would break the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 2)
    )


def _q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_total"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_total"),
    )


def _q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    # Global ORDER BY window = single partition: fine at dim-table size,
    # replaced by range-partitioned quantiles (approxQuantile) at fact scale.
    return cust.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.ntile(4).over(w).alias("quartile"),
    )


def _q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.filter(F.col("l_suppkey") <= 10).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


def _q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE frame over a numeric ordering: for each order, count + sum of
    # same-customer orders within $1000 below its price (peers included —
    # deterministic without a tiebreaker, unlike ROWS frames).
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_within_1k"),
    )


def _q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return li.filter(F.col("l_orderkey") <= 2000).select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(w).alias("last_part"),
    )


def _q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + percent_rank per event type over value — the
    distribution-position pair (same single window shuffle as rank)."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("value"))
    return ev.filter(F.col("user_id") < 50).select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def _q_window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a running frame: each order sees its customer's
    2nd-earliest order price so far (frame-sensitive nth — null until
    the frame holds two rows, unlike first/last)."""
    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.filter(F.col("o_custkey") < 200).select(
        "o_custkey",
        "o_orderkey",
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_seen_price"),
    )


QUERIES = {
    "q_window_rank": _q_window_rank,
    "q_window_cume": _q_window_cume,
    "q_window_nth": _q_window_nth,
    "q_window_lag_lead": _q_window_lag_lead,
    "q_window_ntile": _q_window_ntile,
    "q_window_running": _q_window_running,
    "q_window_range": _q_window_range,
    "q_window_first_last": _q_window_first_last,
}

ORACLE = {
    "q_window_nth": """
SELECT o_custkey, o_orderkey,
       round(nth_value(o_totalprice, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS second_seen_price
FROM orders WHERE o_custkey < 200
""",
    "q_window_cume": """
WITH f AS (
  SELECT event_id, event_type, value FROM events WHERE user_id < 50
)
SELECT event_id, event_type, round(value, 4) AS value,
       round(cume_dist() OVER w, 6) AS cume,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM f
WINDOW w AS (PARTITION BY event_type ORDER BY value ASC)
""",
    "q_window_rank": """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
         CAST(row_number() OVER w AS INTEGER) AS rn,
         CAST(rank() OVER w AS INTEGER) AS rnk,
         CAST(dense_rank() OVER w AS INTEGER) AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
)
SELECT * FROM ranked WHERE rn <= 2
""",
    "q_window_lag_lead": """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
       round(lag(o_totalprice, 1) OVER w, 2) AS prev_total,
       round(lead(o_totalprice, 1) OVER w, 2) AS next_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    "q_window_ntile": """
SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
       CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS quartile
FROM customer
""",
    "q_window_running": """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER w, 2) AS running_qty,
       CAST(count(1) OVER w AS BIGINT) AS running_n
FROM lineitem
WHERE l_suppkey <= 10
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    "q_window_range": """
SELECT o_custkey, o_orderkey,
       CAST(count(1) OVER w AS BIGINT) AS n_within_1k,
       round(sum(o_totalprice) OVER w, 2) AS sum_within_1k
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
""",
    "q_window_first_last": """
SELECT l_orderkey, l_linenumber,
       first_value(l_partkey) OVER w AS first_part,
       last_value(l_partkey) OVER w AS last_part
FROM lineitem
WHERE l_orderkey <= 2000
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
}
