"""Error handling, approximation, and reshaping operators.

- q_err_handle: the reference's poison-pill policy (§2.1 err-handle,
  ``LogAndContinueExceptionHandler`` at Main.java:88) as a first-class
  query: malformed JSON records are captured, not crashed on and not
  silently dropped. Every 100th record is deliberately mangled, then
  routed through the PERMISSIVE edge codec (sources/json_edge.py).
- q_approx_distinct: HLL approx_count_distinct — the 100 TB path for
  distinct counts (no two-phase expand). Approximation is engine-
  specific, so no SQL oracle; tests assert <5% relative error vs exact.
- q_percentile: exact linear-interpolation percentiles (Spark
  ``percentile`` == DuckDB ``quantile_cont``).
- q_unpivot: wide→long reshape (melt).
- q_scalar_subquery: filter against a scalar aggregate subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.json_edge import decode_json
from ..sources.tables import load_table

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def poisoned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props as a JSON byte stream with every 100th record mangled
    (leading garbage — Spark's Jackson parser tolerates TRAILING bytes
    after the root value, so a prefix is the reliable poison)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_id") % 100 == 0, F.concat(F.lit("x"), "props"))
        .otherwise(F.col("props"))
        .alias("value"),
    )


def _q_err_handle(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = poisoned_events(spark, sf_dir)
    good, corrupt = decode_json(raw, PROPS_SCHEMA, "value", keep_cols=("event_id",))
    g = good.agg(
        F.count(F.lit(1)).alias("n_good"), F.sum("k").alias("k_sum")
    )
    c = corrupt.agg(F.count(F.lit(1)).alias("n_corrupt"))
    return g.crossJoin(c)


def _q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


def _q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's KLL-style sketch
    (percentile_approx) next to the exact values — the 100 TB path for
    quantiles: the sketch merges map-side in O(accuracy) memory per
    group while exact percentile must shuffle-sort every value. Like
    q_approx_distinct (HLL), the sketch is engine-specific so there is
    no DuckDB oracle; tests/test_robustness.py bounds the rank error
    against the exact twin instead (accuracy=1000 ⇒ rank error ≤ 0.1%,
    checked as a value-relative bound on this distribution)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)), 4).alias("ap50"),
        F.round(F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(1000)), 4).alias("ap90"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


def _q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


def _q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.filter(F.col("l_orderkey") <= 200).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    return wide.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    ).withColumn("val", F.round("val", 4))


def _q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1.5× (not 2×) the average: the datagen's price distribution caps
    # near 2× avg, so the 2× threshold selected 0 rows — a trivially
    # hash-matching result that verifies nothing. 1.5× selects ~3.7k.
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM _sq_orders
        WHERE o_totalprice > (SELECT round(1.5 * avg(o_totalprice), 4)
                              FROM _sq_orders)
        """
    )


QUERIES = {
    "q_err_handle": _q_err_handle,
    "q_approx_distinct": _q_approx_distinct,
    "q_approx_percentile": _q_approx_percentile,
    "q_percentile": _q_percentile,
    "q_unpivot": _q_unpivot,
    "q_scalar_subquery": _q_scalar_subquery,
}

ORACLE = {
    "q_err_handle": """
WITH raw AS (
  SELECT event_id,
         CASE WHEN event_id % 100 = 0 THEN 'x' || props ELSE props END AS value
  FROM events
), flagged AS (
  SELECT event_id, value, json_valid(value) AS ok FROM raw
)
SELECT CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
       CAST(sum(CASE WHEN ok THEN CAST(json_extract_string(value, '$.k') AS BIGINT) END) AS BIGINT) AS k_sum,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt
FROM flagged
""",
    # q_approx_distinct: intentionally no oracle (HLL is engine-specific);
    # tests/test_robustness.py bounds the relative error instead.
    "q_percentile": """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus
""",
    "q_unpivot": """
WITH wide AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
  FROM lineitem WHERE l_orderkey <= 200
)
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, round(l_quantity, 4) AS val FROM wide
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', round(l_discount, 4) FROM wide
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', round(l_tax, 4) FROM wide
""",
    "q_scalar_subquery": """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_totalprice > (SELECT round(1.5 * avg(o_totalprice), 4) FROM orders)
""",
}
