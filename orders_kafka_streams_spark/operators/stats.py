"""Statistical aggregates + array/string utility surface (SURVEY §2.9
scalar/agg completeness): stddev/variance/correlation, ordered string
aggregation, array manipulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_covar"),
    )


def _q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered string aggregation: deterministic via array_sort before join
    cust = load_table(spark, sf_dir, "customer")
    top = cust.filter(F.col("c_custkey") <= 50)
    return top.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


def _q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: F.round(x.cast("double"), 6))
    head8 = F.slice(dvec, 1, 8)
    return emb.select(
        "vec_id",
        F.sort_array(head8).alias("head8_sorted"),
        F.round(F.element_at(F.sort_array(head8, asc=False), 1), 6).alias("head8_max"),
        F.array_contains(F.transform(dvec, lambda x: x > 0), True).alias("has_positive"),
        F.size(F.array_distinct(F.transform(head8, lambda x: F.signum(x)))).alias("n_signs"),
    )


QUERIES = {
    "q_stats_agg": _q_stats_agg,
    "q_string_agg": _q_string_agg,
    "q_array_ops": _q_array_ops,
}

ORACLE = {
    "q_stats_agg": """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(var_samp(l_quantity), 4) AS qty_var,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_discount, l_tax), 8) AS disc_tax_covar
FROM lineitem GROUP BY l_returnflag
""",
    "q_string_agg": """
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS names,
       CAST(count(1) AS BIGINT) AS n
FROM customer WHERE c_custkey <= 50
GROUP BY c_nationkey
""",
    "q_array_ops": """
WITH v AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS d
  FROM embeddings
), h AS (
  SELECT vec_id, d, d[1:8] AS head8 FROM v
)
SELECT vec_id,
       list_sort(head8) AS head8_sorted,
       round(list_sort(head8, 'DESC')[1], 6) AS head8_max,
       list_contains(list_transform(d, x -> x > 0), true) AS has_positive,
       CAST(len(list_distinct(list_transform(head8, x -> CAST(sign(x) AS DOUBLE)))) AS INTEGER) AS n_signs
FROM h
""",
}
