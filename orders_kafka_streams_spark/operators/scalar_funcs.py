"""Scalar function surface (SURVEY §2.9): string, regexp, date/time,
math, JSON, array (higher-order), conditional, and the engine's
portable hash — all Catalyst built-ins inside whole-stage codegen;
no Python executes per row anywhere here.

The JSON queries are the relational face of the reference's dynamic
field access (`orderEvent.get("event.type").getAsString()`,
OrderProcessor.java:111): `get_json_object` for ad-hoc extraction;
the edge codec (sources/json_edge.py) is the parse-once path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import hash60, hash60_sql
from ..sources.tables import load_table


def _q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.ltrim(F.rtrim("p_name")).alias("name_trim"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
    )


def _q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
            (F.rlike(F.col("p_type"), F.lit("^(PROMO|ECONOMY)"))).alias("is_cheap_type"),
        )
    )


def _q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        # cast to DATE: DuckDB's month-granularity date_trunc yields DATE
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        # o_orderdate is parquet TIMESTAMP_NTZ; with the session pinned to
        # UTC the cast to TIMESTAMP is an identity on the instant.
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_ms"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    )


def _q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice"), 0).alias("price_round"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("tax_pct_floor"),
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_quantity"), F.lit(2.0)), 2).alias("qty_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
    )


def _q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_id", k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("k").alias("min_k"), F.max("k").alias("max_k"))
    )


def _q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # higher-order functions over array<float>: size / element_at /
    # transform + aggregate (dot-product building blocks for §2.9
    # similarity search). Cast float→double BEFORE arithmetic so the
    # accumulation is double-precision in both engines.
    emb = load_table(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    norm_sq = F.aggregate(F.transform(dvec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(dvec, 1), 6).alias("first_comp"),
        F.round(F.sqrt(norm_sq), 6).alias("l2_norm"),
        F.round(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x), 6).alias("comp_sum"),
        F.size(F.filter(dvec, lambda x: x > 0)).alias("n_positive"),
    )


def _q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50_000, "small")
        .when(F.col("o_totalprice") < 150_000, "medium")
        .otherwise("large")
    )
    return orders.groupBy(bucket.alias("price_bucket"), "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


def _q_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 500).select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag_coalesced"),
        F.isnull(F.nullif("l_linestatus", F.lit("O"))).alias("is_open"),
    )


def _q_hash60(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The engine's portable hash (functions/portable.py) — checked
    # bit-for-bit against the oracle's formulation; everything MinHash/
    # SimHash downstream (operators/dedup.py) inherits this parity.
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") <= 200).select(
        "c_custkey", hash60(F.col("c_name")).alias("name_hash")
    )



def _q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VariantType: ``parse_json``
    once at the edge (the binary variant encoding replaces repeated
    string re-parsing — the engine's answer to JSON columns at 100 TB),
    then typed ``try_variant_get`` extraction feeding a plain
    aggregation. Oracle extracts the same field with json_extract."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )



def _q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: Spark 4 runs with ANSI mode on, so raw
    division/casts THROW on divide-by-zero or overflow mid-job — at
    scale one poison row kills a stage. try_divide/try_to_number return
    NULL instead, the declarative poison-pill policy (the reference's
    log-and-continue handler, Main.java:88, applied to expressions).
    Oracle mirrors with explicit CASE guards."""
    ev = load_table(spark, sf_dir, "events")
    denom = F.col("event_id") % 3
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.col("value"), denom), 4).alias("per_bucket"),
        F.try_divide(F.lit(1), denom).isNull().alias("was_poison"),
    )


QUERIES = {
    "q_try_arith": _q_try_arith,
    "q_variant": _q_variant,
    "q_str_funcs": _q_str_funcs,
    "q_regexp": _q_regexp,
    "q_date_funcs": _q_date_funcs,
    "q_math_funcs": _q_math_funcs,
    "q_json_funcs": _q_json_funcs,
    "q_array_funcs": _q_array_funcs,
    "q_case_when": _q_case_when,
    "q_coalesce_nullif": _q_coalesce_nullif,
    "q_hash60": _q_hash60,
}

ORACLE = {
    "q_try_arith": """
SELECT event_id,
       round(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value / (event_id % 3) END, 4) AS per_bucket,
       (event_id % 3 = 0) AS was_poison
FROM events
""",
    "q_variant": """
WITH k AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, CAST(count(1) AS BIGINT) AS n,
       round(avg(k), 4) AS avg_k, max(k) AS max_k
FROM k WHERE k IS NOT NULL GROUP BY event_type
""",
    "q_str_funcs": """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       CAST(length(p_name) AS INTEGER) AS name_len,
       p_brand || '|' || p_type AS brand_type,
       substr(p_name, 1, 5) AS name_prefix,
       ltrim(rtrim(p_name)) AS name_trim,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
FROM part
""",
    "q_regexp": """
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
       regexp_matches(p_type, '^(PROMO|ECONOMY)') AS is_cheap_type
FROM part
""",
    "q_date_funcs": """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       date_trunc('month', o_orderdate) AS month_start,
       epoch_ms(o_orderdate) AS epoch_ms,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002
FROM orders
""",
    "q_math_funcs": """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 0) AS price_round,
       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
       round(abs(l_extendedprice - 1000.0), 2) AS abs_diff,
       round(sqrt(l_quantity), 6) AS qty_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(pow(l_quantity, 2.0), 2) AS qty_sq,
       l_orderkey % 7 AS key_mod7
FROM lineitem WHERE l_orderkey <= 1000
""",
    "q_json_funcs": """
WITH k AS (
  SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT k % 10 AS k_bucket, CAST(count(1) AS BIGINT) AS n,
       min(k) AS min_k, max(k) AS max_k
FROM k GROUP BY k % 10
""",
    "q_array_funcs": """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_comp,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
       round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS comp_sum,
       CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INTEGER) AS n_positive
FROM embeddings
""",
    "q_case_when": """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       o_orderstatus,
       CAST(count(1) AS BIGINT) AS n
FROM orders GROUP BY 1, 2
""",
    "q_coalesce_nullif": """
SELECT l_orderkey, l_linenumber,
       nullif(l_returnflag, 'N') AS flag_or_null,
       coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_coalesced,
       nullif(l_linestatus, 'O') IS NULL AS is_open
FROM lineitem WHERE l_orderkey <= 500
""",
    "q_hash60": f"""
SELECT c_custkey, {hash60_sql('c_name')} AS name_hash
FROM customer WHERE c_custkey <= 200
""",
}
