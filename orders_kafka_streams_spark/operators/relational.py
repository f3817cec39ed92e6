"""Relational core: SURVEY §2.9 "free from Catalyst, declared so the
harness checks them" — scans, every join kind, hash aggregation,
rollup/cube/grouping-sets, sort/limit/top-k, set ops, pivot, dedup.

The reference has exactly one hand-rolled join (OrderProcessor.java:46-290)
and one hand-rolled aggregate (Main.java:168-196); everything here is the
rest of a query engine's relational surface, expressed declaratively so
Catalyst supplies the physical strategy.

Scale notes per operator group:
- Joins: fact-fact joins (lineitem ⋈ orders) shuffle on the join key —
  at 100 TB use bucketed tables on orderkey to remove the exchange
  entirely; dim joins (nation, region, customer at 1000× smaller) are
  explicitly broadcast — no shuffle of the fact side.
- Aggregations: all groupBys here are partial-agg friendly (sum/count/
  min/max/avg decompose) → map-side combine runs before the exchange;
  count_distinct over high-cardinality keys uses the 2-phase expand
  Catalyst plans automatically; approx_count_distinct is the 100 TB
  path (HLL, no expand).
- Top-k: global sort+limit is planned as TakeOrderedAndProject (per-
  partition heap + driver merge of k rows, never a full sort);
  per-group top-k is a single window shuffle.
- Floats: aggregate outputs are rounded in-query on BOTH engine sides;
  cross-engine float sums differ in ordering otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    tabs = load_tables(spark, sf_dir, *names)
    return tuple(tabs[n] for n in names)


# --- TPC-H-style analytical queries -----------------------------------------


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): 2-col groupBy + 8 aggregates.

    One exchange; partial aggregation upstream of it does the heavy
    lifting — the classic map-side-combine plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-10 (TPC-H Q3 shape): 3-way join + agg + top-k.

    customer is 40× smaller than lineitem → broadcast; the orders ⋈
    lineitem equi-join shuffles on the order key (bucket both at scale).
    Global top-10 plans as TakeOrderedAndProject.
    """
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): 6-way join, dims broadcast."""
    region, nation, cust, orders, li, supp = _t(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def _q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue filter+sum (TPC-H Q6 shape): pure scan query.

    No join, no shuffle beyond the final single-row agg; every
    predicate is parquet-pushdown-eligible.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def _q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7 shape): dual-role
    nation dim (broadcast twice), year extraction, symmetric predicate."""
    nation, cust, orders, li, supp = _t(
        spark, sf_dir, "nation", "customer", "orders", "lineitem", "supplier"
    )
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def _q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-20 customers by
    lost revenue on returned items in a quarter."""
    cust, orders, li, nation = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def _q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape, adapted: the generator has
    no l_commitdate/l_receiptdate, so the EXISTS predicate is
    ``l_shipdate > o_orderdate`` — same correlated-semi-join plan).

    Catalyst plans the EXISTS as a left-semi hash join on l_orderkey
    with the correlated date comparison as the join residual; the fact
    side aggregates after the semi join, so only qualifying orders
    reach the (tiny, 5-group) final agg.
    """
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        window.join(
            li,
            (window.o_orderkey == li.l_orderkey) & (li.l_shipdate > window.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def _q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect ratio (TPC-H Q14 shape, adapted: generator p_type
    is a bare class name, so the predicate is equality with 'PROMO').

    Conditional aggregate over a broadcast dim join — the ratio of two
    sums computed in ONE pass (no self-join, no second scan).
    """
    li, part = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue"))
    )


def _q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customer (TPC-H Q18 shape): groupBy-HAVING subquery
    feeding the order/customer join.

    r11 (guide §1.2 don't compute things you throw away): the HAVING
    aggregate already holds each qualifying order's quantity sum, so
    the old semi-join back into the fact + per-order RE-aggregation
    (a second full pass over lineitem through the reused exchange)
    computed a value the first aggregation had — the join now carries
    ``qty`` forward and lineitem is read and aggregated exactly once.
    Each output group is one order, so the projection is identical to
    the old re-aggregation bit-for-bit (same longs/doubles summed once
    in the same partial-agg tree). Interleaved A/B: sf0.1 1.6-2.4 →
    1.1-1.5 s, sf1 3.1-3.3 → 2.8-3.1 s; results identical.
    """
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("qty", 2).alias("sum_qty"),
        )
    )


def _q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): three disjunctive
    brand/size/quantity branches.

    The OR-of-ANDs references both sides, so it rides the broadcast
    hash join as a residual; the common `p_partkey = l_partkey` equi
    conjunct still drives the join. Catalyst extracts the
    join-key-independent part-side disjunction (brand ∈ {...}) as a
    pushable prefilter on the build side.
    """
    li, part = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    branch3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 50))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(branch1 | branch2 | branch3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


def _q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape, adapted to the generator's
    star schema: supplier nation plays the "supplying nation" role).

    The numerator/denominator-per-group ratio is ONE conditional
    aggregate over the joined fact — never two scans or a self-join;
    the case-when rides the same partial-agg path as any sum.
    """
    nation, cust, orders, li, supp = _t(
        spark, sf_dir, "nation", "customer", "orders", "lineitem", "supplier"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_1", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


def _q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock shape (TPC-H Q11, adapted: no partsupp table, so
    "value per part" = lineitem revenue per part): keep parts whose
    revenue exceeds a fixed fraction of GLOBAL revenue.

    The global total is a 1-row aggregate broadcast into the per-part
    HAVING — a scalar-subquery plan (no driver round-trip, no second
    scan thanks to exchange reuse).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("value"))
    total = per_part.agg(F.sum("value").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.0005 * F.col("total"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


def _q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority counts (TPC-H Q12 shape, adapted: the
    generator has no l_shipmode, so lines group by l_linestatus):
    the two-conditional-sum pivot over a joined fact."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def _q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-count-per-part-class (TPC-H Q16 shape, adapted: supplier
    relationships come from lineitem instead of partsupp; the excluded-
    supplier predicate keeps the NOT-IN anti-join): count distinct
    suppliers per (brand, type, size-bucket), excluding one brand and
    suppliers with negative account balance."""
    li, part, supp = _t(spark, sf_dir, "lineitem", "part", "supplier")
    bad_supp = supp.filter(F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("bad_key"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.col("p_brand") != "Brand#5")
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", (F.col("p_size") % 10).alias("size_bucket"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape): customers with
    above-average positive balance and NO orders — scalar subquery
    (avg over positive balances) + anti join, composed.

    Both "subqueries" are broadcast: the 1-row average crossed in, the
    order-key set as the anti-join build side; the customer scan never
    shuffles.
    """
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    # threshold rounded to 4 decimals on BOTH engines: avg() differs in
    # the last bits between Spark and DuckDB (sum order), and an
    # unrounded data-dependent threshold can flip boundary rows (same
    # treatment as q_tpch_q17's avg*0.5 cut).
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal")
    )
    # "no orders" adapted to "no RECENT orders" (since 2000-01-01): the
    # driver datagen gives every customer at least one order, so the
    # literal Q22 cohort is empty — and a 0-row result hash-matches
    # trivially, verifying nothing. 55 customers qualify at sf0.01.
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    cohort = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == F.col("o_custkey"), "left_anti")
    )
    return cohort.groupBy((F.col("c_custkey") % 10).alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


def _q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    # right outer: all suppliers kept even with no lineitems (none such in
    # the data generator, but the plan/nullability semantics are covered).
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    agg = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_items"))
    return agg.join(supp, agg.l_suppkey == supp.s_suppkey, "right").select(
        "s_suppkey", "s_name", F.coalesce("n_items", F.lit(0)).alias("n_items")
    )


def _q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    c = cust.select(F.col("c_nationkey").alias("nationkey"))
    s = supp.select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --- join kinds --------------------------------------------------------------


def _q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_spend")
    )
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
    )


def _q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full outer over two aggregates with partially overlapping key sets:
    # customers seen as order-placers vs high-balance customers.
    orders, cust = _t(spark, sf_dir, "orders", "customer")
    placers = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    rich = cust.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey"), F.round("c_acctbal", 2).alias("acctbal")
    )
    return placers.join(rich, "custkey", "full").select(
        "custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("acctbal", F.lit(0.0)).alias("acctbal"),
    )


def _q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXISTS: customers having ≥1 urgent order — left-semi join, no
    # row multiplication, builds only the key set on the right.
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def _q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT EXISTS: customers with no URGENT orders — the dead-letter
    # shape of the reference's expiry path, relational edition. (Every
    # customer has SOME order in the driver datagen, so the unfiltered
    # anti join would be 0 rows — trivially hash-matching; the priority
    # filter yields a 203-customer cohort at sf0.01.)
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def _q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cartesian of the two smallest dims (5 × 25) — planned as
    # BroadcastNestedLoopJoin; declared to cover the join-kind matrix.
    region, nation = _t(spark, sf_dir, "region", "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


def _q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit broadcast hint: supplier (100 rows) into lineitem (600k at
    # sf0.1) — zero shuffle of the fact side; the plan must show
    # BroadcastHashJoin (asserted in tests/test_plans.py).
    li, supp, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


# --- aggregation variants ----------------------------------------------------


def _q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


def _q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers on a rollup — how a consumer tells a subtotal
    row's NULL from a data NULL (the part of grouping sets that
    matters when the dimension itself is nullable)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


def _q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(1) AS n, round(sum(o_totalprice), 2) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot = groupBy + conditional aggregation; pin the pivot values so
    # no discovery pass over the data is needed (required at scale).
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_finished"})
    )


# --- sort / limit / top-k ----------------------------------------------------


def _q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


def _q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-3 customers by balance per nation: one window shuffle on the
    # group key; rank bounded by k so the filter prunes early.
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "rk")
    )


# --- TPC-H: remaining query shapes (Q2/Q9/Q13/Q15/Q17/Q20/Q21), adapted to
# the driver schema (no partsupp table, no l_commitdate/l_receiptdate; see
# TESTDATA.md). Each keeps the original query's *plan shape* — correlated
# subqueries are decorrelated into pre-aggregations + broadcast joins, the
# scalable strategy Catalyst itself uses for scalar subqueries.


def _q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): left outer
    join + double aggregation.

    Instead of joining customer⟕orders then re-aggregating (shuffles the
    full join output), pre-aggregate orders per custkey FIRST — the join
    input shrinks from |orders| to |customers-with-orders| before the
    left join, and the second agg is over |customer| rows only. At 100 TB
    this is the difference between shuffling the fact and shuffling a
    per-key summary.
    """
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def _q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by period revenue (TPC-H Q15 shape): agg view +
    scalar-max subquery, decorrelated as a 1-row broadcast cross join.

    Revenue is rounded BEFORE the max comparison so the equality is on
    identical decimals in both engines (float-sum ordering differs).
    """
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def _q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): correlated
    per-part AVG subquery, decorrelated into a per-part aggregate joined
    back to the fact.

    The per-part avg table is |part|-sized → broadcast; the fact is
    scanned once (the naive correlated form rescans lineitem per part).
    The avg is rounded to 4 decimals on both sides before the threshold
    comparison: double sums agree to ~1e-15 relative, so the rounded
    thresholds are identical and no boundary row can flip.
    """
    li, part = _t(spark, sf_dir, "lineitem", "part")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.round(F.avg("l_quantity") * 0.5, 4).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_q), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def _q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): 5-way join + LIKE filter +
    nation/year rollup. ps_supplycost (no partsupp table) is adapted to
    0.8 * p_retailprice per unit.

    part and supplier/nation are dims → broadcast both; the only fact
    shuffle is lineitem ⋈ orders on orderkey (bucket both at 100 TB).
    """
    li, orders, supp, part, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "part", "nation"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.8) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part.filter(F.col("p_name").like("%red%"))), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


def _q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-shipment suppliers (TPC-H Q20 shape): nested IN subqueries
    decorrelated into semi-join chains. "Availability" (no partsupp) is
    adapted to shipped quantity per (supplier, part) in 1996.

    shipped is a per-(supp,part) aggregate of the fact — the part-name
    filter broadcasts into it, and the final supplier probe is a
    LEFT SEMI join (no row multiplication, dedup for free).
    """
    li, part, supp, nation = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    heavy = (
        shipped.join(F.broadcast(part.filter(F.col("p_name").like("small%"))), F.col("l_partkey") == F.col("p_partkey"), "leftsemi")
        .filter(F.col("qty") > 30)
    )
    nation1 = nation.filter(F.col("n_name") == "NATION_1")
    return (
        supp.join(F.broadcast(nation1), F.col("s_nationkey") == F.col("n_nationkey"), "leftsemi")
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
        .select("s_suppkey", "s_name")
    )


def _q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): EXISTS +
    NOT-EXISTS self-joins on the fact. "Late" (no l_receiptdate/
    l_commitdate) is adapted to l_shipdate > o_orderdate + 30 days.

    The two correlated EXISTS become ONE pass over (orderkey, suppkey)
    cells. r5 shape: the fact joins orders once, aggregates to
    per-(order, supplier) cells (any_late + late-line count — the two
    countDistincts of the r4 form minus their Expand ×2 row doubling),
    and the per-order qualification (n_supp >= 2, n_late_supp == 1)
    is a WINDOW over the cells keyed on orderkey — not a self-join —
    so the fact is scanned ONCE at every scale (the join form
    duplicated the whole fact subtree whenever AQE chose a broadcast
    join, because the two branches' aggregates canonicalize
    differently and ReusedExchange never fired). A qualifying order's
    late lines all belong to its single late supplier, so numwait =
    Σ n_late_lines over qualifying cells. sf1: 5.4-6.5 s (r4) → ~2.5 s.

    r11 (guide §2.4 share one exchange): the fact is repartitioned by
    l_orderkey BEFORE the orders join. orderkey-clustering satisfies
    every downstream requirement — the (orderkey, suppkey) cell
    aggregation (partitioning on a subset of the group keys), the
    per-order window, and (at the scale where orders stops
    broadcasting) the sort-merge join itself, whose required exchange
    this IS — so the plan runs ONE fact-sized exchange at any scale.
    Before, a broadcast orders join left the fact unclustered and the
    ladder paid TWO cell-sized exchanges (agg on (ok, sk), window on
    ok). Interleaved A/B at sf1: 4.1-5.1 → 3.4-4.0 s; results
    bit-identical. The sf1skew hot order (20k lines) lands in one
    task either way — the window already keys on orderkey.
    """
    li, orders, supp, nation = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    li_o = li.select("l_orderkey", "l_suppkey", "l_shipdate").repartition(
        F.col("l_orderkey")
    ).join(orders.filter(F.col("o_orderstatus") == "F"), F.col("l_orderkey") == orders.o_orderkey).withColumn(
        "is_late", (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("int")
    )
    cells = li_o.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late"),
        F.sum("is_late").alias("n_late_lines"),
    )
    w = Window.partitionBy("l_orderkey")
    qualified = (
        cells.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late_supp", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    nation1 = nation.filter(F.col("n_name") == "NATION_1")
    return (
        qualified
        .join(F.broadcast(supp.join(F.broadcast(nation1), F.col("s_nationkey") == F.col("n_nationkey"), "leftsemi")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


def _q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): correlated MIN subquery
    over a region-scoped cost table. "Supply cost" (no partsupp) is
    adapted to min(l_extendedprice / l_quantity) per (part, supplier).

    The correlated min decorrelates into a window MIN over partkey on
    the region-scoped cost table — one shuffle, no per-part rescan. The
    equality filter compares values produced by the SAME division on
    both engines (IEEE-exact), so no rounding is needed for parity;
    output cost is rounded for display stability.
    """
    li, part, supp, nation, region = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    # the p_size semi-join prunes ~98% of the fact BEFORE the cost
    # aggregation's shuffle (it commutes with the per-(part,supp) min):
    # measured 6.0 → 1.1 s steady at sf1 vs aggregating all 2M groups
    li_pruned = li.join(
        F.broadcast(part.filter(F.col("p_size") == 15).select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "leftsemi",
    )
    cost = li_pruned.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    regional = cost.join(F.broadcast(asia_supp), cost.l_suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
    )


# --- set operations / dedup --------------------------------------------------


def _q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    c = cust.select(F.col("c_name").alias("name"), F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind"))
    s = supp.select(F.col("s_name").alias("name"), F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind"))
    return c.unionByName(s).groupBy("kind", "nationkey").agg(F.count(F.lit(1)).alias("n"))


def _q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nations that have both customers and suppliers (INTERSECT = distinct)
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supp.select(F.col("s_nationkey").alias("nationkey")))
    )


def _q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nations with customers but no NEGATIVE-balance suppliers (EXCEPT
    # = distinct). Suppliers cover all 25 nations in the datagen, so
    # the unfiltered set difference would be empty — trivially
    # hash-matching; the balance filter leaves 21 nations at sf0.01.
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    return cust.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supp.filter(F.col("s_acctbal") < 0).select(
            F.col("s_nationkey").alias("nationkey")
        )
    )


def _q_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact dedup on a projection — dropDuplicates on the full projected
    # row (subset-dedup keeps an arbitrary row; projecting first keeps
    # the result deterministic and oracle-checkable).
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_shipdate").dropDuplicates()



def _q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: per order, its top-2 line items by
    price — the SQL-standard correlated form of top-k-per-group.
    Catalyst decorrelates the per-row subquery into a join + ranking
    (the plan shows a broadcast hash join, not a per-row re-execution),
    so the declarative correlated style costs the same as the explicit
    window formulation (q_topk_per_group).

    The probe predicate is repeated on the lineitem side: Catalyst DOES
    infer `l_orderkey < 100` from the equi-join constraint, but the
    inference runs after filter pushdown, so the inferred filter lands
    ABOVE the window exchange and the partial rank still sorts the full
    fact table (measured 11 s at sf1 vs sub-second with the explicit
    predicate reaching PushedFilters). Stating the predicate where the
    optimizer's inference stops short is the standard at-scale fix."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("okss_lat_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("okss_lat_lineitem")
    return spark.sql("""
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM okss_lat_orders o,
        LATERAL (
          SELECT l_linenumber, l_extendedprice
          FROM okss_lat_lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_orderkey < 100
          ORDER BY l_extendedprice DESC, l_linenumber
          LIMIT 2
        ) t
        WHERE o.o_orderkey < 100
    """)


def _q_part_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE hierarchy walk — Spark 4.0's WITH RECURSIVE
    (SPARK-24497, UnionLoop execution) driven from the Spark side for
    the first time (the DuckDB oracle has used recursion since the
    dedup-cluster queries; until now Spark expressed those as
    iterative DataFrame loops with driver-paced convergence checks,
    e.g. dedup.connected_components).

    The hierarchy is derived deterministically from the part table:
    parent(k) = k DIV 10, roots are k < 10 — a ~5-level tree at any
    SF whose per-level fan-out is 10. The walk accumulates TRUE
    path state the closed form can't shortcut: cumulative retail
    price along the ancestor chain (a root→leaf left fold, so the
    double addition order is identical on both engines bit-for-bit).

    Scale shape: each recursion step is ONE distributed hash join of
    the frontier level against the (partkey-pruned) part scan —
    depth is log10(max key), so the loop unrolls to ~6 bounded joins
    at 100 TB, no driver round-trips, no single-task stage; the
    engine's loop operator handles termination (empty frontier), not
    a collect()-based convergence probe.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (SQL planner features)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("okss_hier_part")
    return spark.sql("""
        WITH RECURSIVE walk AS (
          SELECT p_partkey, p_partkey AS root_key, 0 AS depth,
                 p_retailprice AS path_retail
          FROM okss_hier_part WHERE p_partkey < 10
          UNION ALL
          SELECT c.p_partkey, w.root_key, w.depth + 1,
                 w.path_retail + c.p_retailprice
          FROM okss_hier_part c JOIN walk w ON c.p_partkey DIV 10 = w.p_partkey
          WHERE c.p_partkey >= 10
        )
        SELECT p_partkey, root_key, depth, round(path_retail, 4) AS path_retail
        FROM walk
    """)


QUERIES = {
    "q_lateral_topk": _q_lateral_topk,
    "q_part_hierarchy": _q_part_hierarchy,
    "q_tpch_q1": _q_tpch_q1,
    "q_tpch_q3": _q_tpch_q3,
    "q_tpch_q5": _q_tpch_q5,
    "q_tpch_q6": _q_tpch_q6,
    "q_tpch_q7": _q_tpch_q7,
    "q_tpch_q10": _q_tpch_q10,
    "q_tpch_q4": _q_tpch_q4,
    "q_tpch_q8": _q_tpch_q8,
    "q_tpch_q11": _q_tpch_q11,
    "q_tpch_q12": _q_tpch_q12,
    "q_tpch_q16": _q_tpch_q16,
    "q_tpch_q22": _q_tpch_q22,
    "q_tpch_q14": _q_tpch_q14,
    "q_tpch_q18": _q_tpch_q18,
    "q_tpch_q19": _q_tpch_q19,
    "q_tpch_q2": _q_tpch_q2,
    "q_tpch_q9": _q_tpch_q9,
    "q_tpch_q13": _q_tpch_q13,
    "q_tpch_q15": _q_tpch_q15,
    "q_tpch_q17": _q_tpch_q17,
    "q_tpch_q20": _q_tpch_q20,
    "q_tpch_q21": _q_tpch_q21,
    "q_join_left": _q_join_left,
    "q_join_right": _q_join_right,
    "q_union_distinct": _q_union_distinct,
    "q_join_full": _q_join_full,
    "q_join_semi": _q_join_semi,
    "q_join_anti": _q_join_anti,
    "q_join_cross": _q_join_cross,
    "q_join_broadcast": _q_join_broadcast,
    "q_agg_stats": _q_agg_stats,
    "q_rollup": _q_rollup,
    "q_grouping_id": _q_grouping_id,
    "q_cube": _q_cube,
    "q_grouping_sets": _q_grouping_sets,
    "q_pivot": _q_pivot,
    "q_sort_limit": _q_sort_limit,
    "q_topk_per_group": _q_topk_per_group,
    "q_union_all": _q_union_all,
    "q_intersect": _q_intersect,
    "q_except": _q_except,
    "q_drop_duplicates": _q_drop_duplicates,
}

ORACLE = {
    "q_lateral_topk": """
SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
FROM orders o,
LATERAL (
  SELECT l_linenumber, l_extendedprice
  FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber
  LIMIT 2
) t
WHERE o.o_orderkey < 100
""",
    # same recursion, DuckDB's // integer division; the path_retail
    # left fold root->leaf shares Spark's operand order exactly
    "q_part_hierarchy": """
WITH RECURSIVE walk AS (
  SELECT p_partkey, p_partkey AS root_key, 0 AS depth,
         p_retailprice AS path_retail
  FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT c.p_partkey, w.root_key, w.depth + 1,
         w.path_retail + c.p_retailprice
  FROM part c JOIN walk w ON c.p_partkey // 10 = w.p_partkey
  WHERE c.p_partkey >= 10
)
SELECT p_partkey, root_key, depth, round(path_retail, 4) AS path_retail
FROM walk
""",
    "q_tpch_q1": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(1) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "q_tpch_q3": """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    "q_tpch_q5": """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
    "q_tpch_q6": """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
""",
    "q_tpch_q7": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
    "q_tpch_q10": """
SELECT c_custkey, c_name, n_name, c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    "q_tpch_q4": """
SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    "q_tpch_q8": """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
    "q_tpch_q11": """
WITH per_part AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem GROUP BY l_partkey
), total AS (SELECT sum(value) AS total FROM per_part)
SELECT l_partkey, round(value, 2) AS value
FROM per_part CROSS JOIN total
WHERE value > 0.0005 * total
""",
    "q_tpch_q12": """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
    "q_tpch_q16": """
SELECT p_brand, p_type, p_size % 10 AS size_bucket,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
    "q_tpch_q22": """
WITH avg_bal AS (
  SELECT round(avg(c_acctbal), 4) AS avg_bal FROM customer WHERE c_acctbal > 0
)
SELECT c_custkey % 10 AS cntrycode,
       CAST(count(1) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer CROSS JOIN avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2000-01-01')
GROUP BY 1
""",
    "q_tpch_q14": """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
""",
    "q_tpch_q18": """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
    "q_tpch_q19": """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)
""",
    "q_join_right": """
WITH agg AS (
  SELECT l_suppkey, CAST(count(1) AS BIGINT) AS n_items FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, coalesce(n_items, 0) AS n_items
FROM agg RIGHT JOIN supplier ON l_suppkey = s_suppkey
""",
    "q_union_distinct": """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
    "q_join_left": """
WITH per_cust AS (
  SELECT o_custkey, CAST(count(1) AS BIGINT) AS n_orders,
         round(sum(o_totalprice), 2) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(total_spend, 0.0) AS total_spend
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
""",
    "q_join_full": """
WITH placers AS (
  SELECT o_custkey AS custkey, CAST(count(1) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
), rich AS (
  SELECT c_custkey AS custkey, round(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_acctbal > 9000
)
SELECT coalesce(placers.custkey, rich.custkey) AS custkey,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(acctbal, 0.0) AS acctbal
FROM placers FULL OUTER JOIN rich ON placers.custkey = rich.custkey
""",
    "q_join_semi": """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
    "q_join_anti": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
""",
    "q_join_cross": """
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
    "q_join_broadcast": """
SELECT n_name, CAST(count(1) AS BIGINT) AS n_items,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
    "q_agg_stats": """
SELECT l_returnflag,
       CAST(count(1) AS BIGINT) AS n,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       round(sum(l_quantity), 2) AS sum_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
""",
    "q_rollup": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(1) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "q_cube": """
SELECT l_returnflag, l_linestatus,
       CAST(count(1) AS BIGINT) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "q_grouping_id": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(1) AS BIGINT) AS n,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "q_grouping_sets": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(1) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    "q_pivot": """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_finished
FROM lineitem GROUP BY l_returnflag
""",
    "q_sort_limit": """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
""",
    "q_topk_per_group": """
WITH ranked AS (
  SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
         CAST(row_number() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS rk
  FROM customer
)
SELECT * FROM ranked WHERE rk <= 3
""",
    "q_union_all": """
WITH u AS (
  SELECT c_name AS name, c_nationkey AS nationkey, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_name, s_nationkey, 'supplier' FROM supplier
)
SELECT kind, nationkey, CAST(count(1) AS BIGINT) AS n FROM u GROUP BY kind, nationkey
""",
    "q_intersect": """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
    "q_except": """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier WHERE s_acctbal < 0
""",
    "q_drop_duplicates": """
SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem
""",
    "q_tpch_q13": """
WITH c_orders AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(1) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
""",
    "q_tpch_q15": """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    "q_tpch_q17": """
WITH avg_q AS (
  SELECT l_partkey AS ap_key, round(avg(l_quantity) * 0.5, 4) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_q ON l_partkey = ap_key
WHERE p_brand = 'Brand#1' AND l_quantity < half_avg
""",
    "q_tpch_q9": """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount) - 0.8 * p_retailprice * l_quantity), 2) AS profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""",
    "q_tpch_q20": """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1')
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped
    WHERE qty > 30
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  )
""",
    "q_tpch_q21": """
WITH li_o AS (
  SELECT l_orderkey, l_suppkey, s_name,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY THEN 1 ELSE 0 END AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey AS agg_okey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
  FROM li_o GROUP BY l_orderkey
)
SELECT s_name, CAST(count(1) AS BIGINT) AS numwait
FROM li_o JOIN per_order ON l_orderkey = agg_okey
WHERE is_late = 1 AND n_supp >= 2 AND n_late_supp = 1
  AND l_suppkey IN (
    SELECT s_suppkey FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1'))
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
""",
    "q_tpch_q2": """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), regional AS (
  SELECT l_partkey, unit_cost, s_name, n_name
  FROM cost
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT l_partkey AS p_partkey, s_name, n_name, round(unit_cost, 4) AS unit_cost
FROM regional
WHERE unit_cost = (SELECT min(r2.unit_cost) FROM regional r2
                   WHERE r2.l_partkey = regional.l_partkey)
  AND l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
""",
}
