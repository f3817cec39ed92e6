"""Skew-handling operators (SURVEY §2.9 / 100 TB design notes).

AQE's skew-join splitting handles sort-merge skew automatically, but
two patterns still need explicit treatment at scale and are provided
as first-class operators here:

- :func:`salted_join` — replicate the small side across N salt values
  and shard the big side's hot keys N ways. Identical results to the
  plain join (verified against the plain-SQL oracle); the salt only
  changes physical row routing, never the match set.
- :func:`two_phase_agg` — pre-aggregate on (key, salt) before the
  final combine on key. For algebraic aggs (sum/count/min/max) Spark's
  partial aggregation already does this map-side; the explicit form is
  for when the combine input itself is skewed (e.g. collect-style or
  distinct-heavy aggs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import hash60
from ..sources.tables import load_table

N_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_src: Column,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key sharding.

    ``salt_src`` is any big-side expression with per-row variation (a
    row id); the salt is its hash mod ``n_salts``, so results are
    deterministic. The small side is exploded ×n_salts — acceptable
    when small ≪ big, which is the only regime where salting beats
    AQE anyway.
    """
    on = list(on)
    # the salt is Spark-internal (the oracle checks the UNsalted result),
    # so the codegen'd xxhash64 beats the portable md5 hash60 — measured
    # 13.4 s → most of it the 6M-row md5 chain at sf1
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, on + ["_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_src: Column,
    aggs: dict[str, Column],
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Salted two-phase aggregation for combine-skewed aggregates.

    ``aggs`` maps output name → FIRST-phase aggregate expression; the
    second phase re-aggregates with sum/min/max by name convention:
    callers supply decomposable aggregates (count→sum, sum→sum,
    min→min, max→max).
    """
    keys = list(keys)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in aggs.items()]
    )
    recombine = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }

    def second(name: str) -> Column:
        for prefix, fn in recombine.items():
            if name.startswith(prefix):
                return fn(f"_p_{name}").alias(name)
        raise ValueError(f"cannot recombine aggregate {name!r}; name it count*/sum*/min*/max*")

    return phase1.groupBy(*keys).agg(*[second(n) for n in aggs])


def _q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same logical result as a plain lineitem ⋈ supplier rollup — the
    # oracle is the PLAIN join, proving salting is result-transparent.
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    joined = salted_join(
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
        supp.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"),
        on=["l_suppkey"],
        salt_src=F.concat_ws("-", "l_orderkey", "l_linenumber"),
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


def _q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = two_phase_agg(
        ev,
        keys=["event_type"],
        salt_src=F.col("event_id").cast("string"),
        aggs={
            "count_events": F.count(F.lit(1)),
            "sum_value": F.sum(F.round(F.col("value"), 4)),
            "min_user": F.min("user_id"),
            "max_user": F.max("user_id"),
        },
    )
    return out.withColumn("sum_value", F.round("sum_value", 4))


def _q_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics — the "should I salt this join?"
    planner audit: for each candidate join/agg key, the top-1 and
    top-10 key shares and the p50/p99 group sizes. A top-1 share near
    1/partitions means one reducer owns the straggler; AQE skew-join
    handles moderate cases, salting (q_salted_join) the pathological
    ones — this query is the measurement that picks.

    Scale shape: one partial-aggregated count per key per table, then
    per-key-space aggregates over the count relation (percentile over
    group SIZES, not rows); output is 3 rows. The facts never shuffle —
    only (key, count) cells do."""
    specs = [
        ("events.user_id", load_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))),
        ("orders.o_custkey", load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))),
        ("lineitem.l_orderkey", load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))),
    ]
    out = None
    for name, df in specs:
        g = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        # top-10 via orderBy+limit = TakeOrderedAndProject (per-partition
        # heaps) — a global rank window would single-partition the whole
        # (key, count) relation
        tops = (
            g.orderBy(F.desc("n"), F.asc("k"))
            .limit(10)
            .agg(F.max("n").alias("top1"), F.sum("n").alias("top10"))
        )
        tot = g.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.percentile("n", F.lit(0.5)).alias("p50_group"),
            F.percentile("n", F.lit(0.99)).alias("p99_group"),
        )
        agg = tot.crossJoin(F.broadcast(tops)).select(
            F.lit(name).alias("key_space"),
            "n_keys",
            "n_rows",
            F.round(F.col("top1") / F.col("n_rows"), 6).alias("top1_share"),
            F.round(F.col("top10") / F.col("n_rows"), 6).alias("top10_share"),
            "p50_group",
            "p99_group",
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def _q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join through BUCKETED tables — the 100 TB co-location
    strategy made driver-checkable: lineitem and orders persisted
    bucketed-and-sorted by the order key join with ZERO exchanges
    (each bucket pair sort-merges locally; the zero-Exchange plan is
    asserted under disabled auto-broadcast in tests/test_bucketing.py),
    and the result is provably identical to the plain join (the oracle
    IS the plain join).

    The bucketed tables are written once per (session, sf) into the
    session warehouse; if the warehouse is unwritable in the calling
    environment the query falls back to the plain join — same rows,
    co-location evidence then lives in the unit test only."""
    import hashlib

    from ..sources.bucketing import bucketed_pair

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    key = hashlib.md5(f"{sf_dir}:{spark.sparkContext.applicationId}".encode()).hexdigest()[:8]
    prefix = f"okss_bj_{key}"
    lt, rt = f"{prefix}_l", f"{prefix}_r"
    try:
        if spark.catalog.tableExists(lt) and spark.catalog.tableExists(rt):
            bl, br = spark.table(lt), spark.table(rt)
        else:
            bl, br = bucketed_pair(spark, li, orders, "l_orderkey", "o_orderkey", prefix=prefix)
    except Exception:
        bl, br = li, orders  # unwritable warehouse: plain-join fallback
    joined = bl.join(br, bl["l_orderkey"] == br["o_orderkey"])
    return joined.groupBy((F.col("o_orderkey") % 100).alias("okey_bucket")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


QUERIES = {
    "q_salted_join": _q_salted_join,
    "q_salted_agg": _q_salted_agg,
    "q_skew_audit": _q_skew_audit,
    "q_bucketed_join": _q_bucketed_join,
}

ORACLE = {
    "q_bucketed_join": """
SELECT CAST(o_orderkey % 100 AS BIGINT) AS okey_bucket,
       CAST(count(1) AS BIGINT) AS n_items,
       round(sum(l_quantity), 2) AS total_qty,
       round(sum(o_totalprice), 2) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey % 100
""",
    "q_skew_audit": """
WITH g AS (
  SELECT k, CAST(count(1) AS BIGINT) AS n FROM (
    SELECT user_id AS k FROM events) GROUP BY k
),
tops AS (
  SELECT max(n) AS top1, CAST(sum(n) AS BIGINT) AS top10
  FROM (SELECT n FROM g ORDER BY n DESC, k ASC LIMIT 10)
),
tot AS (
  SELECT CAST(count(1) AS BIGINT) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
         quantile_cont(n, 0.5) AS p50_group, quantile_cont(n, 0.99) AS p99_group
  FROM g
),
r1 AS (
  SELECT 'events.user_id' AS key_space, n_keys, n_rows,
         round(top1 / CAST(n_rows AS DOUBLE), 6) AS top1_share,
         round(top10 / CAST(n_rows AS DOUBLE), 6) AS top10_share,
         p50_group, p99_group
  FROM tot CROSS JOIN tops
),
g2 AS (
  SELECT k, CAST(count(1) AS BIGINT) AS n FROM (
    SELECT o_custkey AS k FROM orders) GROUP BY k
),
tops2 AS (
  SELECT max(n) AS top1, CAST(sum(n) AS BIGINT) AS top10
  FROM (SELECT n FROM g2 ORDER BY n DESC, k ASC LIMIT 10)
),
tot2 AS (
  SELECT CAST(count(1) AS BIGINT) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
         quantile_cont(n, 0.5) AS p50_group, quantile_cont(n, 0.99) AS p99_group
  FROM g2
),
r2 AS (
  SELECT 'orders.o_custkey' AS key_space, n_keys, n_rows,
         round(top1 / CAST(n_rows AS DOUBLE), 6) AS top1_share,
         round(top10 / CAST(n_rows AS DOUBLE), 6) AS top10_share,
         p50_group, p99_group
  FROM tot2 CROSS JOIN tops2
),
g3 AS (
  SELECT k, CAST(count(1) AS BIGINT) AS n FROM (
    SELECT l_orderkey AS k FROM lineitem) GROUP BY k
),
tops3 AS (
  SELECT max(n) AS top1, CAST(sum(n) AS BIGINT) AS top10
  FROM (SELECT n FROM g3 ORDER BY n DESC, k ASC LIMIT 10)
),
tot3 AS (
  SELECT CAST(count(1) AS BIGINT) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
         quantile_cont(n, 0.5) AS p50_group, quantile_cont(n, 0.99) AS p99_group
  FROM g3
),
r3 AS (
  SELECT 'lineitem.l_orderkey' AS key_space, n_keys, n_rows,
         round(top1 / CAST(n_rows AS DOUBLE), 6) AS top1_share,
         round(top10 / CAST(n_rows AS DOUBLE), 6) AS top10_share,
         p50_group, p99_group
  FROM tot3 CROSS JOIN tops3
)
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
""",
    "q_salted_join": """
SELECT s_nationkey, CAST(count(1) AS BIGINT) AS n_items,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""",
    "q_salted_agg": """
SELECT event_type,
       CAST(count(1) AS BIGINT) AS count_events,
       round(sum(round(value, 4)), 4) AS sum_value,
       min(user_id) AS min_user,
       max(user_id) AS max_user
FROM events GROUP BY event_type
""",
}
