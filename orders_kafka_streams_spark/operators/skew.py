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


QUERIES = {
    "q_salted_join": _q_salted_join,
    "q_salted_agg": _q_salted_agg,
}

ORACLE = {
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
