"""AQE runtime re-planning: skewed-join split and partition coalescing.

At 100 TB a hot key turns one shuffle partition into a straggler that
dominates the stage; AQE's skew-join rule splits it into sub-reads at
runtime. This test manufactures the skew (one key owning ~20% of a
200k-row fact), forces a sort-merge join, and asserts the FINAL
adaptive plan actually applied the split — pinning that our session
config (session.tune) keeps the rule armed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    saved = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 5 == 0, F.lit(7)).otherwise(F.col("id") % 997).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(997).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        j = fact.join(dim.hint("MERGE"), "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        [row] = j.collect()
        assert row.n == 200_000
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        # the skew handling marker in the final adaptive SMJ plan
        assert "skew=true" in final, final[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_partitions(spark):
    # 32 shuffle partitions configured, but a tiny aggregation should
    # run far fewer reducers after AQE coalescing (AQEShuffleRead).
    small = spark.range(1_000).groupBy((F.col("id") % 7).alias("g")).count()
    small.collect()
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan
