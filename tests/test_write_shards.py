"""Shard-writer capstone (VERDICT r9 item 5): the materialized parquet
shards must round-trip — re-read equals the planned relation exactly —
and the layout must honor the contiguous-block contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.curation import (
    SEQ_SHARDS,
    materialized_shard_dir,
    packed_shard_plan,
)


def test_reread_equals_planned_relation(spark, sf_dir):
    planned = packed_shard_plan(spark, sf_dir)
    rd = spark.read.parquet(materialized_shard_dir(spark, sf_dir))
    cols = sorted(planned.columns)
    # partitionBy re-derives `shard` from directory names as int —
    # align types before the set-equality diff
    got = rd.select(*[F.col(c).cast(dict(planned.dtypes)[c]).alias(c) for c in cols])
    want = planned.select(*cols)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_contiguous_block_layout(spark, sf_dir):
    rd = spark.read.parquet(materialized_shard_dir(spark, sf_dir))
    n = rd.count()
    block = -(-n // SEQ_SHARDS)
    per = (
        rd.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.min("pos_in_shard").alias("lo"),
            F.max("pos_in_shard").alias("hi"),
            F.countDistinct("pos_in_shard").alias("d"),
            F.min("shuffle_pos").alias("glo"),
            F.max("shuffle_pos").alias("ghi"),
        )
        .collect()
    )
    assert sum(r.m for r in per) == n
    for r in per:
        # positions are 1..m dense within the shard
        assert (r.lo, r.hi, r.d) == (1, r.m, r.m), r
        # the shard holds one contiguous block of the global permutation
        assert r.ghi - r.glo + 1 == r.m, r
        assert r.glo == int(r.shard) * block + 1, r
    # only the LAST shard may hold fewer than a full block
    last = max(int(r.shard) for r in per)
    short = [int(r.shard) for r in per if r.m != block]
    assert short in ([], [last]), (short, last, block)
