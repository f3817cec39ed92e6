"""Two-pass striped sharding (VERDICT r4 item 6): the range-partition
+ per-partition-offset form must equal the one-global-window reference
assignment exactly, and its plan must not rank the doc relation in a
single-partition window."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.sampling import N_SHARDS, striped_shards


def _fixture(spark, n=5000, seed=7):
    """Heavy n_chars ties (100 distinct sizes over 5000 docs) — the
    tie-break on doc_id is exactly what partition boundaries stress."""
    rng = random.Random(seed)
    rows = [(i, rng.choice(range(100, 10100, 100))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_chars int")


def _reference(docs, n_shards):
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return docs.withColumn(
        "shard", ((F.row_number().over(w) - 1) % n_shards).cast("int")
    )


def test_two_pass_equals_global_window(spark):
    docs = _fixture(spark)
    got = {r["doc_id"]: r["shard"] for r in striped_shards(docs, N_SHARDS).collect()}
    want = {r["doc_id"]: r["shard"] for r in _reference(docs, N_SHARDS).collect()}
    assert got == want


def test_two_pass_equals_global_window_tiny_partitions(spark):
    """More partitions than natural splits + empty partitions."""
    docs = _fixture(spark, n=40)
    got = {r["doc_id"]: r["shard"] for r in striped_shards(docs, 4, n_parts=16).collect()}
    want = {r["doc_id"]: r["shard"] for r in _reference(docs, 4).collect()}
    assert got == want


def test_no_global_window_over_docs(spark):
    docs = _fixture(spark, n=100)
    plan = striped_shards(docs, N_SHARDS)._jdf.queryExecution().executedPlan().toString()
    # the only Window is the running-sum over per-partition count
    # cells; the doc relation itself is never ranked by row_number
    assert "row_number" not in plan, plan


def test_global_row_numbers_equals_window(spark):
    from orders_kafka_streams_spark.operators.sampling import global_row_numbers

    docs = _fixture(spark, n=3000)
    got = {
        r["doc_id"]: r["rn"]
        for r in global_row_numbers(
            docs, [F.desc("n_chars"), F.asc("doc_id")], n_parts=8
        ).collect()
    }
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    want = {
        r["doc_id"]: r["rn"]
        for r in docs.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_balance_property(spark):
    """Striping's whole point: per-shard char budgets are near-equal
    (spread bounded by roughly one max doc per deal round)."""
    docs = _fixture(spark)
    per = (
        striped_shards(docs, N_SHARDS)
        .groupBy("shard")
        .agg(F.sum("n_chars").alias("chars"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(per) == N_SHARDS
    chars = [r["chars"] for r in per]
    counts = [r["n"] for r in per]
    assert max(counts) - min(counts) <= 1
    assert (max(chars) - min(chars)) / (sum(chars) / N_SHARDS) < 0.05
