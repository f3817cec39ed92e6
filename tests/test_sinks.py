"""Sink-side coverage: partitioned parquet writes with partition
pruning on read-back, and the foreachBatch streaming sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from orders_kafka_streams_spark.plans import explain_str
from orders_kafka_streams_spark.sources.tables import load_table
from orders_kafka_streams_spark.streaming.pipeline import events_file_stream


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = os.path.join(str(tmp_path), "events_by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = explain_str(back)
    assert "PartitionFilters: [isnotnull(event_type" in plan and "purchase" in plan
    # only the purchase partition's rows are read
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_schema_evolution_merge_on_read(spark, sf_dir, tmp_path):
    # schema evolution: a 100 TB table accretes columns over months of
    # appends; mergeSchema=true reads old+new files into the union
    # schema with nulls for columns a file predates.
    out = os.path.join(str(tmp_path), "evolving")
    orders = load_table(spark, sf_dir, "orders")
    orders.select("o_orderkey", "o_totalprice").write.mode("append").parquet(out)
    orders.select(
        "o_orderkey", "o_totalprice", F.col("o_orderpriority").alias("priority")
    ).write.mode("append").parquet(out)

    back = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(back.columns) == {"o_orderkey", "o_totalprice", "priority"}
    n = orders.count()
    assert back.count() == 2 * n
    # rows from the pre-evolution files surface the new column as null
    assert back.filter(F.col("priority").isNull()).count() == n


def test_max_records_per_file_bounds_output_files(spark, sf_dir, tmp_path):
    # output file sizing: maxRecordsPerFile caps file size at write
    # time (the knob that prevents one skewed task from emitting a
    # 10 GB file a downstream scan can't split usefully).
    out = os.path.join(str(tmp_path), "sized")
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    cap = max(1, n // 7)
    orders.coalesce(1).write.option("maxRecordsPerFile", cap).mode(
        "overwrite"
    ).parquet(out)

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= (n + cap - 1) // cap
    for f in files:
        cnt = spark.read.parquet(os.path.join(out, f)).count()
        assert cnt <= cap


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    # foreachBatch = the exactly-once seam for arbitrary sinks: each
    # micro-batch arrives as a BATCH DataFrame with an epoch id.
    out = os.path.join(str(tmp_path), "fb_out")
    seen: list[int] = []

    def write_batch(batch_df, epoch_id: int) -> None:
        seen.append(epoch_id)
        batch_df.write.mode("append").parquet(out)

    ev = events_file_stream(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert seen, "foreachBatch never invoked"
    back = spark.read.parquet(out)
    got = {(r.event_type, r.n) for r in back.collect()}
    exp = {
        (r.event_type, r.n)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert exp <= got  # complete-mode rewrite may append duplicates across epochs


def test_dynamic_partition_pruning_on_star_join(spark, sf_dir, tmp_path):
    """Star-schema scale feature: joining a partitioned fact against a
    filtered dim must inject a dynamicpruningexpression into the fact's
    PartitionFilters — at 100 TB this skips whole partitions at runtime
    based on the dim filter, before any fact bytes are read."""
    import os

    from pyspark.sql import functions as F

    from orders_kafka_streams_spark.sources.tables import load_table

    fact_path = os.path.join(str(tmp_path), "fact_by_priority")
    (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_extendedprice", "o_orderpriority")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("1-URGENT", 10), ("2-HIGH", 20)], "o_orderpriority string, w int"
    ).filter(F.col("w") == 10)
    plan = (
        fact.join(dim, "o_orderpriority")
        .agg(F.sum("l_extendedprice"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruningexpression" in plan
