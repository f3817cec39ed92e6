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
