"""RocksDB state store provider — the 100 TB state backend.

The reference keeps pair-match state in RocksDB
(OrderProcessor.java:280-287); Structured Streaming's equivalent is
the RocksDB state store provider (bounded heap, state spills to local
disk). This test runs the stream-stream join under it and checks the
results are identical to the default (HDFS-backed) provider.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.streaming.pipeline import (
    events_file_stream,
    run_to_memory,
    stream_pair_join,
)

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_rocksdb_state_store_matches_default(spark, sf_dir):
    default_tab = run_to_memory(
        stream_pair_join(events_file_stream(spark, sf_dir)), "ss_default"
    )
    baseline = sorted(map(str, spark.table(default_tab).collect()))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        rocks_tab = run_to_memory(
            stream_pair_join(events_file_stream(spark, sf_dir)), "ss_rocks"
        )
        got = sorted(map(str, spark.table(rocks_tab).collect()))
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    assert got == baseline
    assert len(got) > 0
