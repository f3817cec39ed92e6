"""Streaming SCD2 maintenance invariant: merging the event stream
batch-by-batch yields EXACTLY the batch scd2() of the full table —
the property that makes the incremental dimension trustworthy."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.warehouse import scd2
from orders_kafka_streams_spark.streaming.pipeline import EVENTS_FILE_SCHEMA
from orders_kafka_streams_spark.streaming.scd2_merge import _merge_batch, scd2_sink

import datetime


def _ev_df(spark, rows):
    epoch = datetime.datetime(1970, 1, 1)
    return spark.createDataFrame(
        [
            (eid, epoch + datetime.timedelta(milliseconds=ms), uid, et, 0.0, "{}")
            for eid, ms, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


ROWS = [
    (1, 0, 7, "A"),
    (2, 1000, 7, "A"),
    (3, 2000, 7, "B"),
    (4, 3000, 8, "X"),
    (5, 4000, 7, "A"),
    (6, 5000, 8, "X"),
    (7, 6000, 8, "Y"),
    (8, 7000, 9, "Z"),
]


def _canon(df):
    return sorted(
        (r.user_id, r.version, r.event_type, r.valid_from_ms, r.valid_to_ms, r.is_current, r.n_events)
        for r in df.collect()
    )


def test_batchwise_merge_equals_full_rebuild(spark):
    expected = _canon(scd2(_ev_df(spark, ROWS)))
    dim = spark.createDataFrame(
        [], "user_id long, version long, event_type string, valid_from_ms long, "
        "valid_to_ms long, is_current boolean, n_events long"
    )
    # three uneven batches, in event-time order
    for lo, hi in ((0, 3), (3, 5), (5, 8)):
        dim = _merge_batch(dim, _ev_df(spark, ROWS[lo:hi]))
        dim = spark.createDataFrame(dim.collect(), dim.schema)  # pin, as the sink's write does
    assert _canon(dim) == expected


def test_late_event_never_reopens_closed_version(spark):
    d0 = _merge_batch(
        spark.createDataFrame(
            [], "user_id long, version long, event_type string, valid_from_ms long, "
            "valid_to_ms long, is_current boolean, n_events long"
        ),
        _ev_df(spark, [(1, 0, 7, "A"), (2, 2000, 7, "B")]),
    )
    d0 = spark.createDataFrame(d0.collect(), d0.schema)
    # arrives after version 2 (B@2000) opened, but timestamped before it
    d1 = _merge_batch(d0, _ev_df(spark, [(9, 1000, 7, "C")]))
    out = _canon(d1)
    assert out == _canon(d0), out  # dropped, dimension unchanged


def test_foreachbatch_sink_end_to_end(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, (lo, hi) in enumerate(((0, 3), (3, 5), (5, 8))):
        _ev_df(spark, ROWS[lo:hi]).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    dim_path = os.path.join(str(tmp_path), "dim")
    stream = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = stream.writeStream.foreachBatch(scd2_sink(dim_path)).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got = _canon(spark.read.parquet(dim_path))
    expected = _canon(scd2(_ev_df(spark, ROWS)))
    assert got == expected
