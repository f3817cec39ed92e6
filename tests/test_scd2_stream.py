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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_merge_invariant_on_random_streams_and_splits(spark, data):
    """ANY event stream cut at ANY batch boundaries merges to exactly
    the batch rebuild — the property that makes incremental SCD2
    trustworthy. Timestamps are unique per user (the in-order
    contract; equal-ts tie order is pinned separately by event_id)."""
    n = data.draw(st.integers(min_value=2, max_value=14))
    rows = []
    used = set()
    for eid in range(1, n + 1):
        uid = data.draw(st.integers(min_value=1, max_value=3))
        while True:
            ms = data.draw(st.integers(min_value=0, max_value=40)) * 500
            if (uid, ms) not in used:
                used.add((uid, ms))
                break
        attr = data.draw(st.sampled_from(["A", "B", "C"]))
        rows.append((eid, ms, uid, attr))
    # stream order = event-time order (the watermark contract)
    rows.sort(key=lambda r: (r[1], r[0]))
    rows = [(i + 1, ms, uid, attr) for i, (_, ms, uid, attr) in enumerate(rows)]
    n_cuts = data.draw(st.integers(min_value=0, max_value=3))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(rows) - 1),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0, *cuts, len(rows)]
    expected = _canon(scd2(_ev_df(spark, rows)))
    dim = spark.createDataFrame(
        [], "user_id long, version long, event_type string, valid_from_ms long, "
        "valid_to_ms long, is_current boolean, n_events long"
    )
    for lo, hi in zip(bounds, bounds[1:]):
        if lo == hi:
            continue
        dim = _merge_batch(dim, _ev_df(spark, rows[lo:hi]))
        dim = spark.createDataFrame(dim.collect(), dim.schema)
    assert _canon(dim) == expected, (rows, bounds)


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


def test_stream_pit_enrich_equals_batch(spark, sf_dir):
    """The streamed PIT enrichment equals the batch window-carry
    row-for-row — interval containment over contiguous versions is
    the same function, and the static dimension makes the verdict
    batching-independent."""
    from orders_kafka_streams_spark.operators.streaming_queries import QUERIES as SQ
    from orders_kafka_streams_spark.operators.warehouse import QUERIES as WQ

    got = {
        (r.event_id, r.pit_version, r.pit_state)
        for r in SQ["q_stream_pit_enrich"](spark, sf_dir).collect()
    }
    want = {
        (r.event_id, r.pit_version, r.pit_state)
        for r in WQ["q_scd2_pit"](spark, sf_dir).collect()
    }
    assert got == want and got
    # left-outer semantics survive the stream: some facts precede any
    # dimension version on this corpus and must arrive NULL-padded
    assert any(v is None for _, v, _ in got)
