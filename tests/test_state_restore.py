"""State restore across restarts (SURVEY §2.6 `state-restore`) and
exactly-once sink idempotence (`exactly-once`).

The reference's state lives in a Kafka Streams KV store restored from a
changelog topic (OrderProcessor.java:59-66); Spark's equivalent is the
checkpointed state store. These tests prove the two properties users
rely on after a restart: (1) aggregation state AND the watermark
survive — finalized windows are not re-emitted and late rows stay
dropped after the restart; (2) a replayed micro-batch converges in an
idempotent sink instead of double-writing.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from tests.test_late_data import BASE_MS, MIN, _stream, _write_file


def _run_windowed(spark, src_glob, out, ckpt):
    agg = (
        _stream(spark, src_glob)
        .withWatermark("ts", "60 seconds")
        .groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("window.start")).alias("ws"),
            "event_type",
            "n",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            (
                p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
                if p["stateOperators"]
                else 0
            )
            for p in q.recentProgress
        )
    finally:
        q.stop()
    return dropped


def test_windowed_state_survives_restart(spark, tmp_path):
    d = os.path.join(str(tmp_path), "sr_src")
    os.makedirs(d, exist_ok=True)
    out = os.path.join(str(tmp_path), "sr_out")
    ckpt = os.path.join(str(tmp_path), "sr_ckpt")
    glob = os.path.join(d, "part*")

    # run 1: window W0 gets 2 clicks; sentinel advances the watermark
    # far past W0 so it finalizes and is written to the sink.
    _write_file(
        spark,
        d,
        "part1",
        [
            (1, BASE_MS + 1_000, 1, "click", 1.0),
            (2, BASE_MS + 2_000, 1, "click", 1.0),
            (3, BASE_MS + 120 * MIN, 9, "view", 0.0),
        ],
    )
    _run_windowed(spark, glob, out, ckpt)
    first = {
        (r.ws - BASE_MS, r.event_type): r.n
        for r in spark.read.parquet(out).collect()
    }
    assert first[(0, "click")] == 2

    # run 2 (fresh query object, same checkpoint): one on-time row to
    # produce a batch, plus a LATE click for the long-finalized W0. If
    # watermark state was restored, the late row is dropped and W0 is
    # NOT re-emitted or recounted.
    time.sleep(1.1)
    _write_file(
        spark,
        d,
        "part2",
        [
            (5, BASE_MS + 121 * MIN, 9, "view", 0.0),
            (4, BASE_MS + 3_000, 1, "click", 1.0),  # late for W0
        ],
    )
    dropped = _run_windowed(spark, glob, out, ckpt)
    rows = spark.read.parquet(out).collect()
    clicks = [r for r in rows if r.event_type == "click"]
    # still exactly ONE click window row with the original count
    assert len(clicks) == 1 and clicks[0].n == 2, clicks
    assert dropped == 1  # the late row hit the RESTORED watermark


def test_foreachbatch_idempotent_sink_replay_safe(spark, tmp_path):
    from orders_kafka_streams_spark.streaming.sinks import idempotent_parquet_sink

    d = os.path.join(str(tmp_path), "eo_src")
    os.makedirs(d, exist_ok=True)
    out = os.path.join(str(tmp_path), "eo_out")
    ckpt = os.path.join(str(tmp_path), "eo_ckpt")
    _write_file(spark, d, "part1", [(i, BASE_MS + i * 1_000, 1, "click", 1.0) for i in range(5)])

    ev = _stream(spark, os.path.join(d, "part*")).select("event_id", "user_id")
    q = (
        ev.writeStream.foreachBatch(idempotent_parquet_sink(out))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n1 = spark.read.parquet(out).count()
    assert n1 == 5

    # simulate the crash-replay of the SAME micro-batch id: the engine
    # re-invokes foreachBatch with identical (data, batch_id) — the
    # overwrite-by-batch-id sink must converge, not double-write.
    replay = spark.createDataFrame(
        [(i, 1) for i in range(5)], "event_id long, user_id long"
    )
    idempotent_parquet_sink(out)(replay, 0)
    assert spark.read.parquet(out).count() == 5


def test_one_join_fans_out_matched_and_dead_letter(spark, tmp_path):
    """The reference's TODO side sink (OrderProcessor.java:184) as two
    branches of ONE stream-stream join: matched pairs and null-padded
    dead letters route to separate sinks from the same state, with
    nothing lost and nothing duplicated."""
    from orders_kafka_streams_spark.streaming.pipeline import stream_pair_left_outer
    from orders_kafka_streams_spark.streaming.sinks import matched_dead_letter_sink

    d = os.path.join(str(tmp_path), "fan_src")
    os.makedirs(d, exist_ok=True)
    out = os.path.join(str(tmp_path), "fan_out")
    ckpt = os.path.join(str(tmp_path), "fan_ckpt")
    # user 1: click then purchase (matched); user 2: purchase, no click
    # (dead letter); sentinels advance both sides' watermarks far ahead.
    _write_file(
        spark,
        d,
        "part1",
        [
            (1, BASE_MS + 1 * MIN, 1, "click", 0.0),
            (2, BASE_MS + 2 * MIN, 1, "purchase", 9.0),
            (3, BASE_MS + 2 * MIN, 2, "purchase", 5.0),
            (8, BASE_MS + 200 * MIN, 9, "click", 0.0),
            (9, BASE_MS + 190 * MIN, 9, "purchase", 1.0),
        ],
    )
    ev = _stream(spark, os.path.join(d, "part*"))
    q = (
        stream_pair_left_outer(ev, window="1 hour", watermark="10 minutes")
        .writeStream.foreachBatch(matched_dead_letter_sink(out))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    matched = spark.read.parquet(os.path.join(out, "matched")).collect()
    dl = spark.read.parquet(os.path.join(out, "dead_letter")).collect()
    assert {(r.f_event_id, r.p_event_id) for r in matched} == {(2, 1)}
    # event 3 finalized unmatched; event 9's window is still open at the
    # final watermark, so it stays in state (not emitted to either sink)
    assert {r.f_event_id for r in dl} == {3}
    assert all(r.p_event_id is None for r in dl)
