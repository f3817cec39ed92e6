"""Processing-time vs event-time windowing fidelity pin (VERDICT r9
item 6).

The reference configures WallclockTimestampExtractor (Main.java:83):
records are windowed by ARRIVAL wall-clock time while processing.ms is
still computed from EVENT timestamps. This engine windows by event
time (SURVEY §2.6 ts-extract documents the delta). Prose is not a
test: this module runs the SAME crafted late-arrival fixture through
both clocks and pins both outputs, proving exactly where and how they
disagree —

- EVENT clock: the late record is DROPPED (its event-time window
  finalized before it arrived; grace = watermark delay expired).
- ARRIVAL clock (reference semantics): nothing is ever late — the
  record is MISFILED into the window open at its arrival instant, and
  its event-derived value is summed there.
"""

from __future__ import annotations

import datetime
import os
import time

import pyspark.sql.types as T
from pyspark.sql import functions as F

from orders_kafka_streams_spark.streaming.pipeline import (
    run_to_memory,
    stream_tumbling_agg,
)

MIN = 60_000
BASE_MS = 1_700_000_040_000  # minute-aligned

#: fixture schema: event clock (ts) AND explicit arrival stamp
#: (arr_ts — current_timestamp()-at-ingest made deterministic)
SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("arr_ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_EPOCH = datetime.datetime(1970, 1, 1)


def _ts(ms: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(milliseconds=ms)


def _write(spark, d: str, name: str, rows) -> None:
    df = spark.createDataFrame(
        [(eid, _ts(ev_ms), _ts(arr_ms), et, val) for eid, ev_ms, arr_ms, et, val in rows],
        schema=SCHEMA,
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, name))


def _fixture(spark, tmp_path) -> str:
    """Three micro-batches. Event clock: rows 1,2 in minute W0; the
    sentinel advances the event watermark far past W0; row 4's EVENT
    time is in W0 but it ARRIVES two batches later (arrival stamp in
    minute W2) — late beyond grace. Arrival clock: every row's arr_ts
    is monotone with batch order, rows 1,2 arrive in W0, the sentinel
    in W1, row 4 in W2."""
    d = os.path.join(str(tmp_path), "proc_fid_src")
    os.makedirs(d, exist_ok=True)
    w0, w1, w2 = BASE_MS, BASE_MS + 120 * MIN, BASE_MS + 121 * MIN
    _write(
        spark,
        d,
        "part1",
        [
            (1, w0 + 1_000, w0 + 1_500, "click", 2.0),
            (2, w0 + 2_000, w0 + 2_500, "click", 3.0),
            # sentinel: far-future EVENT time advances the event-time
            # watermark past W0+grace; its arrival stamp is the next
            # arrival minute (W1)
            (3, w1, w1 + 500, "view", 0.0),
        ],
    )
    time.sleep(1.1)  # file source orders batches by modification time
    _write(spark, d, "part2", [(5, w1 + MIN, w2 + 100, "view", 0.0)])
    time.sleep(1.1)
    # the LATE record: event time inside long-closed W0, arrives now
    _write(spark, d, "part3", [(4, w0 + 3_000, w2 + 30_000, "click", 5.0)])
    time.sleep(1.1)
    # closing sentinel: advances BOTH clocks' watermarks past W2's end
    # so the arrival-clock window holding the late click gets emitted
    # (append mode only releases watermark-closed windows)
    _write(spark, d, "part4", [(6, w1 + 5 * MIN, w2 + 5 * MIN, "view", 0.0)])
    return os.path.join(d, "part*")


def _run(spark, glob: str, time_col: str, sink: str) -> dict:
    raw = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    agg = stream_tumbling_agg(raw, watermark="60 seconds", time_col=time_col)
    tab = run_to_memory(agg, sink)
    rows = spark.table(tab).filter(F.col("event_type") == "click").collect()
    return {(r.wstart_ms, r.event_type): (r.n, r.total_value) for r in rows}


def test_event_vs_arrival_clock_disagree_on_late_fixture(spark, tmp_path):
    glob = _fixture(spark, tmp_path)
    event_out = _run(spark, glob, "ts", "fid_event")
    arrival_out = _run(spark, glob, "arr_ts", "fid_arrival")

    w0 = BASE_MS
    w2 = BASE_MS + 121 * MIN

    # EVENT clock (this engine): W0 finalized with the 2 on-time
    # clicks; the late click (event_id 4) was DROPPED — no W0 re-emit
    # (append mode emits a window once) and no other click window.
    assert event_out == {(w0, "click"): (2, 5.0)}

    # ARRIVAL clock (reference fidelity): rows 1,2 arrived during W0;
    # the late click is MISFILED into its ARRIVAL minute W2 — counted,
    # not dropped, with its event-derived value summed there.
    assert arrival_out == {
        (w0, "click"): (2, 5.0),
        (w2, "click"): (1, 5.0),
    }

    # The delta, stated as data: the two clocks disagree on total
    # admitted clicks (2 vs 3), and the misfiled window's start sits
    # ~2 h after the record's event time — the reference never drops
    # late data, it files it under the wrong window.
    assert sum(n for n, _ in event_out.values()) == 2
    assert sum(n for n, _ in arrival_out.values()) == 3
    late_event_ms = w0 + 3_000
    assert w2 - late_event_ms > 100 * MIN
