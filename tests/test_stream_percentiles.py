"""q_stream_percentile_distributed (VERDICT r7 item 5): the streamed
exact per-(closed day, type) percentiles must be INVARIANT to how the
source drains into micro-batches (engine-managed watermarked window
agg + the deterministic rank selection), and must equal the batch
q_percentile_distributed formula restricted to closed windows.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.streaming_queries import (
    pctl_rank_select,
    stream_pctl_cells,
)
from orders_kafka_streams_spark.streaming.pipeline import (
    EVENTS_FILE_SCHEMA,
    run_to_memory,
)

DAY_MS = 86_400_000
BASE_MS = 1_700_006_400_000  # midnight-aligned? irrelevant: floor(day) both sides

#: (event_id, day, within-day ms, type, value) — two full days of two
#: types plus a tail day that the watermark must NOT emit.
ROWS = (
    [(i, 0, i * 1000, "click", float(i % 7)) for i in range(20)]
    + [(100 + i, 0, i * 900, "view", float(i % 5)) for i in range(15)]
    + [(200 + i, 1, i * 1100, "click", float(i % 11)) for i in range(25)]
    # tail day: reaches 120 s past midnight so the final watermark
    # (max ts − 60 s) passes day 1's window end and closes it, while
    # day 2 itself stays open and must not be emitted
    + [(300 + i, 2, i * 30_000, "view", 1.0) for i in range(5)]
)


def _write(spark, tmp_path, n_files):
    epoch = datetime.datetime(1970, 1, 1)
    src = os.path.join(str(tmp_path), "ev")
    per = (len(ROWS) + n_files - 1) // n_files
    for i in range(n_files):
        part = ROWS[i * per : (i + 1) * per]
        if not part:
            continue
        df = spark.createDataFrame(
            [
                (
                    eid,
                    epoch
                    + datetime.timedelta(milliseconds=BASE_MS + d * DAY_MS + ms),
                    1,
                    et,
                    v,
                    "{}",
                )
                for eid, d, ms, et, v in part
            ],
            schema=EVENTS_FILE_SCHEMA,
        )
        df.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    return src + "/*"


def _run(spark, path, one_file_per_trigger, name):
    reader = spark.readStream.schema(EVENTS_FILE_SCHEMA)
    if one_file_per_trigger:
        reader = reader.option("maxFilesPerTrigger", 1)
    raw = reader.parquet(path).withColumn("ts", F.col("ts").cast("timestamp"))
    tab = run_to_memory(stream_pctl_cells(raw), name)
    return {
        (r.day, r.event_type): (r.n, r.p50, r.p90, r.p99)
        for r in pctl_rank_select(spark.table(tab).localCheckpoint()).collect()
    }


def test_batch_split_invariance_and_closed_day_emission(spark, tmp_path):
    """One-batch drain == one-file-per-trigger drain (rows are
    time-ordered across files, the file-source replay contract), and
    only the watermark-closed days 0 and 1 are emitted — the tail day
    2 must be absent from both."""
    path = _write(spark, tmp_path, n_files=1)
    whole = _run(spark, path, False, "t_pctl_whole")
    path3 = _write(spark, os.path.join(str(tmp_path), "s"), 4)
    split = _run(spark, path3, True, "t_pctl_split")
    assert whole == split
    assert {d for d, _ in whole} == {
        BASE_MS // DAY_MS,
        BASE_MS // DAY_MS + 1,
    }


def test_rank_selection_matches_brute_force(spark, tmp_path):
    """The streamed p50/p90/p99 for each emitted (day, type) equal the
    brute-force ceil(q*n)-th smallest value over the planted rows."""
    import math

    path = _write(spark, os.path.join(str(tmp_path), "b"), 1)
    got = _run(spark, path, False, "t_pctl_brute")
    by_grp: dict[tuple, list[float]] = {}
    for _, d, _, et, v in ROWS:
        by_grp.setdefault((BASE_MS // DAY_MS + d, et), []).append(v)
    for key, (n, p50, p90, p99) in got.items():
        vals = sorted(by_grp[key])
        assert n == len(vals)
        for q, p in ((0.5, p50), (0.9, p90), (0.99, p99)):
            assert p == vals[math.ceil(q * n) - 1], (key, q)
