"""Salted two-phase pair-match (VERDICT r3 item 2): the skew path for
a mega-hot user_id must produce the EXACT unsalted answer, and its
row-level window must partition by (user_id, chunk) — the property
that bounds per-task work by events-per-user-per-chunk.

The equivalence is checked twice:
- on the driver's real testdata (all users, all edge shapes);
- on a synthetic 100x-hot-key fixture (one user owns ~99% of events,
  events packed into a few hours so chunks actually split the key).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orders_kafka_streams_spark.operators.pipeline import (
    facility_rollup,
    pair_orders,
    pair_orders_salted,
)
from orders_kafka_streams_spark.sources.tables import load_table

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_equals_unsalted_on_testdata(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert _rows(pair_orders_salted(ev)) == _rows(pair_orders(ev))


@pytest.fixture(scope="module")
def skewed_events(spark):
    """One mega-hot user (id 7) with 5000 events over ~6 hours —
    interleaved placed/fulfilled plus same-timestamp ties and
    chunk-boundary-straddling pairs — and 20 cold users. chunk_ms
    defaults to 1h, so the hot key splits into ~7 chunks."""
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for i in range(5000):
        # hot user: a placed every step, a fulfilled every 3rd step;
        # every 97th pair shares an exact timestamp (tie-break path)
        ts = base + datetime.timedelta(seconds=4 * i)
        rows.append((eid, 7, "click", ts, 1.0, None))
        eid += 1
        if i % 3 == 0:
            fts = ts if i % 97 == 0 else ts + datetime.timedelta(seconds=2)
            rows.append((eid, 7, "purchase", fts, 1.0, None))
            eid += 1
    for u in range(20, 40):
        # cold users: one pair straddling an hour boundary, one
        # fulfilled with no placed partner (dead-letter shape)
        rows.append((eid, u, "click", base + datetime.timedelta(minutes=59), 1.0, None))
        eid += 1
        rows.append((eid, u, "purchase", base + datetime.timedelta(minutes=61), 1.0, None))
        eid += 1
        rows.append((eid, u + 100, "purchase", base + datetime.timedelta(hours=3), 1.0, None))
        eid += 1
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_salted_equals_unsalted_on_hot_key(spark, skewed_events):
    plain = pair_orders(skewed_events)
    salted = pair_orders_salted(skewed_events)
    assert _rows(salted) == _rows(plain)
    # and through the full rollup
    assert _rows(facility_rollup(salted)) == _rows(facility_rollup(plain))


def test_salted_splits_hot_key_across_chunks(spark, skewed_events):
    """The scale claim itself: the row-level window partitions by
    (user_id, chunk), so the hot user's rows are spread over as many
    window groups as active hours — never one task per user."""
    plan = pair_orders_salted(skewed_events)._jdf.queryExecution().executedPlan().toString()
    # the expensive Window (the one over event rows) keys on user_id AND chunk
    assert "partitionBy" not in plan  # sanity: physical plan, not API echo
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln and "local_placed" in ln]
    assert window_lines, plan
    assert all("chunk" in ln for ln in window_lines), window_lines
    # hot key really occupies >1 chunk in the fixture
    from orders_kafka_streams_spark.operators.pipeline import SALT_CHUNK_MS
    from orders_kafka_streams_spark.functions.portable import epoch_ms

    n_chunks = (
        skewed_events.filter(F.col("user_id") == 7)
        .select(F.floor(epoch_ms(F.col("ts")) / F.lit(SALT_CHUNK_MS)).alias("c"))
        .distinct()
        .count()
    )
    assert n_chunks >= 5, n_chunks
