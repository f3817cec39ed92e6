"""Edge semantics of the binned interval-overlap join on crafted
intervals: closed-interval boundary touch, near-miss separation, and
set semantics for pairs sharing many bins. The oracle parity for
q_interval_join checks the fixture data; these pin the corners."""

from __future__ import annotations

import pytest

from orders_kafka_streams_spark.operators.timeseries import BIN_MS, interval_overlap_join


@pytest.fixture(scope="module")
def run_join(spark):
    def build(a_rows, b_rows):
        a = spark.createDataFrame(
            a_rows, "key string, a_id long, a_start_ms long, a_end_ms long"
        )
        b = spark.createDataFrame(
            b_rows, "key string, b_id long, b_start_ms long, b_end_ms long"
        )
        return {
            (r.a_id, r.b_id)
            for r in interval_overlap_join(a, b, key="key").collect()
        }

    return build


def test_boundary_touch_is_overlap(run_join):
    # closed intervals: a_end == b_start counts as overlap, even when the
    # touch point sits exactly on a bin boundary
    pairs = run_join(
        [("u", 1, 0, BIN_MS)],
        [("u", 10, BIN_MS, 2 * BIN_MS)],
    )
    assert pairs == {(1, 10)}


def test_one_ms_separation_is_not_overlap(run_join):
    pairs = run_join(
        [("u", 1, 0, BIN_MS - 1)],
        [("u", 10, BIN_MS, 2 * BIN_MS)],
    )
    assert pairs == set()


def test_pair_sharing_many_bins_appears_once(run_join):
    # both intervals span 5 bins -> 5 candidate rows, one output pair
    pairs = run_join(
        [("u", 1, 0, 5 * BIN_MS)],
        [("u", 10, 0, 5 * BIN_MS)],
    )
    assert pairs == {(1, 10)}


def test_key_isolation(run_join):
    # same times, different keys: never joined
    pairs = run_join(
        [("u", 1, 0, BIN_MS)],
        [("v", 10, 0, BIN_MS)],
    )
    assert pairs == set()


def test_sessionize_agrees_with_session_window(spark, sf_dir):
    """Cross-validation: the gaps-and-islands formulation (q_sessionize)
    and the engine's session_window (q_win_session) implement the same
    30-min-gap semantics — per-user session counts and event totals must
    agree, including on exact-gap boundaries (both treat a gap of
    exactly 30 min as a session break: session_window's windows are
    half-open [start, last+gap), and the islands break on gap >= GAP)."""
    from pyspark.sql import functions as F

    from orders_kafka_streams_spark.operators import timeseries as ts

    def shape(df):
        rows = (
            df.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
            .collect()
        )
        return {r.user_id: (r.n_sessions, r.n_events) for r in rows}

    assert shape(ts._q_sessionize(spark, sf_dir)) == shape(ts._q_win_session(spark, sf_dir))
