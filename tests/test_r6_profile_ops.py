"""Structural invariants for the round-6 profile/selection operators
that the oracle hash can't articulate: Gini's [0, 1) range and its
zero on a perfectly equal fixture, the skyline's dominance contract
(no emitted user is dominated; every non-emitted user is), and
isotonic regression's defining property (the fitted curve is
nondecreasing and pools only adjacent violators).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orders_kafka_streams_spark.operators.stats import (
    _q_gini_activity,
    _q_isotonic_calibration,
    _q_skyline_users,
)

SF = "/root/testdata/sf0.01"

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_dir(tmp_path, name, rows):
    import os

    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def test_gini_range_and_equal_fixture_zero(spark, tmp_path):
    rows = {r.group_key: r for r in _q_gini_activity(spark, SF).collect()}
    assert "all" in rows and len(rows) == 6
    for r in rows.values():
        assert 0.0 <= r.gini < 1.0, r
    # perfectly equal corpus: 50 users x 4 events each -> G == 0
    t = pd.Timestamp("2024-01-01")
    eq = [
        (i, t, i % 50, "view", 1.0, None)
        for i in range(200)
    ]
    d = _events_dir(tmp_path, "equal", eq)
    out = {r.group_key: r for r in _q_gini_activity(spark, d).collect()}
    assert out["all"].gini == 0.0
    # maximally concentrated: one user holds ~everything -> G near 1
    conc = [(i, t, 0 if i < 196 else i, "view", 1.0, None) for i in range(200)]
    d2 = _events_dir(tmp_path, "conc", conc)
    out2 = {r.group_key: r for r in _q_gini_activity(spark, d2).collect()}
    assert out2["all"].gini > 0.75


def test_skyline_dominance_contract(spark):
    per_user = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(F.lit(0.0))
                ),
                6,
            ).alias("y"),
        )
        .collect()
    )
    frontier = _q_skyline_users(spark, SF).collect()
    assert frontier, "empty frontier"
    fr = {(r.n_events, r.purchase_value) for r in frontier}
    fids = {r.user_id for r in frontier}

    def dominated(p, others):
        return any(
            (o.x >= p.x and o.y >= p.y and (o.x > p.x or o.y > p.y))
            for o in others
        )

    by_id = {r.user_id: r for r in per_user}
    for r in frontier:
        p = by_id[r.user_id]
        assert not dominated(p, per_user), f"frontier user {r.user_id} dominated"
    for p in per_user:
        if p.user_id not in fids:
            assert dominated(p, per_user), f"user {p.user_id} missing from frontier"


def test_isotonic_fit_is_monotone_and_pools_correctly(spark):
    rows = _q_isotonic_calibration(spark, SF).collect()
    assert rows
    fits = [r.iso_rate for r in rows]
    assert all(a <= b for a, b in zip(fits, fits[1:])), fits
    # PAV preserves the weighted mean of each pooled block; globally
    # the weighted mean of the fit equals the weighted mean raw rate
    wsum = sum(r.n for r in rows)
    raw_mean = sum(r.n * r.raw_rate for r in rows) / wsum
    fit_mean = sum(r.n * r.iso_rate for r in rows) / wsum
    assert abs(raw_mean - fit_mean) < 1e-4
    # where raw is already nondecreasing end-to-end, fit == raw
    raw = [r.raw_rate for r in rows]
    if all(a <= b for a, b in zip(raw, raw[1:])):
        assert all(abs(a - b) < 1e-6 for a, b in zip(raw, fits))
