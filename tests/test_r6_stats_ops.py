"""Behavioral pins for the round-6 stats/trend operators: the A/A
fixture must read null (no rejections, not significant, zero slope —
verified against the oracle by the driver gate), and a doctored
corpus with a KNOWN effect must be detected — the power half the
hash gate can't see.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from orders_kafka_streams_spark.functions.portable import hash60
from orders_kafka_streams_spark.operators.stats import (
    BH_SALT,
    _q_bh_fdr,
    _q_kruskal,
)
from orders_kafka_streams_spark.operators.timeseries import _q_theil_sen
from orders_kafka_streams_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _write_events(df, tmp_path, name):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    df.coalesce(4).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_bh_fdr_aa_rejects_nothing(spark):
    rows = _q_bh_fdr(spark, SF).collect()
    assert len(rows) == 5
    assert not any(r.rejected for r in rows), "A/A split rejected a metric"
    # step-up thresholds are monotone decreasing down the ranks
    crits = [r.z_crit for r in rows]
    assert crits == sorted(crits, reverse=True)


def test_bh_fdr_detects_lifted_metric(spark, tmp_path):
    """Lift arm-1 'purchase' values by +50: purchase must reject at
    rank 1; with one true effect the step-up rule must not drag the
    null metrics along (their |z| sit far below even z(alpha))."""
    ev = load_table(spark, SF, "events")
    arm = hash60(F.concat(F.lit(BH_SALT + "|"), F.col("user_id"))) % 2
    lifted = ev.withColumn(
        "value",
        F.when(
            (F.col("event_type") == "purchase") & (arm == 1),
            F.col("value") + 50.0,
        ).otherwise(F.col("value")),
    )
    d = _write_events(lifted, tmp_path, "bh_lift")
    rows = {r.event_type: r for r in _q_bh_fdr(spark, d).collect()}
    assert rows["purchase"].rejected and rows["purchase"].bh_rank == 1
    assert not any(r.rejected for t, r in rows.items() if t != "purchase")


def test_kruskal_null_and_shifted(spark, tmp_path):
    base = _q_kruskal(spark, SF).first()
    assert base.k == 5 and not base.significant
    ev = load_table(spark, SF, "events")
    shifted = ev.withColumn(
        "value",
        F.when(F.col("event_type") == "error", F.col("value") + 100.0).otherwise(
            F.col("value")
        ),
    )
    d = _write_events(shifted, tmp_path, "kw_shift")
    r = _q_kruskal(spark, d).first()
    assert r.significant, f"shifted group not detected (H={r.h_corrected})"
    assert r.h_corrected > base.h_corrected


def test_theil_sen_recovers_planted_trend_through_outliers(spark, tmp_path):
    """Plant count(h) = 5 + 2h for 100 hours, then spike 20 scattered
    hours to 500 events: the pairwise-slope median must still read
    ~2/hour (OLS on the same data reads >>2) — Sen's 29% breakdown
    point doing its job."""
    import pandas as pd

    rows, eid = [], 0
    for h in range(100):
        n = 5 + 2 * h
        if h % 5 == 3:  # 20 corrupted hours
            n = 500
        for _ in range(n):
            rows.append(
                (
                    eid,
                    pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h),
                    int(eid % 97),
                    "view",
                    1.0,
                    None,
                )
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path / "trend")
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    out = {r.event_type: r for r in _q_theil_sen(spark, d).collect()}
    slope = out["view"].sen_slope
    assert abs(slope - 2.0) < 0.3, f"sen slope {slope} lost the planted trend"
    assert out["view"].n_hours == 100


def test_theil_sen_null_on_fixture(spark):
    rows = _q_theil_sen(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.sen_slope) < 0.01, f"{r.event_type} drifted: {r.sen_slope}"
        assert r.n_pairs == r.n_hours * (r.n_hours - 1) // 2
