"""mSPRT and Fellegi-Sunter model validity beyond oracle parity:
the sequential test must be valid under the null (never significant on
an A/A split) AND powered under a real effect (an injected arm lift
must cross alpha); the linkage m estimates must recover the injected
clerical-error rates exactly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_msprt_null_is_never_significant(spark):
    from orders_kafka_streams_spark.operators.stats import _q_msprt

    rows = _q_msprt(spark, SF).collect()
    assert len(rows) >= 10
    assert not any(r.significant for r in rows), "A/A split crossed alpha"
    # always-valid p is non-increasing in evidence but must start high
    assert rows[0].p_always_valid > 0.5


def test_msprt_detects_injected_lift(spark, tmp_path):
    """Add a constant lift to arm-1 users' values and re-run the SAME
    query against the doctored corpus: the monitor must go significant
    and stay significant at the horizon (power check)."""
    from orders_kafka_streams_spark.functions.portable import hash60
    from orders_kafka_streams_spark.operators.stats import MSPRT_SALT, _q_msprt
    from orders_kafka_streams_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    arm = hash60(F.concat(F.lit(MSPRT_SALT + "|"), F.col("user_id"))) % 2
    lifted = ev.withColumn(
        "value",
        F.when(arm == 1, F.col("value") + F.lit(50.0)).otherwise(F.col("value")),
    )
    lift_dir = str(tmp_path / "lifted")
    os.makedirs(lift_dir, exist_ok=True)
    lifted.coalesce(4).write.parquet(os.path.join(lift_dir, "events.parquet"))
    rows = _q_msprt(spark, lift_dir).collect()
    assert rows[-1].significant, "injected lift never detected"
    assert rows[-1].diff > 25.0
    # once the ratio crosses, late-horizon p stays tiny
    assert rows[-1].p_always_valid < 0.001


def test_logrank_null_accepts(spark):
    from orders_kafka_streams_spark.operators.stats import _q_logrank

    r = _q_logrank(spark, SF).first()
    assert not r.significant, f"A/A split rejected the null (chi2={r.chi2})"
    assert r.n_a > 50 and r.n_b > 50


def test_logrank_detects_faster_arm(spark, tmp_path):
    """Give every group-1 signup an extra purchase one hour later and
    re-run the SAME query on the doctored corpus: group 1 now converts
    almost immediately, so the test must reject."""
    from orders_kafka_streams_spark.functions.portable import epoch_ms, hash60
    from orders_kafka_streams_spark.operators.stats import LOGRANK_SALT, _q_logrank
    from orders_kafka_streams_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    grp = hash60(F.concat(F.lit(LOGRANK_SALT + "|"), F.col("user_id"))) % 2
    fast = (
        ev.filter((F.col("event_type") == "signup") & (grp == 1))
        .withColumn("event_type", F.lit("purchase"))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
    )
    doctored_dir = str(tmp_path / "fastarm")
    os.makedirs(doctored_dir, exist_ok=True)
    ev.unionByName(fast).coalesce(4).write.parquet(
        os.path.join(doctored_dir, "events.parquet")
    )
    r = _q_logrank(spark, doctored_dir).first()
    assert r.significant, f"injected fast arm not detected (chi2={r.chi2})"
    assert r.chi2 > 20.0


def test_linkage_m_recovers_injected_error_rates(spark):
    """The fixture corrupts brand on rec_id%7==0, size on %5==0 and
    type on %11==0 — so the UNsmoothed match-class agreement rates are
    exactly 6/7, 4/5 and 10/11. Recover them from the smoothed m."""
    from orders_kafka_streams_spark.operators.dedup import FS_SMOOTH, _q_linkage_weights

    rows = {r.field: r for r in _q_linkage_weights(spark, SF).collect()}
    assert set(rows) == {"name", "brand", "type", "size"}
    nm = rows["brand"].n_match
    for field, rate in (("brand", 6 / 7), ("size", 4 / 5), ("type", 10 / 11)):
        r = rows[field]
        agree = r.m * (nm + 2 * FS_SMOOTH) - FS_SMOOTH  # un-smooth
        got = agree / nm
        assert abs(got - rate) < 0.02, (field, got, rate)
    # evidence signs: agreement supports a match, disagreement opposes
    for r in rows.values():
        assert r.w_agree > 0 > r.w_disagree
        assert 0 < r.u < r.m <= 1
