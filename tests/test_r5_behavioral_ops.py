"""Invariant tests for the round-5 session-4 operators (attribution,
calibration, priority sampling, debounce, burstiness, CUPED, Benford).
The DuckDB oracle hash proves cross-engine equality; these prove the
numbers mean what the docstrings claim — conservation laws, bounds,
and determinism that hold for ANY corpus, checked on the sf0.01
fixture."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def attribution(spark):
    from orders_kafka_streams_spark.operators.timeseries import _q_attribution

    return _q_attribution(spark, SF).collect()


def test_attribution_credit_conservation(spark, attribution):
    """Every credited conversion hands out exactly 1.0 under each
    model, so the three per-channel credit columns all total the
    number of conversions that had >= 1 touch."""
    from orders_kafka_streams_spark.operators.timeseries import (
        ATTR_CHANNELS,
        ATTR_LOOKBACK_MS,
    )
    from orders_kafka_streams_spark.functions.portable import epoch_ms
    from orders_kafka_streams_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), epoch_ms(F.col("ts")).alias("cms")
    )
    touch = ev.filter(F.col("event_type").isin(*ATTR_CHANNELS)).select(
        "user_id", epoch_ms(F.col("ts")).alias("tms")
    )
    n_credited = (
        touch.join(
            conv,
            (touch["user_id"] == conv["user_id"])
            & (F.col("tms") < F.col("cms"))
            & (F.col("tms") >= F.col("cms") - ATTR_LOOKBACK_MS),
        )
        .select("conv_id")
        .distinct()
        .count()
    )
    assert n_credited > 0
    assert sum(r.credit_first for r in attribution) == n_credited
    assert sum(r.credit_last for r in attribution) == n_credited
    assert abs(sum(r.credit_linear for r in attribution) - n_credited) < 0.01


def test_attribution_bounds(attribution):
    for r in attribution:
        assert 0 <= r.credit_first <= r.n_touches
        assert 0 <= r.credit_last <= r.n_touches
        assert 0 < r.credit_linear <= r.n_touches + 1e-9


def test_calibration_invariants(spark):
    from orders_kafka_streams_spark.operators.stats import CAL_BINS, _q_calibration

    rows = _q_calibration(spark, SF).collect()
    assert rows, "no bins"
    eces = {r.ece for r in rows}
    assert len(eces) == 1, "ECE must be a corpus constant on every row"
    ece = eces.pop()
    # ECE is the n-weighted mean of per-bin gaps — recompute from the rows
    n_tot = sum(r.n for r in rows)
    expect = sum(r.n * r.gap for r in rows) / n_tot
    assert abs(ece - expect) < 1e-6
    for r in rows:
        assert 0 <= r.bin < CAL_BINS
        assert 0.0 <= r.conf <= 1.0 and 0.0 <= r.acc <= 1.0
        assert abs(r.gap - abs(r.acc - r.conf)) < 1e-6
        # confidence must sit inside its own bin's range (sigma is
        # monotone, bins are fixed-width on p itself)
        assert r.bin / CAL_BINS - 1e-6 <= r.conf <= (r.bin + 1) / CAL_BINS + 1e-6


def test_priority_sample_tau_and_estimator(spark):
    """w_est = max(w, tau) where tau is the (K+1)-th priority: every
    sampled row's priority must be >= tau, and w_est >= its weight."""
    from orders_kafka_streams_spark.operators.sampling import (
        PRI_K,
        _q_sample_priority,
    )

    rows = _q_sample_priority(spark, SF).collect()
    assert len(rows) == PRI_K
    tau = min(set(r.w_est for r in rows if r.w_est > r.n_chars) or {0.0})
    for r in rows:
        assert r.w_est >= r.n_chars
        # every sampled priority beats the threshold
        if tau:
            assert r.priority >= tau - 1e-6


def test_priority_sample_favors_weight(spark):
    """Inclusion probability rises with weight: the sampled docs'
    mean n_chars must exceed the corpus mean (the whole point of
    weighted sampling)."""
    from orders_kafka_streams_spark.operators.sampling import _q_sample_priority
    from orders_kafka_streams_spark.sources.tables import load_table

    rows = _q_sample_priority(spark, SF).collect()
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    corpus_mean = (
        load_table(spark, SF, "documents")
        .filter(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > corpus_mean


def test_debounce_counts_add_up(spark):
    from orders_kafka_streams_spark.operators.timeseries import _q_debounce
    from orders_kafka_streams_spark.sources.tables import load_table

    rows = _q_debounce(spark, SF).collect()
    total_raw = sum(r.n_raw for r in rows)
    assert total_raw == load_table(spark, SF, "events").count()
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_raw
        assert 0.0 <= r.drop_frac <= 1.0
        assert r.n_kept >= 1  # first event per key is always kept


def test_burstiness_user_partition(spark):
    """Band user-counts total exactly the number of eligible users
    (>= BURST_MIN_EVENTS gaps, positive gap sum) — nobody is dropped
    or double-counted by the banding."""
    from orders_kafka_streams_spark.operators.timeseries import (
        BURST_MIN_EVENTS,
        _q_burstiness,
    )
    from orders_kafka_streams_spark.functions.portable import epoch_ms
    from orders_kafka_streams_spark.sources.tables import load_table
    from pyspark.sql import Window

    rows = _q_burstiness(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = F.floor(
        (epoch_ms(F.col("ts")) - F.lag(epoch_ms(F.col("ts"))).over(w)) / F.lit(1000.0)
    )
    eligible = (
        ev.select("user_id", g.alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("g").alias("sg"))
        .filter((F.col("n") >= BURST_MIN_EVENTS) & (F.col("sg") > 0))
        .count()
    )
    assert sum(r.n_users for r in rows) == eligible
    for r in rows:
        assert r.band in ("regular", "poisson_like", "bursty")
        assert r.mean_cv >= 0.0


def test_cuped_reduces_variance_vs_label(spark):
    from orders_kafka_streams_spark.operators.stats import _q_cuped

    r = _q_cuped(spark, SF).first()
    assert r.n_a > 0 and r.n_b > 0
    assert 0.0 <= r.var_reduction <= 1.0
    # theta = cov/var is finite and the adjustment actually moved the
    # estimate unless the covariate is orthogonal
    assert math.isfinite(r.theta) and math.isfinite(r.diff_cuped)


def test_benford_probabilities(spark):
    from orders_kafka_streams_spark.operators.stats import _q_benford

    rows = _q_benford(spark, SF).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.p_obs for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_benford for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.p_benford - math.log10(1 + 1 / r.digit)) < 1e-5
