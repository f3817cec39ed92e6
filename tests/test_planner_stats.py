"""Behavioral pins for the planner-statistics family: the conformal
guarantee actually covers at ~1−α, the textbook join estimate is EXACT
on clean FK joins (the audit's baseline — skew/correlation is what
moves it), and equi-depth buckets hold near-equal populations.
"""

from __future__ import annotations

from orders_kafka_streams_spark.operators.dq import (
    EQD_BUCKETS,
    _q_histogram_equidepth,
    _q_join_card_audit,
)
from orders_kafka_streams_spark.operators.stats import CONF_ALPHA, _q_conformal

SF = "/root/testdata/sf0.01"


def test_conformal_covers_at_target(spark):
    r = _q_conformal(spark, SF).first()
    assert r.n_calib > 100 and r.n_test > 100
    # finite-sample guarantee: coverage >= 1 - alpha, minus binomial
    # noise on n_test points (3 sigma ~ 0.06 at n=235)
    assert r.coverage >= 1 - CONF_ALPHA - 0.06, r
    assert 0.0 < r.qhat < 1.0


def test_join_estimate_exact_on_clean_fk(spark):
    """All three audited joins are FK->PK with full referential
    integrity on the fixture: ndv_max == |dim| makes the System R
    estimate collapse to |fact| exactly — ratio 1.0. A ratio drift
    here means the stats pipeline broke, not the data."""
    rows = _q_join_card_audit(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.actual == r.n_fact, r
        assert abs(r.actual_over_est - 1.0) < 1e-6, r


def test_equidepth_buckets_balanced(spark):
    rows = _q_histogram_equidepth(spark, SF).collect()
    assert [r.bucket for r in rows] == list(range(EQD_BUCKETS))
    total = sum(r.n_rows for r in rows)
    target = total / EQD_BUCKETS
    for r in rows:
        assert 0.5 * target <= r.n_rows <= 1.5 * target, r
    # boundaries are non-overlapping and ordered
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
