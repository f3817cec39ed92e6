"""Count-Min-Sketch guarantees (Cormode & Muthukrishnan 2005): the
estimate NEVER undercounts, and the overestimate is bounded by
e/WIDTH · stream-length (expected; asserted here with a 4× slack so
the deterministic salted-md5 hashes don't have to behave like ideal
pairwise-independent families on this tiny corpus)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.stats import CMS_WIDTH, cms_estimates


def test_cms_never_undercounts_and_bounds_overestimate(spark, sf_dir):
    est = cms_estimates(spark, sf_dir).collect()
    assert est, "no candidates"
    total = sum(r.wc for r in est)  # stream length (every token counted once)
    assert all(r.est >= r.wc for r in est), [
        (r.w, r.wc, r.est) for r in est if r.est < r.wc
    ]
    bound = 4 * math.e * total / CMS_WIDTH
    worst = max(r.est - r.wc for r in est)
    assert worst <= bound, (worst, bound)


def test_cms_top1_is_true_top1(spark, sf_dir):
    """With overestimates far below the head counts on this corpus,
    the CMS top-1 must agree with the exact top-1 (est desc, w asc
    vs wc desc, w asc)."""
    est = cms_estimates(spark, sf_dir).collect()
    by_est = min(est, key=lambda r: (-r.est, r.w))
    by_exact = min(est, key=lambda r: (-r.wc, r.w))
    assert by_est.w == by_exact.w


def test_chao1_estimate_bounds(spark, sf_dir):
    """Chao1 never estimates fewer species than observed, and the
    correction term is driven by the singleton count."""
    from orders_kafka_streams_spark.operators.stats import _q_chao1

    r = _q_chao1(spark, sf_dir).first()
    assert r.s_obs == r.f1 + r.f2 or r.s_obs > r.f1 + r.f2  # histogram sums
    assert r.chao1_est >= r.s_obs
    if r.f1 == 0:
        assert r.chao1_est == r.s_obs
