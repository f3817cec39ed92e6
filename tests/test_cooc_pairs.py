"""_cooc_pairs property tests (r8): the weighted distinct-basket +
triangle-bucketed pair generator must reproduce the naive per-user
self-join's counts EXACTLY on a fixture that exercises every branch —
identical baskets (weight > 1), a heavy basket crossing the bucketing
threshold, light baskets below it, and single-item baskets (no pairs).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators import timeseries
from orders_kafka_streams_spark.operators.timeseries import (
    COOC_PAIR_BUCKETS,
    _cooc_pairs,
)

#: the production threshold is an execution knob (r11: 4096); pin a
#: small value here so the heavy branch is exercised without the
#: pure-Python naive reference enumerating C(2·4096, 2) pairs
COOC_HEAVY_BASKET = 256


@pytest.fixture(scope="module", autouse=True)
def _small_heavy_threshold():
    mp = pytest.MonkeyPatch()
    mp.setattr(timeseries, "COOC_HEAVY_BASKET", COOC_HEAVY_BASKET)
    yield
    mp.undo()


@pytest.fixture(scope="module")
def fb(spark):
    """(user_id, k) baskets: 3 identical 4-item baskets, one heavy
    basket (2 x threshold, forced through triangle bucketing), two
    overlapping light baskets, one singleton."""
    rows = []
    for u in (1, 2, 3):  # identical baskets -> one distinct basket, w=3
        rows += [(u, k) for k in (10, 20, 30, 40)]
    heavy_items = range(1000, 1000 + 2 * COOC_HEAVY_BASKET)
    rows += [(9, k) for k in heavy_items]
    rows += [(5, k) for k in (10, 20, 99)]
    rows += [(6, k) for k in (20, 30)]
    rows += [(7, 10)]  # singleton: contributes no pairs
    return spark.createDataFrame(rows, "user_id long, k long")


def _naive(rows):
    """Reference counts: per user, all unordered item pairs."""
    by_user: dict[int, list[int]] = {}
    for u, k in rows:
        by_user.setdefault(u, []).append(k)
    counts: dict[tuple[int, int], int] = {}
    for ks in by_user.values():
        for a, b in itertools.combinations(sorted(ks), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return counts

def test_cooc_pairs_match_naive_self_join(spark, fb, tmp_path):
    got = {
        (r.ia, r.ib): r.n_ab
        for r in _cooc_pairs(spark, str(tmp_path), fb, tag="t_cooc_pairs")
        .groupBy("ia", "ib")
        .agg(F.sum("w").alias("n_ab"))
        .collect()
    }
    want = _naive([(r.user_id, r.k) for r in fb.collect()])
    assert got == want


def test_heavy_basket_actually_bucketed(spark, fb):
    """Fixture invariant: the heavy basket's items really spread over
    multiple hash buckets, so the (p < q) cross-bucket branch and the
    (p = q) intra-bucket branch are BOTH exercised above."""
    n_buckets = (
        fb.filter(F.col("user_id") == 9)
        .select(F.pmod(F.hash("k"), F.lit(COOC_PAIR_BUCKETS)).alias("g"))
        .distinct()
        .count()
    )
    assert n_buckets > 1
