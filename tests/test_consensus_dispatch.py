"""Size-dispatched consensus dedup (VERDICT r10 item 1): the
broadcast-semi-reduced form and the single-shuffle union→groupBy
fallback must be bit-identical on the same corpus, and the dispatch
must reduce the simhash leg only when the small legs fit the
broadcast bound (falling back scale-safe above it)."""

from __future__ import annotations

import orders_kafka_streams_spark.operators.dedup as dedup


def _rows(spark, sf_dir):
    df = dedup.QUERIES["q_dedup_consensus"](spark, sf_dir)
    return sorted(map(tuple, df.collect()))


def test_forms_bit_identical(spark, sf_dir, monkeypatch):
    fast = _rows(spark, sf_dir)
    monkeypatch.setattr(dedup, "_CONSENSUS_BROADCAST_MAX", -1)
    slow = _rows(spark, sf_dir)
    assert fast == slow
    assert len(fast) > 0  # the fixture must exercise the ensemble
    assert all(r[2] >= 2 for r in fast)  # n_methods >= 2 invariant


def test_dispatch_reduces_simhash_leg_under_bound(spark, sf_dir):
    df = dedup.QUERIES["q_dedup_consensus"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan  # broadcast-semi reduction present


def test_fallback_has_no_semi_join(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(dedup, "_CONSENSUS_BROADCAST_MAX", -1)
    df = dedup.QUERIES["q_dedup_consensus"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan  # single-shuffle scale form
