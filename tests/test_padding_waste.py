"""Padding-waste audit (operators/sampling.py q_padding_waste):
conservation invariants and the bucketing win the table exists to
measure."""

from __future__ import annotations

from orders_kafka_streams_spark.operators.sampling import QUERIES


def test_conservation_and_bucketing_win(spark, sf_dir):
    rows = {r.strategy: r for r in QUERIES["q_padding_waste"](spark, sf_dir).collect()}
    assert set(rows) == {"arrival", "length_sorted"}
    a, s = rows["arrival"], rows["length_sorted"]
    # same corpus under both strategies
    assert a.real_tokens == s.real_tokens
    assert a.n_batches == s.n_batches
    for r in (a, s):
        assert r.padded_tokens >= r.real_tokens
        assert 0.0 <= r.pad_frac < 1.0
    # the point of bucketing: sorted batching wastes strictly less
    assert s.pad_frac < a.pad_frac
    assert s.padded_tokens < a.padded_tokens
