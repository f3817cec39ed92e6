"""Holt linear-trend smoothing: closed-form sanity on synthetic
series — the oracle hash proves cross-engine equality; these prove
the recursion means what the docstring claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.timeseries import HOLT_ALPHA, HOLT_BETA


def _fold(vals):
    l, b = vals[0], vals[1] - vals[0]
    for y in vals[1:]:
        nl = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (l + b)
        b = HOLT_BETA * (nl - l) + (1 - HOLT_BETA) * b
        l = nl
    return l, b


def test_constant_series_has_zero_trend():
    l, b = _fold([7.0] * 50)
    assert abs(l - 7.0) < 1e-9 and abs(b) < 1e-9


def test_linear_series_recovers_slope():
    vals = [3.0 + 2.0 * t for t in range(60)]
    l, b = _fold(vals)
    # exact-linear input: level tracks the line, trend converges to the slope
    assert abs(b - 2.0) < 1e-6
    assert abs(l - vals[-1]) < 1e-6
