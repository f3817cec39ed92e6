"""Property-based check: the cell-based Mann-Whitney implementation
(ranks derived from running sums over distinct-value cells —
operators/stats.py mann_whitney) equals an independent pure-Python
reference with classic per-row average ranks, on arbitrary two-sample
inputs with heavy ties."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orders_kafka_streams_spark.operators.stats import mann_whitney

ROW = st.tuples(
    st.booleans(),                                  # sample A?
    st.integers(min_value=-5, max_value=5),         # value (few distinct → ties)
)
ROWS = st.lists(ROW, min_size=2, max_size=80).filter(
    lambda rs: any(a for a, _ in rs) and any(not a for a, _ in rs)
)


def _round4(x):
    """HALF_UP 4-decimal rounding — Spark's F.round (and DuckDB's
    round) semantics. Python's built-in round is banker's
    (half-to-even) and disagrees on exact midpoints: hypothesis found
    cliffs_delta = 5/32 = 0.15625 exactly, which Spark rounds to
    0.1563 and round() to 0.1562."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def _reference(rows):
    cnt = Counter(v for _, v in rows)
    cum, avg, tie3 = 0, {}, 0
    for v in sorted(cnt):
        t = cnt[v]
        avg[v] = cum + (t + 1) / 2
        tie3 += t**3 - t
        cum += t
    n_a = sum(1 for a, _ in rows if a)
    n_b = len(rows) - n_a
    r_a = sum(avg[v] for a, v in rows if a)
    u = r_a - n_a * (n_a + 1) / 2
    mu = n_a * n_b / 2
    n = n_a + n_b
    var = n_a * n_b / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u - mu) / math.sqrt(var) if var > 0 else None
    delta = 2 * u / (n_a * n_b) - 1
    return n_a, n_b, _round4(u), (_round4(z) if z is not None else None), _round4(delta)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ROWS)
def test_cell_form_equals_rowwise_reference(spark, rows):
    df = spark.createDataFrame(
        [("a" if a else "b", float(v)) for a, v in rows], "grp string, value double"
    )
    got = mann_whitney(df, "grp", "value", "a").collect()[0]
    n_a, n_b, u, z, delta = _reference(rows)
    assert (got["n_a"], got["n_b"]) == (n_a, n_b)
    assert got["u_stat"] == u
    assert got["cliffs_delta"] == delta
    if z is not None:
        assert got["z_score"] == z
    else:  # all values tied → zero variance → engine yields NULL z
        assert got["z_score"] is None
