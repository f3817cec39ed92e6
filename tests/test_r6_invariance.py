"""Mathematical invariances of the round-6 statistics — properties the
oracle hash can't state: Kruskal-Wallis is a RANK test (invariant
under strictly monotone value transforms), Theil-Sen is affine-
equivariant (slope(a·y+c) = a·slope(y)), and Gini is scale-invariant
(multiplying every user's count by k leaves G unchanged).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.stats import _q_gini_activity, _q_kruskal
from orders_kafka_streams_spark.operators.timeseries import _q_theil_sen
from orders_kafka_streams_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _events_dir(tmp_path, name, df):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    df.toPandas().to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def test_kruskal_invariant_under_monotone_transform(spark, tmp_path):
    base = _q_kruskal(spark, SF).first()
    ev = load_table(spark, SF, "events")
    # strictly monotone: y -> exp(y/50) + 3y (order-preserving)
    warped = ev.withColumn(
        "value", F.exp(F.col("value") / 50.0) + 3.0 * F.col("value")
    )
    d = _events_dir(tmp_path, "warp", warped)
    w = _q_kruskal(spark, d).first()
    assert w.h_corrected == pytest.approx(base.h_corrected, abs=1e-4), (
        "rank statistic moved under a monotone transform"
    )
    assert w.significant == base.significant


def test_theil_sen_affine_equivariant(spark, tmp_path):
    """Duplicate every event 3x (counts scale by 3): every pairwise
    slope scales by 3, so the median slope must scale by exactly 3."""
    base = {r.event_type: r for r in _q_theil_sen(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    tripled = ev.unionByName(ev).unionByName(ev)
    d = _events_dir(tmp_path, "tripled", tripled)
    out = {r.event_type: r for r in _q_theil_sen(spark, d).collect()}
    for t, r in base.items():
        assert out[t].sen_slope == pytest.approx(3 * r.sen_slope, abs=1e-5), t
        assert out[t].n_hours == r.n_hours  # same support, 3x density


def test_gini_scale_invariant(spark, tmp_path):
    """Duplicating every event k-fold multiplies every per-user count
    by k — a pure scale change, so G is unchanged exactly."""
    base = {r.group_key: r for r in _q_gini_activity(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    doubled = ev.unionByName(ev)
    d = _events_dir(tmp_path, "doubled", doubled)
    out = {r.group_key: r for r in _q_gini_activity(spark, d).collect()}
    for g, r in base.items():
        assert out[g].gini == pytest.approx(r.gini, abs=1e-6), g
        assert out[g].n_users == r.n_users
        assert out[g].total_events == 2 * r.total_events
