"""Cross-doc attention accounting (operators/curation.py
q_pack_mask_audit): the identity against a hand-computed packed bin,
bounds, and the fixture showing a real masking decision."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.curation import QUERIES


def test_identity_on_crafted_bin():
    """Two docs of lengths 3 and 5 in one bin: T=8, T²=64, Σl²=34 —
    cross pairs 30, fraction 30/64."""
    t, sq = 8, 9 + 25
    assert t * t - sq == 30
    assert round(30 / 64, 6) == 0.468750


def test_bounds_and_fixture_signal(spark, sf_dir):
    df = QUERIES["q_pack_mask_audit"](spark, sf_dir).cache()
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.cross_pair_frac <= 1.0
        assert r.cross_pair_frac <= r.worst_bin_cross_frac <= 1.0
    # the fixture packs many small docs per budget bin, so unmasked
    # attention would be dominated by cross-doc pairs — the measured
    # reason the mask exists
    assert max(r.cross_pair_frac for r in rows) > 0.5
