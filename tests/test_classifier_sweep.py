"""Quality-gate calibration sweep (operators/curation.py
q_classifier_sweep): monotonicity in the cut, consistency with the
registered classifier gate at cut 0, and the source-diversity signal
actually moving on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.curation import (
    CLS_SWEEP_CUTS,
    QUERIES,
)


def test_sweep_monotone_and_consistent(spark, sf_dir):
    rows = {r.cut: r for r in QUERIES["q_classifier_sweep"](spark, sf_dir).collect()}
    assert set(rows) == set(CLS_SWEEP_CUTS)
    cuts = sorted(rows)
    for a, b in zip(cuts, cuts[1:]):
        assert rows[a].n_keep >= rows[b].n_keep  # tighter cut keeps less
        assert rows[a].n_sources_surviving >= rows[b].n_sources_surviving
        assert rows[a].avg_kept_margin <= rows[b].avg_kept_margin
    # the registered gate (margin > 0) is the cut-0 row of this table
    gate = QUERIES["q_quality_classifier"](spark, sf_dir)
    assert rows[0.0].n_keep == gate.filter(F.col("keep")).count()


def test_fixture_exercises_the_trade(spark, sf_dir):
    """The sweep must show an actual keep-rate and diversity trade on
    the corpus, or the table verifies nothing."""
    rows = {r.cut: r for r in QUERIES["q_classifier_sweep"](spark, sf_dir).collect()}
    fracs = [rows[c].keep_frac for c in sorted(rows)]
    assert fracs[0] > 0.9 and fracs[-1] < 0.1  # spans the range
    divs = [rows[c].n_sources_surviving for c in sorted(rows)]
    assert divs[0] > divs[-1]  # aggressive cuts cost sources
