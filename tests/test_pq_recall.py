"""PQ-ANN quality gate (VERDICT r1 item 7): the two-stage design (ADC
shortlist -> exact re-rank) must recover most of the true top-10. The
oracle diff proves both engines compute the SAME thing; this test
proves the thing computed is a good ANN."""

from __future__ import annotations

import os

import pytest

from orders_kafka_streams_spark.operators import similarity as sim

SF_001 = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_001), reason="sf0.01 testdata absent")
def test_pq_recall_at_10_vs_brute(spark):
    brute: dict[int, set[int]] = {}
    for r in sim.QUERIES["q_knn_brute"](spark, SF_001).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    pq: dict[int, set[int]] = {}
    for r in sim.QUERIES["q_knn_pq"](spark, SF_001).collect():
        pq.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(pq) == set(brute)
    recalls = {q: len(brute[q] & pq[q]) / len(brute[q]) for q in brute}
    mean = sum(recalls.values()) / len(recalls)
    # measured 0.96 mean / 0.9 min at sf0.01 (M=16, K=32, L=100);
    # gate with headroom for data regeneration
    assert mean >= 0.8, recalls
    assert min(recalls.values()) >= 0.6, recalls
