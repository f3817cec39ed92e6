"""Multi-table-LSH ANN quality gate (VERDICT r2 item 4): recall@10 vs
the exact brute-force top-10, PLUS the candidate fraction — an ANN is
only honest if both the quality and the cost are measured. On this
near-random synthetic corpus (no cluster structure) the s-curve gives
recall ≈ 0.70 while touching ≈ 0.42 of the corpus — roughly a 1.7×
lift over random candidate selection, which is what hyperplane LSH can
deliver without neighborhood structure; on clustered real embeddings
the candidate fraction drops sharply at held recall (the regime the
index exists for). The oracle diff proves both engines compute the
same thing; this test proves the thing computed is a measured ANN.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators import similarity as sim

SF_001 = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_001), reason="sf0.01 testdata absent")
def test_lsh_recall_at_10_vs_brute(spark):
    brute: dict[int, set[int]] = {}
    for r in sim.QUERIES["q_knn_brute"](spark, SF_001).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh: dict[int, set[int]] = {}
    for r in sim.QUERIES["q_knn_lsh"](spark, SF_001).collect():
        lsh.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(lsh) == set(brute)
    recalls = {q: len(brute[q] & lsh[q]) / len(brute[q]) for q in brute}
    mean = sum(recalls.values()) / len(recalls)
    # measured 0.70 mean / 0.50 min at sf0.01 (4 bits × 8 tables);
    # gate with headroom for data regeneration
    assert mean >= 0.5, recalls
    assert min(recalls.values()) >= 0.2, recalls


@pytest.mark.skipif(not os.path.isdir(SF_001), reason="sf0.01 testdata absent")
def test_lsh_candidate_fraction_beats_random(spark):
    """The measured-cost half of the gate: candidates per probe must be
    a strict subset of the corpus (candidate generation prunes), and
    recall must exceed the candidate fraction (the signature carries
    signal — random candidate selection would have recall ≈ fraction)."""
    v = sim._prepared(spark, SF_001)
    n_corpus = v.count()
    per_probe = (
        sim.lsh_candidates(spark, SF_001)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    fracs = {r.query_id: r.n / (n_corpus - 1) for r in per_probe}
    mean_frac = sum(fracs.values()) / len(fracs)
    assert mean_frac < 0.7, fracs  # prunes most of the corpus per table set

    brute: dict[int, set[int]] = {}
    for r in sim.QUERIES["q_knn_brute"](spark, SF_001).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh: dict[int, set[int]] = {}
    for r in sim.QUERIES["q_knn_lsh"](spark, SF_001).collect():
        lsh.setdefault(r.query_id, set()).add(r.neighbor_id)
    mean_recall = sum(
        len(brute[q] & lsh.get(q, set())) / len(brute[q]) for q in brute
    ) / len(brute)
    assert mean_recall > mean_frac + 0.1, (mean_recall, mean_frac)


def test_index_builds_agree(spark, sf_dir):
    """The Arrow-kernel index build must agree bit-for-bit with the
    portable fold-expression build (the DuckDB oracle's math) — the
    only divergence risk is a projection within float ulps of zero."""
    v = sim._prepared(spark, sf_dir)
    fast = sim._lsh_sigs_long(v)
    fold = sim._lsh_sigs_long_fold(v)
    assert fast.exceptAll(fold).count() == 0
    assert fold.exceptAll(fast).count() == 0


@pytest.mark.skipif(not os.path.isdir(SF_001), reason="sf0.01 testdata absent")
def test_hybrid_ann_recall_vs_exact(spark):
    """The ANN-fed hybrid must recover most of the exact hybrid's
    top-10 — the recall gate for the index-backed retrieval seam
    (VERDICT r2 item 3)."""
    exact: dict[int, set[int]] = {}
    for r in sim.QUERIES["q_hybrid_search"](spark, SF_001).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    ann: dict[int, set[int]] = {}
    for r in sim.QUERIES["q_hybrid_search_ann"](spark, SF_001).collect():
        ann.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ann) == set(exact)
    recalls = {q: len(exact[q] & ann[q]) / len(exact[q]) for q in exact}
    mean = sum(recalls.values()) / len(recalls)
    assert mean >= 0.4, recalls
