"""Semantic packing audit (operators/clustering.py q_semantic_pack):
the in-context-pretraining ordering must measurably raise intra-bin
affinity over ingestion order on the labeled-embedding corpus, and the
bin accounting must be self-consistent."""

from __future__ import annotations

from orders_kafka_streams_spark.operators.clustering import QUERIES


def _rows(spark, sf_dir):
    return {r.method: r for r in QUERIES["q_semantic_pack"](spark, sf_dir).collect()}


def test_semantic_order_raises_affinity(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    assert set(rows) == {"doc_order", "semantic"}
    # the whole point of the operator: cluster-ordered packing puts
    # semantically related docs in the same training bin
    assert rows["semantic"].avg_affinity > rows["doc_order"].avg_affinity
    for r in rows.values():
        assert -1.0 <= r.avg_affinity <= 1.0


def test_bin_accounting(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    # both orderings pack the same corpus under the same budget: same
    # doc mass, same bin count (cumsum binning depends only on the
    # token multiset, not the order)
    a, b = rows["doc_order"], rows["semantic"]
    # same token mass, same budget ⇒ same bin count up to the last
    # partial bin (the final doc's size depends on the order)
    assert abs(a.n_bins - b.n_bins) <= 1
    assert abs(a.docs_per_bin * a.n_bins - b.docs_per_bin * b.n_bins) < 2
    assert 0 < a.multi_bins <= a.n_bins
