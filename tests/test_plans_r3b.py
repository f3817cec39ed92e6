"""Plan-shape assertions for the round-3 continuation operators:
CCNet perplexity buckets, source-KL divergence, tokenizer fertility,
semantic decontamination, hubness, and the DP histogram release.
Each gate pins the scale property the docstring claims (broadcast
dimension joins, cell-bounded shuffles, TakeOrderedAndProject top-k,
deliberate-broadcast corpus scans)."""

from __future__ import annotations

from .test_plans_r3 import _n_exchanges, plan_of


def test_ccnet_lm_join_is_broadcast(spark, sf_dir):
    """The unigram-LM relation is Heaps-law-small — scoring must be a
    broadcast hash join onto the token stream, never sort-merge."""
    from orders_kafka_streams_spark.operators import text

    plan = plan_of(text._q_ccnet_buckets(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_source_divergence_no_vocab_matrix(spark, sf_dir):
    """KL splits into an observed join + closed-form remainder — the
    V×S smoothed matrix must never materialize as a cartesian over
    the vocabulary (the only nested-loop allowed is the 1-row scalar
    broadcast)."""
    from orders_kafka_streams_spark.operators import text

    plan = plan_of(text._q_source_divergence(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_tokenizer_fertility_piece_map_broadcast(spark, sf_dir):
    from orders_kafka_streams_spark.operators import text

    plan = plan_of(text._q_tokenizer_fertility(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_semantic_contamination_bench_broadcast(spark, sf_dir):
    """The benchmark side must broadcast (the deliberate corpus-scan
    shape: map-side dot products, one cell shuffle for the argmax
    window) — a shuffled cross join here would be the 100 TB killer."""
    from orders_kafka_streams_spark.operators import similarity

    plan = plan_of(similarity._q_semantic_contamination(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hubness_topk_take_ordered(spark, sf_dir):
    from orders_kafka_streams_spark.operators import similarity

    plan = plan_of(similarity._q_hubness(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan  # never a global sort
    assert "CartesianProduct" not in plan, plan


def test_heldout_bigram_no_cartesian(spark, sf_dir):
    """Count-relation joins on their keys plus the 1-row scalar
    broadcast — never a cartesian over vocab × positions."""
    from orders_kafka_streams_spark.operators import text

    plan = plan_of(text._q_heldout_bigram(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_kcenter_no_corpus_window(spark, sf_dir):
    """Each unrolled step must be broadcast + TakeOrdered: no window
    function over the corpus, no shuffled cross join."""
    from orders_kafka_streams_spark.operators import clustering

    plan = plan_of(clustering._q_kcenter_coreset(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan


def test_kcenter_radius_monotone(spark, sf_dir):
    """The k-center coverage radius certificate: min_d2 at selection
    is non-increasing down the ranks (farthest-point invariant)."""
    from orders_kafka_streams_spark.operators import clustering

    rows = sorted(
        clustering._q_kcenter_coreset(spark, sf_dir).collect(),
        key=lambda r: r["sel_rank"],
    )
    dists = [r["min_d2"] for r in rows[1:]]  # rank 1 is the seed (0.0)
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists
    assert len({r["vec_id"] for r in rows}) == len(rows)


def test_mmr_diversity_property(spark, sf_dir):
    """MMR's reason to exist: each query's 5 picks are distinct, rank 1
    is the exact top-1 (empty-set max), and every later pick scores
    λ·rel − (1−λ)·max-sim ≤ its λ·rel ceiling."""
    from orders_kafka_streams_spark.operators import similarity

    rows = similarity._q_mmr_rerank(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity._q_knn_brute(spark, sf_dir).collect()
        if r["rk"] == 1
    }
    for qid, picks in by_q.items():
        assert len({p["neighbor_id"] for p in picks}) == len(picks)
        first = min(picks, key=lambda p: p["mmr_rank"])
        assert first["neighbor_id"] == top1[qid]


def test_dp_histogram_single_cell_exchange(spark, sf_dir):
    """One partial+final count per grid cell, then map-only noise —
    cells, not events, in the (single) shuffle."""
    from orders_kafka_streams_spark.operators import privacy

    plan = plan_of(privacy._q_dp_histogram(spark, sf_dir))
    assert _n_exchanges(plan) <= 1, plan
    assert "Join" not in plan, plan
