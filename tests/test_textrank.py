"""TextRank keywords (q_textrank_keywords): graph-theoretic invariants
on planted corpora driven through the registry query (synthetic
documents parquet), plus registry-level sanity at sf0.001.
"""

from __future__ import annotations

import os

from orders_kafka_streams_spark.operators import all_queries


def _run(spark, tmp_path, texts):
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "documents.parquet"))
    return {
        r.word: (r.out_weight, r.textrank)
        for r in all_queries()["q_textrank_keywords"](spark, d).collect()
    }


def test_ring_is_uniform(spark, tmp_path):
    """A perfect 4-cycle is vertex-transitive: every word must receive
    exactly the same rank (1/n fixed point survives every iteration)."""
    got = _run(spark, tmp_path, ["a b", "b c", "c d", "d a"])
    ranks = {v[1] for v in got.values()}
    assert len(got) == 4 and len(ranks) == 1
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-4


def test_star_center_outranks_leaves(spark, tmp_path):
    """A star's center accumulates every leaf's full contribution and
    must outrank all leaves; leaves are symmetric and tie."""
    got = _run(spark, tmp_path, ["hub x1", "hub x2", "hub x3", "hub x4"])
    hub = got["hub"][1]
    leaves = [got[f"x{i}"][1] for i in range(1, 5)]
    assert all(hub > l for l in leaves)
    assert len(set(leaves)) == 1
    assert got["hub"][0] == 4 and got["x1"][0] == 1  # out-weights


def test_self_loops_dropped_and_topk_bounded(spark, sf_dir):
    from orders_kafka_streams_spark.operators.text import TEXTRANK_TOPK

    rows = all_queries()["q_textrank_keywords"](spark, sf_dir).collect()
    assert 0 < len(rows) <= TEXTRANK_TOPK
    assert all(r.textrank > 0 and r.out_weight > 0 for r in rows)
