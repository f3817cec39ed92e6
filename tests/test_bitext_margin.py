"""Margin-based bitext mining (operators/similarity.py
q_bitext_margin): the rectangular block-grid decomposition must be
invisible (any block size gives the single-cell answer), hubs must be
demoted relative to raw cosine, and the fixture must exercise both
verdicts."""

from __future__ import annotations

import orders_kafka_streams_spark.operators.similarity as sim


def _rows(spark, sf_dir):
    return sorted(
        (r.x_id, r.y_id, r.cos, r.margin, r.mined)
        for r in sim.QUERIES["q_bitext_margin"](spark, sf_dir).collect()
    )


def test_block_decomposition_invisible(spark, sf_dir, monkeypatch):
    """Forcing many small grid cells (block=16 → multi-cell at any sf)
    must reproduce the one-cell answer bit-for-bit: global top-k over
    cell winners equals top-k over the full rectangle."""
    one = _rows(spark, sf_dir)
    monkeypatch.setattr(sim, "BITEXT_BLOCK", 16)
    many = _rows(spark, sf_dir)
    assert one == many
    assert len(one) > 0


def test_fixture_exercises_both_verdicts(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    mined = [r for r in rows if r[4]]
    assert 0 < len(mined) < len(rows)
    # one best candidate per x, margins positive
    assert len({r[0] for r in rows}) == len(rows)
    assert all(r[3] > 0 for r in rows)


def test_margin_reranks_vs_cosine(spark, sf_dir):
    """The point of the margin: at least one x's best-by-margin y must
    differ from its best-by-cosine y (hub demotion) — otherwise the
    fixture verifies nothing beyond raw kNN."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from orders_kafka_streams_spark.sources.tables import load_table, parallelize

    best_margin = {
        r.x_id: r.y_id for r in sim.QUERIES["q_bitext_margin"](spark, sf_dir).collect()
    }
    emb = parallelize(load_table(spark, sf_dir, "embeddings"))
    xs = emb.filter(F.col("label") % 2 == 0)
    ys = emb.filter(F.col("label") % 2 == 1)
    sc = sim._bitext_cell_topk(xs, ys, sim.MARGIN_K, sim.BITEXT_BLOCK).filter("kx")
    w = Window.partitionBy("x_id").orderBy(F.desc("cos"), F.asc("y_id"))
    best_cos = {
        r.x_id: r.y_id
        for r in sc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }
    assert set(best_margin) == set(best_cos)
    assert any(best_margin[x] != best_cos[x] for x in best_margin)
