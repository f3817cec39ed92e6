"""Curriculum schedule contracts (q_curriculum_order, r10): bijective
positions, stage-monotone ordering, seeded within-stage shuffle equal
to the one-window form, and input-partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.sampling import (
    CURRICULUM_BUCKET_TOKENS,
    CURRICULUM_BUCKETS,
    _q_curriculum_order,
)


def test_schedule_contracts(spark, sf_dir):
    rows = _q_curriculum_order(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    # bijection: positions are exactly 1..n
    assert sorted(r.curriculum_pos for r in rows) == list(range(1, n + 1))
    # stage assignment honors the integer boundaries and the cap
    for r in rows:
        want = min(r.n_tokens // CURRICULUM_BUCKET_TOKENS, CURRICULUM_BUCKETS - 1)
        assert r.stage == want, r
    # stage-monotone: every stage-s position precedes every stage-(s+1)
    by_stage: dict[int, list[int]] = {}
    for r in rows:
        by_stage.setdefault(r.stage, []).append(r.curriculum_pos)
    stages = sorted(by_stage)
    assert len(stages) > 1  # the corpus must actually spread over stages
    for lo, hi in zip(stages, stages[1:]):
        assert max(by_stage[lo]) < min(by_stage[hi]), (lo, hi)


def test_matches_one_window_form(spark, sf_dir):
    from pyspark.sql.window import Window

    from orders_kafka_streams_spark.functions.portable import hash60
    from orders_kafka_streams_spark.operators.sampling import CURRICULUM_SEED
    from orders_kafka_streams_spark.operators.text import _tokenized

    got = {
        r.doc_id: r.curriculum_pos for r in _q_curriculum_order(spark, sf_dir).collect()
    }
    base = _tokenized(spark, sf_dir).select("doc_id", F.size("t").alias("n_tokens"))
    stage = F.least(
        F.floor(F.col("n_tokens") / CURRICULUM_BUCKET_TOKENS),
        F.lit(CURRICULUM_BUCKETS - 1),
    )
    k = hash60(F.concat(F.lit(CURRICULUM_SEED), F.col("doc_id").cast("string")))
    w = Window.orderBy(stage.asc(), k.asc(), F.col("doc_id").asc())
    want = {
        r.doc_id: r.pos
        for r in base.select("doc_id", F.row_number().over(w).alias("pos")).collect()
    }
    assert got == want
