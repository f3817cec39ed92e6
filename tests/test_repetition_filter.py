"""Gopher-style repetition gates (operators/text.py
q_repetition_filter): hand-computed coverage fractions on crafted
docs — including the overlap case that distinguishes UNION coverage
from occurrence-sum counting — plus fixture health on the real corpus
(both rules must actually fire)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.text import (
    QUERIES,
    REP_DUP3_MAX,
    REP_TOP2_MAX,
)

DOCS = [
    # doc 1: total collapse — "a a a a": top bigram "a a" x3 covers all
    # 4 positions; trigram "a a a" x2 covers all 4
    (1, "a a a a"),
    # doc 2: alternating — every position covered by both rules
    (2, "a b a b a b"),
    # doc 3: 10 unique tokens — top bigram occurs ONCE, so the rule
    # must NOT fire (the short-doc sanity case: 2/10 = 0.2 > threshold
    # would have dropped a zero-repetition doc)
    (3, "q w e r t y u i o p"),
    # doc 4: one overlapping repeat "a a a" in a 12-token doc — union
    # coverage is 3 positions (0,1,2), NOT 2 occurrences x 2 tokens
    (4, "a a a b c d e f g h i j"),
]


def _fixture_dir(spark, tmp_path):
    d = os.path.join(str(tmp_path), "sfrep")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_hand_computed_fractions(spark, tmp_path):
    d = _fixture_dir(spark, tmp_path)
    rows = {r.doc_id: r for r in QUERIES["q_repetition_filter"](spark, d).collect()}
    assert rows[1].top_bigram == "a a" and rows[1].top_count == 3
    assert rows[1].top2_frac == 1.0 and rows[1].dup3_frac == 1.0
    assert not rows[1].keep

    assert rows[2].top_bigram == "a b" and rows[2].top_count == 3
    assert rows[2].top2_frac == 1.0 and rows[2].dup3_frac == 1.0
    assert not rows[2].keep

    # once-occurring top bigram: repetition coverage is ZERO
    assert rows[3].top_count == 1
    assert rows[3].top2_frac == 0.0 and rows[3].dup3_frac == 0.0
    assert rows[3].keep

    # union coverage: "a a" at positions 0 and 1 covers {0,1,2} = 3/12,
    # not 4/12 — overlaps never double-count
    assert rows[4].top_bigram == "a a" and rows[4].top_count == 2
    assert rows[4].top2_frac == 0.25
    assert rows[4].dup3_frac == 0.0  # "a a a" occurs once
    assert not rows[4].keep  # 0.25 >= REP_TOP2_MAX


def test_fraction_bounds_and_keep_rule(spark, sf_dir):
    df = QUERIES["q_repetition_filter"](spark, sf_dir).cache()
    bad = df.filter(
        (F.col("top2_frac") < 0)
        | (F.col("top2_frac") > 1)
        | (F.col("dup3_frac") < 0)
        | (F.col("dup3_frac") > 1)
    ).count()
    assert bad == 0
    mismatch = df.filter(
        F.col("keep")
        != ((F.col("top2_frac") < REP_TOP2_MAX) & (F.col("dup3_frac") < REP_DUP3_MAX))
    ).count()
    assert mismatch == 0


def test_fixture_health_both_rules_fire(spark, sf_dir):
    """'A threshold nothing crosses verifies nothing' — each rule must
    drop at least one real corpus doc."""
    df = QUERIES["q_repetition_filter"](spark, sf_dir).cache()
    assert df.filter(F.col("top2_frac") >= REP_TOP2_MAX).count() >= 1
    assert df.filter(F.col("dup3_frac") >= REP_DUP3_MAX).count() >= 1
    assert df.filter(F.col("keep")).count() >= 1


def test_stream_twin_equals_batch_restriction(spark, sf_dir):
    """The ingest twin must equal the batch gate restricted to the
    delta docs — per-doc functions make this exact, not approximate."""
    from orders_kafka_streams_spark.operators.dedup import DELTA_MOD
    from orders_kafka_streams_spark.operators.streaming_queries import QUERIES as SQ

    got = sorted(map(tuple, SQ["q_stream_repetition"](spark, sf_dir).collect()))
    want = sorted(
        map(
            tuple,
            QUERIES["q_repetition_filter"](spark, sf_dir)
            .filter(F.col("doc_id") % DELTA_MOD == DELTA_MOD - 1)
            .collect(),
        )
    )
    assert got == want and len(got) > 0
