"""Memorization-risk audit (operators/dedup.py q_memorization_risk):
tier rule consistency, integer-exact exposure, and fixture health —
all three triage tiers must be populated or the audit verifies
nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.dedup import (
    MEMRISK_DUPFRAC_T,
    QUERIES,
)


def test_tier_rule_and_exposure(spark, sf_dir):
    df = QUERIES["q_memorization_risk"](spark, sf_dir).cache()
    want = (
        F.when(F.col("n_near_dups") > 0, F.lit("high"))
        .when(F.col("dup_frac") >= MEMRISK_DUPFRAC_T, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    assert df.filter(F.col("risk") != want).count() == 0
    assert df.filter(
        F.col("exposure") != F.col("n_tokens") * F.col("n_dup_shingles")
    ).count() == 0


def test_fixture_populates_all_tiers(spark, sf_dir):
    df = QUERIES["q_memorization_risk"](spark, sf_dir)
    tiers = {r.risk for r in df.select("risk").distinct().collect()}
    assert tiers == {"high", "medium", "low"}


def test_near_dup_docs_are_high(spark, sf_dir):
    """Every doc in the near-dup pair relation lands in the high tier —
    the Lee 2022 rule the audit exists to enforce."""
    from orders_kafka_streams_spark.operators.dedup import _ngram_pairs_cached

    pairs = _ngram_pairs_cached(spark, sf_dir)
    in_pairs = {
        r[0]
        for r in pairs.select(F.col("a").alias("doc_id"))
        .unionByName(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
        .collect()
    }
    df = QUERIES["q_memorization_risk"](spark, sf_dir)
    high = {r.doc_id for r in df.filter(F.col("risk") == "high").collect()}
    assert in_pairs == high
