"""Full-funnel capstone (operators/curation.py q_corpus_final): the
extension gates must be monotone restrictions of the clean corpus, and
each must actually remove at least one survivor on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.curation import QUERIES as CQ
from orders_kafka_streams_spark.operators.dedup import QUERIES as DQ
from orders_kafka_streams_spark.operators.text import QUERIES as TQ


def test_funnel_monotone_and_both_gates_fire(spark, sf_dir):
    clean = CQ["q_clean_corpus"](spark, sf_dir).select("doc_id").cache()
    final = CQ["q_corpus_final"](spark, sf_dir).cache()
    final_ids = {r.doc_id for r in final.select("doc_id").collect()}
    clean_ids = {r.doc_id for r in clean.collect()}
    assert final_ids < clean_ids  # strict restriction

    rep_drop = {
        r.doc_id
        for r in TQ["q_repetition_filter"](spark, sf_dir)
        .filter(~F.col("keep"))
        .select("doc_id")
        .collect()
    }
    risky = {
        r.doc_id
        for r in DQ["q_memorization_risk"](spark, sf_dir)
        .filter(F.col("risk") == "high")
        .select("doc_id")
        .collect()
    }
    # each extension gate removes at least one clean-corpus survivor
    assert clean_ids & rep_drop
    assert clean_ids & risky
    # and the final set is exactly the composition
    assert final_ids == clean_ids - rep_drop - risky


def test_surgery_columns_carried(spark, sf_dir):
    final = CQ["q_corpus_final"](spark, sf_dir)
    assert {"doc_id", "source", "final_text", "n_tokens_final",
            "removed_tokens", "n_redactions"} <= set(final.columns)
