"""q_apply_excision — the ExactSubstr REWRITE artifact (VERDICT r8
item 2): token-span surgery over the exact-substring span relation.

The load-bearing property is CLOSURE (Lee et al. 2022 §4.1): after
excising every span, re-running span detection on the cleaned corpus
must find no cross-document duplicated L-window. Plus geometry seams:
untouched docs pass through verbatim, removed token counts reconcile
with the span relation, and the char accounting matches the re-joined
token stream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from orders_kafka_streams_spark.operators.dedup import (
    EXSUB_L,
    _exsub_pos,
    _exsub_shared,
    apply_excision_of,
    exact_substring_spans,
    exsub_pos_of,
)
from orders_kafka_streams_spark.functions.textfns import tokens
from orders_kafka_streams_spark.operators.dedup import QUERIES


@pytest.fixture(scope="module")
def cleaned(spark, sf_dir):
    return QUERIES["q_apply_excision"](spark, sf_dir).persist()


def test_closure_no_cross_doc_window_survives(spark, sf_dir, cleaned):
    """Re-detect on the cleaned corpus: zero L-windows shared by >= 2
    DISTINCT documents. (Within-doc repeats created by juxtaposition
    at cut points are not asserted on — the cross-doc set is what
    contaminates training data.)"""
    clean_docs = cleaned.select("doc_id", F.col("clean_text").alias("text"))
    pos = exsub_pos_of(clean_docs)
    cross = (
        pos.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
    )
    assert cross.count() == 0


def test_untouched_docs_pass_through(spark, sf_dir, cleaned):
    """Docs with no spans keep every token: clean_text equals the
    re-joined token stream and both removed_* counters are zero."""
    spans = exact_substring_spans(_exsub_pos(spark, sf_dir), _exsub_shared(spark, sf_dir))
    touched = spans.select("doc_id").distinct()
    from orders_kafka_streams_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    untouched = (
        docs.join(touched, "doc_id", "left_anti")
        .withColumn("expect", F.array_join(tokens(F.col("text")), " "))
        .join(cleaned, "doc_id")
    )
    assert untouched.filter(
        (F.col("clean_text") != F.col("expect"))
        | (F.col("removed_tokens") != 0)
        | (F.col("removed_chars") != 0)
    ).count() == 0
    # and the corpus splits exactly into touched + untouched
    assert cleaned.count() == docs.count()


def test_removed_tokens_reconcile_with_spans(spark, sf_dir, cleaned):
    """Per-doc removed_tokens equals the span relation's token sum —
    spans are token-disjoint by construction, so the surgery must
    remove exactly their union."""
    spans = exact_substring_spans(_exsub_pos(spark, sf_dir), _exsub_shared(spark, sf_dir))
    per_doc = spans.groupBy("doc_id").agg(F.sum("span_tokens").alias("want"))
    bad = per_doc.join(cleaned, "doc_id").filter(F.col("want") != F.col("removed_tokens"))
    assert bad.count() == 0


def test_removed_present_on_this_corpus(cleaned):
    """The fixture corpus contains duplicated substrings (the dedup
    family's tests depend on that), so the surgery must actually cut
    something — guards against a silently-empty span relation."""
    assert cleaned.filter(F.col("removed_tokens") > 0).count() > 0


def test_char_accounting(spark, sf_dir, cleaned):
    """removed_chars is measured against the re-joined token stream:
    len(join(toks)) - len(clean_text), never negative, and zero iff
    removed_tokens is zero (every token is at least one char)."""
    bad = cleaned.filter(
        (F.col("removed_chars") < 0)
        | ((F.col("removed_tokens") == 0) != (F.col("removed_chars") == 0))
    )
    assert bad.count() == 0
