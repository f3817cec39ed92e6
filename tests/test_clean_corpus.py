"""q_clean_corpus — the r9 capstone: gates ∩ span excision ∩ PII
redaction composed into the shippable text artifact. The oracle hash
proves end-to-end equality; these tests pin the seams a green hash
can't localize: the survivor set must be exactly q_prepare_training's
doc set, and the output text must carry zero live PII.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from orders_kafka_streams_spark.operators.curation import QUERIES as CQ
from orders_kafka_streams_spark.operators.privacy import PII_PATTERNS


@pytest.fixture(scope="module")
def clean(spark, sf_dir):
    return CQ["q_clean_corpus"](spark, sf_dir).persist()


def test_survivors_equal_prepare_training_docs(spark, sf_dir, clean):
    """Same gates, same survivor set: the capstones must agree on
    WHICH docs ship (q_prepare_training emits chunks, so compare
    distinct doc ids)."""
    pt_docs = {
        r["doc_id"]
        for r in CQ["q_prepare_training"](spark, sf_dir).select("doc_id").distinct().collect()
    }
    cc_docs = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert cc_docs == pt_docs


def test_no_live_pii_in_final_text(clean):
    """Redaction completeness: no pattern of the library matches the
    shipped text (placeholders don't re-match their own patterns)."""
    live = sum(
        (F.regexp_count("final_text", F.lit(pat)) for _, pat, _ in PII_PATTERNS),
        F.lit(0),
    )
    assert clean.filter(live > 0).count() == 0


def test_stream_twin_equals_batch_on_delta(spark, sf_dir, clean):
    """q_stream_clean_corpus assembles, across micro-batches, exactly
    the batch capstone restricted to delta docs — the Spark-side face
    of the driver's delta-scoped oracle (per-doc independence makes
    batching invisible)."""
    from orders_kafka_streams_spark.operators.dedup import DELTA_MOD
    from orders_kafka_streams_spark.operators.streaming_queries import (
        QUERIES as SQ,
    )

    got = {
        tuple(r) for r in SQ["q_stream_clean_corpus"](spark, sf_dir).collect()
    }
    want = {
        tuple(r)
        for r in clean.filter(
            F.col("doc_id") % DELTA_MOD == DELTA_MOD - 1
        ).collect()
    }
    assert got == want


def test_stream_apply_excision_equals_batch_on_delta(spark, sf_dir):
    """Same contract for the surgery twin: assembled stream output ==
    q_apply_excision restricted to delta docs."""
    from orders_kafka_streams_spark.operators.dedup import DELTA_MOD
    from orders_kafka_streams_spark.operators.dedup import QUERIES as DQ
    from orders_kafka_streams_spark.operators.streaming_queries import (
        QUERIES as SQ,
    )

    got = {
        tuple(r) for r in SQ["q_stream_apply_excision"](spark, sf_dir).collect()
    }
    want = {
        tuple(r)
        for r in DQ["q_apply_excision"](spark, sf_dir)
        .filter(F.col("doc_id") % DELTA_MOD == DELTA_MOD - 1)
        .collect()
    }
    assert got == want


def test_counters_sane(clean):
    """removed_tokens/n_redactions/n_tokens_final non-negative; a doc
    can only ship empty if the surgery removed everything (the gates
    run BEFORE the text surgery, so a fully-duplicated survivor
    legitimately excises to zero tokens — stated semantics; the
    downstream packing stage drops empties); the surgery and
    redaction both fire somewhere on this corpus."""
    assert clean.filter(
        (F.col("removed_tokens") < 0)
        | (F.col("n_redactions") < 0)
        | (F.col("n_tokens_final") < 0)
    ).count() == 0
    assert clean.filter(
        (F.col("n_tokens_final") == 0) & (F.col("removed_tokens") == 0)
    ).count() == 0
    assert clean.filter(F.col("removed_tokens") > 0).count() > 0
    assert clean.filter(F.col("n_redactions") > 0).count() > 0
