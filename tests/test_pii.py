"""PII scan/redaction unit checks (q_pii_scan, operators/privacy.py).

The oracle gate already proves Spark and DuckDB agree; these tests
pin the semantics themselves on a controlled fixture: injection
residue arithmetic, per-kind count exactness, no cross-pattern
bleed (a phone must not also count as a gov-id), and redaction
completeness (a second scan over the redacted text finds nothing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.privacy import (
    PII_PATTERNS,
    pii_augmented_text,
    pii_scan,
)

N = 400  # covers every residue class several times


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma").alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
        F.lit(16).alias("n_chars"),
    )


def _expected_counts():
    kinds = {"email": 0, "phone": 0, "govid": 0, "ipv4": 0}
    with_pii = 0
    for d in range(N):
        e, p, g, i = d % 7 == 0, d % 11 == 3, d % 17 == 2, d % 13 == 5
        kinds["email"] += e
        kinds["phone"] += p
        kinds["govid"] += g
        kinds["ipv4"] += i
        with_pii += e or p or g or i
    return kinds, with_pii


def test_counts_match_residue_arithmetic(spark, docs):
    rows = pii_scan(docs).collect()
    kinds, with_pii = _expected_counts()
    assert sum(r["n_docs"] for r in rows) == N
    assert sum(r["docs_with_pii"] for r in rows) == with_pii
    for name in kinds:
        assert sum(r[f"n_{name}"] for r in rows) == kinds[name], name


def test_no_cross_pattern_bleed(spark, docs):
    """Each injected span matches EXACTLY its own pattern: total
    per-kind counts equal the residue-class sizes, so e.g. the phone
    '555-abc-wxyz' never also fires the govid automaton (which would
    overcount govid)."""
    aug = docs.select(pii_augmented_text().alias("text"))
    per_kind = aug.select(
        *[
            F.sum(F.regexp_count("text", F.lit(pat))).alias(name)
            for name, pat, _ in PII_PATTERNS
        ]
    ).first()
    kinds, _ = _expected_counts()
    for name in kinds:
        assert per_kind[name] == kinds[name], name


def test_redaction_is_complete(spark, docs):
    """After replacing every span with its placeholder, a fresh scan
    over the redacted text finds zero matches of ANY kind — the
    property a release gate actually needs."""
    red = pii_augmented_text()
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    residue = docs.select(red.alias("text")).select(
        sum(
            F.sum(F.regexp_count("text", F.lit(pat))) for _, pat, _ in PII_PATTERNS
        ).alias("left")
    )
    assert residue.first()["left"] == 0


def test_stream_gate_equals_batch_scan(spark, sf_dir):
    """The assembled streaming-gate output is exactly the batch
    per-doc scan — a doc's verdict depends only on that doc, so
    batching cannot change it."""
    from orders_kafka_streams_spark.operators.privacy import pii_doc_scan
    from orders_kafka_streams_spark.operators.streaming_queries import QUERIES
    from orders_kafka_streams_spark.sources.tables import load_table

    got = sorted(
        tuple(r) for r in QUERIES["q_stream_pii_gate"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in pii_doc_scan(load_table(spark, sf_dir, "documents")).collect()
    )
    assert got == want


def test_scan_is_single_exchange(spark, docs):
    """Scale posture: map-only regex + one cell aggregation — the
    plan must carry exactly one Exchange (plus the tiny final sort)
    and no Python eval node."""
    plan = pii_scan(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
