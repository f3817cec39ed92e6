"""Streaming incremental dedup twin (VERDICT r2 item 8).

The probe's candidate side is the full memoized band index, so a delta
doc's verdict must be identical however the stream splits the delta
into micro-batches — and the assembled streaming output must equal the
batch q_dedup_incremental exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators import dedup, streaming_queries
from orders_kafka_streams_spark.sources.tables import load_table


def _delta_docs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % dedup.DELTA_MOD == dedup.DELTA_MOD - 1)
        .select("doc_id", "text")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_probe_batch_split_invariant(spark, sf_dir):
    """probe(half A) ∪ probe(half B) == probe(whole delta)."""
    delta = _delta_docs(spark, sf_dir)
    whole = dedup.dedup_incremental_probe(spark, sf_dir, delta)
    lo = delta.filter(F.col("doc_id") % (2 * dedup.DELTA_MOD) == dedup.DELTA_MOD - 1)
    hi = delta.filter(F.col("doc_id") % (2 * dedup.DELTA_MOD) != dedup.DELTA_MOD - 1)
    a = dedup.dedup_incremental_probe(spark, sf_dir, lo)
    b = dedup.dedup_incremental_probe(spark, sf_dir, hi)
    assert _rows(a.unionByName(b)) == _rows(whole)


def test_probe_matches_batch_query(spark, sf_dir):
    """The text-derived probe must equal the index-derived batch query
    (same expressions ⇒ same shingles/bands ⇒ same verdicts)."""
    got = dedup.dedup_incremental_probe(spark, sf_dir, _delta_docs(spark, sf_dir))
    want = dedup.QUERIES["q_dedup_incremental"](spark, sf_dir)
    assert _rows(got) == _rows(want)


def test_streaming_twin_matches_batch(spark, sf_dir):
    got = streaming_queries.QUERIES["q_stream_dedup_incremental"](spark, sf_dir)
    want = dedup.QUERIES["q_dedup_incremental"](spark, sf_dir)
    assert _rows(got) == _rows(want)
