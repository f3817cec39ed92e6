"""Phrase search: the scan form (per-doc bigram counting), the index
form (positional posting-list join), and the streaming ingest gate
must all agree — the scan-vs-index duality is the point of having
both, so it is pinned here, not just claimed in docstrings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.text import (
    _q_phrase_search,
    phrase_doc_counts,
)
from orders_kafka_streams_spark.sources.tables import load_table


def test_index_form_equals_scan_form(spark, sf_dir):
    """Aggregating the map-only per-doc counts per source must equal
    the posting-list join's per-source rollup exactly."""
    docs = load_table(spark, sf_dir, "documents")
    scan = (
        phrase_doc_counts(docs)
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_occurrences").alias("n_occurrences"),
        )
    )
    want = sorted(tuple(r) for r in scan.collect())
    got = sorted(tuple(r) for r in _q_phrase_search(spark, sf_dir).collect())
    assert got == want


def test_stream_gate_equals_batch_scan(spark, sf_dir):
    """The assembled streaming output is exactly the batch per-doc
    scan — a doc's count depends only on that doc, so batching cannot
    change it."""
    from orders_kafka_streams_spark.operators.streaming_queries import QUERIES

    got = sorted(
        tuple(r) for r in QUERIES["q_stream_phrase_search"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in phrase_doc_counts(load_table(spark, sf_dir, "documents")).collect()
    )
    assert got == want
