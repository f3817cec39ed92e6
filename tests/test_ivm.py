"""Incremental view maintenance: the refresh algebra is additive, so
any batching of the corpus must converge to the same view — pinned
directly (split-invariance of the pure merge) and end-to-end (the
streaming sink equals the batch refresh equals the full recompute).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.warehouse import _ivm_cells, _q_ivm_refresh
from orders_kafka_streams_spark.sources.tables import load_table
from orders_kafka_streams_spark.streaming.ivm import merge_cells


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_is_split_invariant(spark, sf_dir):
    """Folding the corpus in 2 uneven splits == folding in 3 == one
    shot: the additive-merge associativity the streaming sink relies
    on."""
    docs = load_table(spark, sf_dir, "documents")
    one = _ivm_cells(docs)

    def fold(splits):
        acc = _ivm_cells(splits[0])
        for s in splits[1:]:
            acc = merge_cells(acc, _ivm_cells(s))
        return acc

    two = fold([docs.filter(F.col("doc_id") % 3 == 0), docs.filter(F.col("doc_id") % 3 != 0)])
    three = fold([docs.filter(F.col("doc_id") % 3 == i) for i in range(3)])
    assert _rows(one) == _rows(two) == _rows(three)


def test_stream_equals_batch_refresh(spark, sf_dir):
    from orders_kafka_streams_spark.operators.streaming_queries import QUERIES

    got = _rows(QUERIES["q_stream_ivm"](spark, sf_dir))
    want = _rows(_q_ivm_refresh(spark, sf_dir))
    assert got == want
