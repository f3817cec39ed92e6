"""Structural invariants for the training-prep operators — properties
the oracle hash-diff can't express (it only proves both engines agree;
these prove the agreed-on answer is RIGHT)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET,
    _q_doc_chunk,
    _q_seq_pack,
)
from orders_kafka_streams_spark.operators.text import _tokenized


def test_chunks_tile_every_document(spark, sf_dir):
    n_tok = {
        r.doc_id: r.n
        for r in _tokenized(spark, sf_dir, "source")
        .select("doc_id", F.size("t").alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    }
    spans = defaultdict(list)
    for r in _q_doc_chunk(spark, sf_dir).collect():
        spans[r.doc_id].append((r.chunk_idx, r.tok_start, r.tok_end))
    assert set(spans) == set(n_tok)
    for doc, ss in spans.items():
        ss.sort()
        # chunk 0 starts at token 1; last chunk ends at the doc end
        assert ss[0][1] == 1
        assert ss[-1][2] == n_tok[doc]
        for idx, (ci, start, end) in enumerate(ss):
            assert ci == idx
            assert start == idx * CHUNK_STRIDE + 1
            assert end - start + 1 <= CHUNK_TOKENS
            if idx > 0:  # consecutive chunks overlap (stride < size)
                prev_end = ss[idx - 1][2]
                assert start <= prev_end


def test_pack_bins_are_contiguous_and_budget_bound(spark, sf_dir):
    rows = _q_seq_pack(spark, sf_dir).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r.bin)
        # bins are dense from 0 and doc ranges never interleave
        assert [r.bin for r in bins] == list(range(len(bins)))
        for a, b in zip(bins, bins[1:]):
            assert a.last_doc < b.first_doc
        # exclusive-cumsum binning: every bin's START lies inside its
        # budget window, so a bin overflows by at most one document
        # (first-fit-by-order semantics, not bin packing)
        cum = 0
        for r in bins:
            assert cum < (r.bin + 1) * PACK_BUDGET
            assert cum >= r.bin * PACK_BUDGET
            cum += r.total_tokens
