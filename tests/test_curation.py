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


def test_seq_pack_fuzz_vs_sequential_reference(spark):
    """Hypothesis fuzz: the windowed-cumsum packing must agree with a
    plain sequential fold for any doc-size profile — including docs
    larger than the whole budget and single-doc sources."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from orders_kafka_streams_spark.operators.curation import seq_pack

    BUDGET = 100

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),          # source
                st.integers(min_value=1, max_value=250),  # n_tokens (can exceed budget)
            ),
            min_size=1,
            max_size=30,
        )
    )
    def check(profile):
        rows = [(i, src, n) for i, (src, n) in enumerate(profile)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
        got = {
            (r.source, r.bin): (r.n_docs, r.total_tokens, r.first_doc, r.last_doc)
            for r in seq_pack(df, BUDGET).collect()
        }
        # sequential reference: exclusive running sum per source
        want = {}
        cum = {"a": 0, "b": 0}
        for doc_id, src, n in rows:
            b = cum[src] // BUDGET
            cum[src] += n
            nd, tt, fd, ld = want.get((src, b), (0, 0, doc_id, doc_id))
            want[(src, b)] = (nd + 1, tt + n, min(fd, doc_id), max(ld, doc_id))
        assert got == want

    check()


def test_dup_span_fraction_invariants(spark):
    """dup_span_stats invariants on synthetic docs: an exact twin pair
    shares every shingle (dup_frac == 1.0), a unique doc shares none
    (dup_frac == 0.0), and a half-overlapping doc is strictly between."""
    from orders_kafka_streams_spark.operators.dedup import dup_span_stats

    rows = [
        (1, [11, 12, 13, 14], 4),   # exact twin of 2
        (2, [11, 12, 13, 14], 4),
        (3, [21, 22, 23, 24], 4),   # unique
        (4, [11, 12, 31, 32], 4),   # half overlaps the twin pair
        (5, [], 0),                 # empty doc: guarded division
    ]
    sh = spark.createDataFrame(rows, "doc_id long, sh array<long>, sz int")
    got = {r.doc_id: r for r in dup_span_stats(sh).collect()}
    assert got[1].dup_frac == 1.0 and got[2].dup_frac == 1.0
    assert got[3].dup_frac == 0.0 and got[3].n_dup == 0
    assert got[4].dup_frac == 0.5 and got[4].n_dup == 2
    assert got[5].dup_frac == 0.0 and got[5].n_shingles == 0


def test_source_quota_is_topq_per_source(spark, sf_dir):
    """q_source_quota == the top-SOURCE_QUOTA docs per source under
    (margin DESC, doc_id) — checked against an independently computed
    driver-side sort of the full classifier relation, plus the cap and
    rank-density invariants."""
    from orders_kafka_streams_spark.operators.curation import (
        QUERIES,
        SOURCE_QUOTA,
        classifier_scores,
    )

    kept = QUERIES["q_source_quota"](spark, sf_dir).collect()
    base = _tokenized(spark, sf_dir, "source").filter(F.size("t") > 0)
    scored = classifier_scores(base).collect()

    by_src = defaultdict(list)
    for r in scored:
        by_src[r.source].append((-r.margin, r.doc_id))
    want = {}
    for src, rows in by_src.items():
        rows.sort()
        for rank, (neg_m, doc_id) in enumerate(rows[:SOURCE_QUOTA], start=1):
            want[doc_id] = (src, -neg_m, rank)

    got = {r.doc_id: (r.source, r.margin, r.src_rank) for r in kept}
    assert got == want
    counts = defaultdict(int)
    for src, _, rank in got.values():
        counts[src] += 1
        assert 1 <= rank <= SOURCE_QUOTA
    assert all(c <= SOURCE_QUOTA for c in counts.values())


def test_mixture_manifest_accounting(spark, sf_dir):
    """Datasheet invariants: monotone funnel (final <= gated <= raw),
    the quota binds exactly, final token shares sum to 1, and the
    per-source final counts equal a driver-side recount from the gate
    queries themselves."""
    from orders_kafka_streams_spark.operators.curation import (
        BENCH_DOCS,
        CONTAM_OVERLAP_T,
        MANIFEST_QUOTA,
        QUERIES,
        _contam_per_doc,
    )
    from orders_kafka_streams_spark.operators.dedup import QUERIES as DQ

    rows = {r.source: r for r in QUERIES["q_mixture_manifest"](spark, sf_dir).collect()}
    assert rows
    assert abs(sum(r.share_final for r in rows.values()) - 1.0) < 1e-4
    for r in rows.values():
        assert 0 <= r.n_final <= min(r.n_gated, MANIFEST_QUOTA) <= r.n_raw
        assert 0 <= r.tok_final <= r.tok_raw

    base = _tokenized(spark, sf_dir, "source").filter(
        (F.size("t") > 0) & (F.col("doc_id") >= BENCH_DOCS)
    )
    cls_keep = {
        r.doc_id
        for r in QUERIES["q_quality_classifier"](spark, sf_dir).collect()
        if r.keep
    }
    ddk = {r.doc_id for r in DQ["q_dedup_keep"](spark, sf_dir).collect() if r.keep}
    contam = {
        r.doc_id
        for r in _contam_per_doc(spark, sf_dir).collect()
        if r.overlap >= CONTAM_OVERLAP_T
    }
    survivors = defaultdict(int)
    for r in base.select("doc_id", "source").collect():
        if r.doc_id in cls_keep and r.doc_id in ddk and r.doc_id not in contam:
            survivors[r.source] += 1
    for src, r in rows.items():
        assert r.n_gated == survivors.get(src, 0), src
        assert r.n_final == min(survivors.get(src, 0), MANIFEST_QUOTA), src
