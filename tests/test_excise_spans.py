"""Duplicate-span excision (q_excise_spans): planted-passage fixtures
pin the exact span geometry — merged boundaries, token counts, the
gap ≤ N merge rule (the r5 fix — the pre-fix gap ≤ N−1 form split
contiguous runs), and the min-length cut — independently of the
DuckDB oracle (which checks the corpus-level results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.dedup import EXCISE_MIN_TOKENS


def _spans(spark, docs, min_len=EXCISE_MIN_TOKENS):
    """Span geometry {(doc_id, span_start_pos, span_tokens)} via the
    PRODUCTION seams (r5 review: a hand-copied pipeline here would
    keep passing after a production rule change and stop pinning
    behavior)."""
    from orders_kafka_streams_spark.operators.dedup import (
        excise_span_rows,
        shared_shingles_of,
        shingle_pos_of,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    pos = shingle_pos_of(df)
    return {
        (r["doc_id"], r["p0"], r["span_tokens"])
        for r in excise_span_rows(pos, shared_shingles_of(pos), min_tokens=min_len).collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_shared_passage_boundaries(spark):
    """A 20-token passage shared by two docs at different offsets is
    excised from both, with exact token boundaries."""
    passage = _words("dup", 20)
    doc_a = _words("ua", 5) + " " + passage + " " + _words("za", 7)
    doc_b = passage + " " + _words("zb", 9)
    got = _spans(spark, [(1, doc_a), (2, doc_b)])
    # doc 1: shingle positions 5..22 duplicated → tokens [5, 24] = 20
    # doc 2: positions 0..17 → tokens [0, 19] = 20
    assert got == {(1, 5, 20), (2, 0, 20)}


def test_short_shared_runs_are_dropped(spark):
    """A shared trigram (3 tokens < EXCISE_MIN_TOKENS) never yields a span."""
    tri = "shared tri gram"
    got = _spans(spark, [(1, _words("a", 6) + " " + tri), (2, tri + " " + _words("b", 6))])
    assert got == set()


def test_overlapping_shared_regions_merge(spark):
    """Shared regions from DIFFERENT partner docs that overlap (or abut
    within the shingle window) in one doc merge into a single span."""
    a = [f"a{i}" for i in range(17)]
    doc_a = " ".join(a)                                   # a0..a16
    doc_b = " ".join(a[:9]) + " " + _words("tb", 6)       # shares a0..a8
    doc_c = _words("hc", 6) + " " + " ".join(a[8:])       # shares a8..a16
    got = _spans(spark, [(1, doc_a), (2, doc_b), (3, doc_c)], min_len=5)
    # doc 1: dup positions 0..6 (from B) and 8..14 (from C): gap 2 ≤
    # N−1 → ONE merged span over tokens [0, 16] = 17 tokens (token a8
    # belongs to both shared regions, so the merge is token-exact)
    assert {s for s in got if s[0] == 1} == {(1, 0, 17)}
    # partners keep their own 9-token spans at their own offsets
    assert {s for s in got if s[0] == 2} == {(2, 0, 9)}
    assert {s for s in got if s[0] == 3} == {(3, 6, 9)}


def test_disjoint_shared_regions_stay_separate(spark):
    """Passages separated by a unique token leave that token uncovered
    (position gap N+1 = 4 here) and must NOT merge."""
    p1, p2 = _words("x", 9), _words("y", 9)
    doc_a = p1 + " only1 " + p2
    doc_b = p1 + " " + _words("other", 8) + " " + p2
    got = _spans(spark, [(1, doc_a), (2, doc_b)], min_len=5)
    assert sorted(s for s in got if s[0] == 1) == [(1, 0, 9), (1, 10, 9)]
    assert sorted(s for s in got if s[0] == 2) == [(2, 0, 9), (2, 17, 9)]


def test_abutting_regions_merge(spark):
    """Two duplicated passages that ABUT in token space (position gap
    exactly N — no uncovered token between them) merge into one
    maximal span; the r5 pre-fix rule split them, and each half could
    then fall under the min-length cut despite 20 contiguous
    duplicated tokens."""
    a = [f"a{i}" for i in range(20)]
    doc_a = " ".join(a)                                  # a0..a19
    doc_b = " ".join(a[:10]) + " " + _words("tb", 6)     # shares a0..a9
    doc_c = _words("hc", 6) + " " + " ".join(a[10:])     # shares a10..a19
    got = _spans(spark, [(1, doc_a), (2, doc_b), (3, doc_c)], min_len=12)
    # doc 1: dup positions 0..7 (from B) and 10..17 (from C): gap 3 =
    # N → one merged span of 20 tokens; with the min cut at 12, the
    # split form would report doc 1 span-free (both halves = 10)
    assert {s for s in got if s[0] == 1} == {(1, 0, 20)}
    # the 10-token halves in the partner docs stay below the cut
    assert {s for s in got if s[0] != 1} == set()


def test_registry_and_oracle_registered():
    from orders_kafka_streams_spark.operators.dedup import ORACLE, QUERIES

    assert "q_excise_spans" in QUERIES and "q_excise_spans" in ORACLE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_probe_batch_split_invariant(spark, sf_dir):
    """spans(half A) ∪ spans(half B) == spans(whole delta): a doc's
    spans depend only on its own positions + the static shared set."""
    from orders_kafka_streams_spark.operators import dedup
    from orders_kafka_streams_spark.sources.tables import load_table

    delta = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % dedup.DELTA_MOD == dedup.DELTA_MOD - 1)
        .select("doc_id", "text")
    )
    shared = dedup._excise_shared(spark, sf_dir)
    whole = dedup.excise_spans_of(dedup.shingle_pos_of(delta), shared)
    lo = delta.filter(F.col("doc_id") % (2 * dedup.DELTA_MOD) == dedup.DELTA_MOD - 1)
    hi = delta.filter(F.col("doc_id") % (2 * dedup.DELTA_MOD) != dedup.DELTA_MOD - 1)
    a = dedup.excise_spans_of(dedup.shingle_pos_of(lo), shared)
    b = dedup.excise_spans_of(dedup.shingle_pos_of(hi), shared)
    assert _rows(a.unionByName(b)) == _rows(whole)


def test_stream_twin_matches_delta_scoped_batch(spark, sf_dir):
    """The assembled streaming output equals the batch q_excise_spans
    restricted to the delta docs it ingested."""
    from orders_kafka_streams_spark.operators import dedup, streaming_queries

    got = streaming_queries.QUERIES["q_stream_excise_spans"](spark, sf_dir)
    want = dedup.QUERIES["q_excise_spans"](spark, sf_dir).filter(
        F.col("doc_id") % dedup.DELTA_MOD == dedup.DELTA_MOD - 1
    )
    assert _rows(got) == _rows(want)
