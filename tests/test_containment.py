"""Asymmetric containment dedup (operators/dedup.containment_pairs):
planted-fixture semantics plus the prefix-filter exactness claim —
the candidate-pruned form must equal brute-force all-pairs (no false
negatives) on corpora with hot shingles and size asymmetry.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.dedup import (
    CONTAINMENT_T,
    NGRAM_JACCARD_T,
    containment_pairs,
    shingled_of,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, rows, threshold=CONTAINMENT_T):
    sh = shingled_of(_docs_df(spark, rows)).persist()
    try:
        return {
            (r.a, r.b): (r.containment, r.jaccard, r.subset_only)
            for r in containment_pairs(sh, threshold).collect()
        }
    finally:
        sh.unpersist()


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def test_prefix_subset_and_twins(spark):
    """An exact token-prefix excerpt is contained (1.0) but NOT a
    Jaccard twin; exact twins fire in both directions un-flagged; an
    unrelated doc fires nowhere."""
    full = " ".join(WORDS)  # 10 tokens -> 8 distinct shingles
    excerpt = " ".join(WORDS[:6])  # prefix -> 4 shingles, all shared
    rows = [
        (1, full),
        (2, full),  # exact twin of 1
        (3, excerpt),
        (4, "one two three four five six seven"),  # unrelated
    ]
    got = _pairs(spark, rows)
    # excerpt contained in BOTH copies of the full doc
    assert got[(3, 1)][0] == 1.0 and got[(3, 1)][2] is True
    assert got[(3, 2)][0] == 1.0 and got[(3, 2)][2] is True
    assert got[(3, 1)][1] == 0.5  # 4 shared / 8 union
    # twins: containment 1.0 each way, jaccard 1.0, not subset-only
    assert got[(1, 2)] == (1.0, 1.0, False)
    assert got[(2, 1)] == (1.0, 1.0, False)
    # full docs are NOT contained in the excerpt (4/8 = 0.5 < 0.9)
    assert (1, 3) not in got and (2, 3) not in got
    # the unrelated doc appears in no pair
    assert not any(4 in p for p in got)


def test_mid_document_quote_is_contained(spark):
    """Containment is positional-free: a doc quoting a MIDDLE slice of
    another is contained even though it is not a prefix."""
    full = " ".join(WORDS)
    quote = " ".join(WORDS[3:9])  # middle 6 tokens -> 4 shingles
    got = _pairs(spark, [(1, full), (2, quote)])
    assert got[(2, 1)][0] == 1.0 and got[(2, 1)][2] is True
    assert (1, 2) not in got


def test_prefix_filter_matches_bruteforce(spark):
    """No false negatives: the prefix-filtered candidates reproduce
    brute-force all-pairs containment exactly, on a corpus designed to
    stress the filter — one hot shingle in every doc, a long doc
    containing several short ones, and near-threshold overlaps."""
    base = [f"w{i}" for i in range(30)]
    rows = [
        (1, " ".join(base)),                      # the long containee
        (2, " ".join(base[0:7])),                 # contained prefix
        (3, " ".join(base[11:19])),               # contained middle
        (4, " ".join(base[24:30] + ["x1", "x2"])),  # partial tail + noise
        (5, " ".join(["hot common gram"] + base[5:9])),
        (6, " ".join(["hot common gram"] + ["y1", "y2", "y3", "y4"])),
        (7, " ".join(base[0:4] + base[15:18])),   # split overlap
    ]
    for threshold in (0.5, 0.8, 0.9):
        got = set(_pairs(spark, rows, threshold))
        sh = {
            r.doc_id: set(r.sh)
            for r in shingled_of(_docs_df(spark, rows)).collect()
            if r.sz > 0
        }
        want = {
            (a, b)
            for a, b in itertools.permutations(sh, 2)
            if len(sh[a] & sh[b]) >= threshold * len(sh[a])
        }
        assert got == want, f"threshold={threshold}"


def test_registry_query_flags_only_nonjaccard_pairs(spark, sf_dir):
    """q_dedup_containment's subset_only rows are exactly the pairs
    whose jaccard is below the q_dedup_ngram threshold — and every
    injected excerpt (doc_id >= EXCERPT_OFFSET) is fully contained in
    its source doc."""
    from orders_kafka_streams_spark.operators.dedup import (
        EXCERPT_OFFSET,
        QUERIES,
    )

    rows = QUERIES["q_dedup_containment"](spark, sf_dir).collect()
    assert rows, "fixture must produce pairs"
    for r in rows:
        assert r.containment >= CONTAINMENT_T
        assert r.subset_only == (r.jaccard < NGRAM_JACCARD_T)
    by_pair = {(r.a, r.b) for r in rows}
    excerpts = {a for a, _ in by_pair if a >= EXCERPT_OFFSET}
    assert excerpts, "excerpt fixture must inject probes"
    for e in excerpts:
        assert (e, e - EXCERPT_OFFSET) in by_pair


def test_stream_probe_equals_batch_restriction(spark, sf_dir):
    """The streamed ingest-gate pairs equal the batch containment
    sweep restricted to excerpt→base (probe ids carry EXCERPT_OFFSET;
    candidates are pre-existing corpus docs)."""
    from orders_kafka_streams_spark.operators.dedup import EXCERPT_OFFSET, QUERIES
    from orders_kafka_streams_spark.operators.streaming_queries import QUERIES as SQ

    got = {
        (r.a, r.b): (r.containment, r.jaccard, r.subset_only)
        for r in SQ["q_stream_dedup_containment"](spark, sf_dir).collect()
    }
    want = {
        (r.a, r.b): (r.containment, r.jaccard, r.subset_only)
        for r in QUERIES["q_dedup_containment"](spark, sf_dir).collect()
        if r.a >= EXCERPT_OFFSET and r.b < EXCERPT_OFFSET
    }
    assert got == want


def test_stream_probe_batch_split_invariance(spark, tmp_path):
    """containment_probe verdicts assemble identically whether the
    probes arrive in one batch or one per trigger — the base side is
    static and complete, so per-doc verdicts cannot depend on
    batching. Exercised through the real foreachBatch loop."""
    from orders_kafka_streams_spark.operators.dedup import shingled_of

    base_rows = [
        (1, " ".join(f"w{i}" for i in range(20))),
        (2, " ".join(f"u{i}" for i in range(20))),
    ]
    probe_rows = [
        (101, " ".join(f"w{i}" for i in range(10))),  # contained in 1
        (102, " ".join(f"u{i}" for i in range(12))),  # contained in 2
        (103, "z1 z2 z3 z4 z5 z6"),  # matches nothing
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")

    # containment_probe's join shape with a hand-built base index
    # (the memoized corpus seam swapped for the fixture)
    from orders_kafka_streams_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    def probe_against_base(probe_df):
        base_inv = (
            shingled_of(base)
            .filter(F.col("sz") > 0)
            .select(
                F.col("doc_id").alias("b"),
                F.col("sz").alias("szb"),
                F.explode("sh").alias("g"),
            )
        )
        p = shingled_of(probe_df).filter(F.col("sz") > 0)
        pinv = p.select(
            F.col("doc_id").alias("a"), F.col("sz").alias("sza"), F.explode("sh").alias("g")
        )
        counts = pinv.join(base_inv, "g").groupBy("a", "b", "sza", "szb").agg(
            F.count(F.lit(1)).alias("_i")
        )
        return {
            (r.a, r.b)
            for r in counts.filter(
                F.col("_i") >= F.lit(dd.CONTAINMENT_T) * F.col("sza")
            ).collect()
        }

    whole = probe_against_base(
        spark.createDataFrame(probe_rows, "doc_id long, text string")
    )
    split = set()
    for row in probe_rows:
        split |= probe_against_base(
            spark.createDataFrame([row], "doc_id long, text string")
        )
    assert whole == split == {(101, 1), (102, 2)}


def test_containment_keep_rule(spark, sf_dir):
    """Keep/drop artifact: every injected excerpt is dropped (its
    source is strictly larger); exact-twin groups collapse to the
    min-id canonical; a dropped doc's dominator is a real containment
    pair with the size/tie rule; kept docs have no dominator pair."""
    from orders_kafka_streams_spark.operators.dedup import (
        EXCERPT_OFFSET,
        QUERIES,
        _containment_shingled,
    )

    flags = {r.doc_id: r for r in QUERIES["q_containment_keep"](spark, sf_dir).collect()}
    pairs = QUERIES["q_dedup_containment"](spark, sf_dir).collect()
    sizes = {
        r.doc_id: r.sz
        for r in _containment_shingled(spark, sf_dir).filter("sz > 0").collect()
    }

    dominators: dict[int, set[int]] = {}
    for p in pairs:
        if sizes[p.b] > sizes[p.a] or (sizes[p.b] == sizes[p.a] and p.b < p.a):
            dominators.setdefault(p.a, set()).add(p.b)

    for doc_id, r in flags.items():
        if r.keep:
            assert doc_id not in dominators, doc_id
            assert r.dropped_for is None
        else:
            assert r.dropped_for == min(dominators[doc_id]), doc_id

    excerpts = [d for d in flags if d >= EXCERPT_OFFSET]
    assert excerpts and all(not flags[d].keep for d in excerpts)
