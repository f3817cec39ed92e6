"""q_exact_substrings property tests (VERDICT r7 item 4): planted
exact duplicates of length ≥ EXSUB_L must be found at their TRUE token
boundaries; plants one token shorter must not fire; within-document
repeats count (total occurrences, not distinct docs); and the exact
spans must be consistent with the 3-shingle q_dup_spans machinery
(every token certified by an exact L-window shared across docs is also
covered by shared 3-shingles — the approximation is a superset).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.dedup import (
    EXSUB_L,
    _EXCISE_N,
    exact_substring_spans,
    exsub_pos_of,
    shared_shingles_of,
    shingle_pos_of,
)


def _words(prefix: str, n: int) -> list[str]:
    """n globally-unique filler tokens (no accidental L-grams)."""
    return [f"{prefix}{i}" for i in range(n)]


PASSAGE = _words("dup", EXSUB_L + 9)  # 25 tokens, shared A <-> B
SHORT = _words("shrt", EXSUB_L - 1)  # L-1 tokens: must NOT fire
SELF = _words("self", EXSUB_L)  # exactly L, repeated WITHIN one doc

DOC_A = _words("a", 7) + PASSAGE + _words("az", 11)
DOC_B = _words("b", 13) + PASSAGE + _words("bz", 5)
DOC_C = _words("c", 6) + SHORT + _words("cz", 8)
DOC_D = _words("d", 9) + SHORT + _words("dz", 4)
DOC_E = _words("e", 3) + SELF + _words("em", 5) + SELF + _words("ez", 2)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, " ".join(DOC_A)),
        (2, " ".join(DOC_B)),
        (3, " ".join(DOC_C)),
        (4, " ".join(DOC_D)),
        (5, " ".join(DOC_E)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def spans(spark, planted):
    return {
        (r.doc_id, r.p0, r.span_tokens)
        for r in exact_substring_spans(exsub_pos_of(planted)).collect()
    }


def test_planted_cross_doc_duplicate_found_at_true_boundaries(spans):
    assert (1, 7, len(PASSAGE)) in spans
    assert (2, 13, len(PASSAGE)) in spans


def test_one_token_short_plant_does_not_fire(spans):
    assert not any(d in (3, 4) for d, _, _ in spans)


def test_within_doc_repeat_counts_as_duplicate(spans):
    mine = {(p0, st) for d, p0, st in spans if d == 5}
    assert (3, EXSUB_L) in mine and (3 + EXSUB_L + 5, EXSUB_L) in mine


def test_no_spurious_spans(spans):
    assert len(spans) == 4  # exactly the plants above, nothing else


def test_streaming_gate_batch_split_invariance(spark, planted, spans):
    """The streaming twin's contract: a doc's spans depend only on its
    own positions plus the STATIC shared set, so probing the corpus
    shared set one doc at a time (the finest possible micro-batching)
    reproduces the whole-corpus spans exactly."""
    from orders_kafka_streams_spark.operators.dedup import (
        exsub_shared_of,
    )

    shared = exsub_shared_of(exsub_pos_of(planted)).persist()
    per_doc: set = set()
    for d in (1, 2, 3, 4, 5):
        batch = planted.filter(F.col("doc_id") == d)
        per_doc |= {
            (r.doc_id, r.p0, r.span_tokens)
            for r in exact_substring_spans(
                exsub_pos_of(batch), shared
            ).collect()
        }
    assert per_doc == spans


def test_exact_spans_subset_of_shingle_dup_coverage(spark, planted, spans):
    """Cross-validation against the 3-shingle machinery (VERDICT r7
    item 4): for CROSS-DOC spans, every token inside an exact span is
    covered by a shared 3-shingle position too — the shingle
    approximation never under-covers an exact duplicate (it
    over-covers; that is why the exact tier exists)."""
    pos = shingle_pos_of(planted)
    shared = shared_shingles_of(pos)
    covered: dict[int, set[int]] = {}
    for r in pos.join(shared, "g").select("doc_id", "pos").collect():
        covered.setdefault(r.doc_id, set()).update(
            range(r.pos, r.pos + _EXCISE_N)
        )
    for d, p0, st in spans:
        if d == 5:
            continue  # within-doc repeat: q_dup_spans keys on distinct docs
        toks = set(range(p0, p0 + st))
        assert toks <= covered.get(d, set()), (d, p0, st)
