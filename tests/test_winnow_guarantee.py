"""Winnowing's published guarantee (Schleimer et al. §2): any shared
token run of length >= W + k - 1 produces at least one shared
fingerprint between the two documents. Crafted docs — no oracle needed;
this pins the algorithm property the summary-stat parity can't see."""

from __future__ import annotations

import pytest

from orders_kafka_streams_spark.operators.text import WINNOW_W, winnow_fingerprints

K = 3  # shingle width used by functions/textfns.shingles/shingle_seq
RUN = WINNOW_W + K - 1  # guarantee threshold: 6 tokens


@pytest.fixture(scope="module")
def fp_of(spark):
    def build(texts: dict[int, str]) -> dict[int, set[int]]:
        df = spark.createDataFrame(
            [(i, t) for i, t in texts.items()], "doc_id long, text string"
        )
        rows = winnow_fingerprints(df).collect()
        return {r.doc_id: set(r.fp) for r in rows}

    return build


def test_shared_run_shares_fingerprint(fp_of):
    shared = "alpha bravo charlie delta echo foxtrot"  # exactly RUN tokens
    assert len(shared.split()) == RUN
    fps = fp_of(
        {
            1: f"unrelated prefix tokens here {shared} and a suffix tail",
            2: f"{shared} completely different continuation words now",
        }
    )
    assert fps[1] & fps[2], "docs sharing a 6-token run must share a fingerprint"


def test_disjoint_vocab_shares_nothing(fp_of):
    fps = fp_of(
        {
            1: "one two three four five six seven eight nine ten",
            2: "uno dos tres cuatro cinco seis siete ocho nueve diez",
        }
    )
    assert not (fps[1] & fps[2])


def test_short_doc_has_no_fingerprints(fp_of):
    # fewer than K tokens -> no shingles -> no windows -> empty set
    fps = fp_of({1: "too short", 2: "alpha bravo charlie delta echo foxtrot golf"})
    assert fps[1] == set()
    assert len(fps[2]) >= 1
