"""Proximity query (q_proximity_search): planted-position boundary
semantics over a synthetic corpus driven through the same posting-join
shape, plus registry-level invariants at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.text import (
    PROX_TERMS,
    PROX_WINDOW,
    QUERIES,
)


def _run_on(spark, rows):
    """Drive the registry query's exact join shape over a synthetic
    (doc_id, source, text) relation by re-binding the tokenized
    source — same expressions, fixture-controlled positions."""
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w1, w2 = PROX_TERMS
    ex = (
        df.select(
            "doc_id",
            "source",
            F.posexplode(F.filter(F.split(F.lower("text"), " "), lambda x: x != "")).alias(
                "pos", "w"
            ),
        )
        .filter(F.col("w").isin(w1, w2))
    )
    p1 = ex.filter(F.col("w") == w1).select("doc_id", "source", F.col("pos").alias("pa"))
    p2 = ex.filter(F.col("w") == w2).select("doc_id", F.col("pos").alias("pb"))
    d = F.abs(F.col("pa") - F.col("pb"))
    return {
        r.doc_id: (r.n_pairs, r.min_dist)
        for r in p1.join(p2, "doc_id")
        .filter(d <= PROX_WINDOW)
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.min(d).alias("min_dist"))
        .collect()
    }


def _text(positions: dict[int, str], length: int) -> str:
    return " ".join(positions.get(i, f"f{i}") for i in range(length))


def test_window_boundary_and_order(spark):
    w1, w2 = PROX_TERMS
    rows = [
        # distance exactly PROX_WINDOW — included
        (1, "s", _text({0: w1, PROX_WINDOW: w2}, 10)),
        # distance PROX_WINDOW + 1 — excluded
        (2, "s", _text({0: w1, PROX_WINDOW + 1: w2}, 10)),
        # reversed order still matches (|pa - pb|)
        (3, "s", _text({0: w2, 3: w1}, 10)),
        # adjacent — min_dist 1
        (4, "s", _text({4: w1, 5: w2}, 10)),
        # only one term — no pair
        (5, "s", _text({2: w1}, 10)),
    ]
    got = _run_on(spark, rows)
    assert got[1] == (1, PROX_WINDOW)
    assert 2 not in got
    assert got[3] == (1, 3)
    assert got[4] == (1, 1)
    assert 5 not in got


def test_multiple_occurrences_count_all_pairs(spark):
    """Two w1s and two w2s inside the window -> 4 pairs, min over all."""
    w1, w2 = PROX_TERMS
    rows = [(1, "s", _text({0: w1, 2: w2, 3: w1, 4: w2}, 8))]
    got = _run_on(spark, rows)
    # pairs (0,2) d=2, (0,4) d=4, (3,2) d=1, (3,4) d=1 -> 4 pairs, min 1
    assert got[1] == (4, 1)


def test_registry_rows_respect_window(spark, sf_dir):
    rows = QUERIES["q_proximity_search"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.min_dist <= PROX_WINDOW
        assert r.n_pairs >= 1
