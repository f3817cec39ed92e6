"""Size-dispatched full-depth rank (VERDICT r9 item 1): the window
form and the grouped two-pass form must be bit-identical on the same
scored relation, and the dispatch must pick the window form only under
the candidate threshold (falling back scale-safe when no hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.similarity import (
    RANK_WINDOW_MAX_CANDIDATES,
    _corpus_rows_hint,
    _per_query_rank,
)


def _scored(spark):
    # ties on score within a query + negative scores + a singleton
    # query — the corners where rank orders could diverge
    rows = [
        (1, 10, 0.9),
        (1, 11, 0.9),
        (1, 12, -0.5),
        (1, 13, 0.91),
        (2, 10, 0.0),
        (2, 99, 0.0),
        (3, 7, 1.0),
    ]
    return spark.createDataFrame(rows, "query_id long, neighbor_id long, cos double")


def test_forms_bit_identical(spark, sf_dir):
    scored = _scored(spark)
    win = _per_query_rank(spark, sf_dir, "rdwin", scored, "cos", "rk", n_hint=7)
    two = _per_query_rank(spark, sf_dir, "rdtwo", scored, "cos", "rk", n_hint=None)
    a = sorted(map(tuple, win.collect()))
    b = sorted(map(tuple, two.collect()))
    assert a == b
    # spot-pin the expected ranks: desc score, neighbor_id tiebreak
    assert a == [
        (1, 10, 2),
        (1, 11, 3),
        (1, 12, 4),
        (1, 13, 1),
        (2, 10, 1),
        (2, 99, 2),
        (3, 7, 1),
    ]


def test_dispatch_picks_window_under_threshold(spark, sf_dir):
    scored = _scored(spark)
    win = _per_query_rank(spark, sf_dir, "rdw2", scored, "cos", "rk", n_hint=7)
    assert "Window" in win._jdf.queryExecution().executedPlan().toString()


def test_dispatch_picks_two_pass_over_threshold_and_without_hint(spark, sf_dir):
    scored = _scored(spark)
    for hint in (RANK_WINDOW_MAX_CANDIDATES + 1, None):
        df = _per_query_rank(spark, sf_dir, f"rdt_{hint}", scored, "cos", "rk", n_hint=hint)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowExec" not in plan.replace("WindowGroupLimit", ""), plan


def test_corpus_rows_hint_reads_footer(sf_dir):
    n = _corpus_rows_hint(sf_dir, "embeddings")
    assert isinstance(n, int) and n > 0
    assert _corpus_rows_hint(sf_dir, "no_such_table") is None
