"""q_apply_packing + q_ivf_balance invariants (r9) — the seams the
driver hash can't localize."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from orders_kafka_streams_spark.operators.curation import PACK_BUDGET, QUERIES as CQ
from orders_kafka_streams_spark.operators.similarity import (
    K_CENTROIDS,
    QUERIES as SQ,
)


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    return CQ["q_apply_packing"](spark, sf_dir).persist()


def test_every_closed_bin_reaches_budget(packed):
    """Cumsum packing closes a bin only once it crosses the budget, so
    every bin except the LAST of each source holds >= PACK_BUDGET raw
    tokens (the last may be a remainder)."""
    last = packed.groupBy("source").agg(F.max("bin").alias("last_bin"))
    closed = packed.join(last, "source").filter(F.col("bin") != F.col("last_bin"))
    assert closed.filter(F.col("raw_tokens") < PACK_BUDGET).count() == 0


def test_seq_text_token_count_matches(packed):
    """The materialized sequence holds exactly seq_tokens whitespace
    tokens = min(raw_tokens, PACK_BUDGET) — the truncation boundary is
    where the plan says it is."""
    n = F.size(F.split(F.col("seq_text"), " "))
    assert packed.filter(n != F.col("seq_tokens")).count() == 0
    assert packed.filter(
        F.col("seq_tokens") != F.least(F.col("raw_tokens"), F.lit(PACK_BUDGET))
    ).count() == 0


def test_packing_partitions_the_corpus(spark, sf_dir, packed):
    """Doc/token totals across bins reconcile with the tokenized
    corpus: packing moves every token exactly once."""
    from orders_kafka_streams_spark.operators.text import _tokenized

    base = _tokenized(spark, sf_dir, "source").filter(F.size("t") > 0)
    want = base.agg(
        F.count(F.lit(1)).alias("docs"), F.sum(F.size("t")).alias("toks")
    ).collect()[0]
    got = packed.agg(F.sum("n_docs").alias("docs"), F.sum("raw_tokens").alias("toks")).collect()[0]
    assert (got["docs"], got["toks"]) == (want["docs"], want["toks"])


def test_ivf_balance_reconciles(spark, sf_dir):
    """Occupancy sums to the corpus, list count is bounded by the
    centroid budget, and shares sum to ~1."""
    from orders_kafka_streams_spark.sources.tables import load_table

    bal = SQ["q_ivf_balance"](spark, sf_dir).persist()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    agg = bal.agg(
        F.count(F.lit(1)).alias("lists"),
        F.sum("list_size").alias("vecs"),
        F.round(F.sum("share"), 2).alias("share_sum"),
    ).collect()[0]
    assert agg["vecs"] == n_vecs
    assert 0 < agg["lists"] <= K_CENTROIDS
    assert abs(agg["share_sum"] - 1.0) < 0.05


def test_decontamination_closure(spark, sf_dir):
    """q_apply_decontamination closure: after the surgery, NO corpus
    doc shares an EXSUB_L-token window with the benchmark suite — the
    leak is gone, not just reported."""
    from orders_kafka_streams_spark.operators.curation import (
        BENCH_DOCS,
        QUERIES as CUQ,
    )
    from orders_kafka_streams_spark.operators.dedup import exsub_pos_of
    from orders_kafka_streams_spark.sources.tables import load_table

    cleaned = CUQ["q_apply_decontamination"](spark, sf_dir)
    # the operator must actually fire on this corpus (benchmark docs
    # are drawn from the same generator, so leaks exist by design)
    assert cleaned.filter(F.col("removed_tokens") > 0).count() > 0
    bench = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < BENCH_DOCS
    )
    bench_w = exsub_pos_of(bench.select("doc_id", "text")).select("g").distinct()
    clean_w = exsub_pos_of(
        cleaned.select("doc_id", F.col("clean_text").alias("text"))
    ).select("g")
    assert clean_w.join(bench_w, "g").count() == 0
