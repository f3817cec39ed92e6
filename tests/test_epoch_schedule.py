"""Multi-epoch schedule (operators/sampling.py q_epoch_schedule):
per-epoch bijection, distinct per-epoch orders, contiguous epoch
blocks, and exact repetition values."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.sampling import N_EPOCHS, QUERIES


def _df(spark, sf_dir):
    return QUERIES["q_epoch_schedule"](spark, sf_dir).cache()


def test_per_epoch_bijection_and_blocks(spark, sf_dir):
    df = _df(spark, sf_dir)
    n = df.select("doc_id").distinct().count()
    assert df.count() == n * N_EPOCHS
    for e in range(1, N_EPOCHS + 1):
        ep = df.filter(F.col("epoch") == e)
        # epoch_pos is a bijection onto 1..n
        assert ep.select("epoch_pos").distinct().count() == n
        lo, hi = ep.agg(F.min("epoch_pos"), F.max("epoch_pos")).first()
        assert (lo, hi) == (1, n)
        # epochs are contiguous global blocks
        glo, ghi = ep.agg(F.min("global_pos"), F.max("global_pos")).first()
        assert (glo, ghi) == ((e - 1) * n + 1, e * n)


def test_epochs_have_distinct_orders(spark, sf_dir):
    """Re-shuffling per epoch is the operator's point: the within-epoch
    permutations must differ pairwise (identical orders would
    re-correlate batch composition across epochs)."""
    df = _df(spark, sf_dir)
    orders = {
        e: [r.doc_id for r in df.filter(F.col("epoch") == e)
            .orderBy("epoch_pos").collect()]
        for e in range(1, N_EPOCHS + 1)
    }
    for a in range(1, N_EPOCHS + 1):
        for b in range(a + 1, N_EPOCHS + 1):
            assert orders[a] != orders[b]
        assert sorted(orders[a]) == sorted(orders[1])  # same doc set


def test_rep_values_exact(spark, sf_dir):
    df = _df(spark, sf_dir)
    vals = {
        r.epoch: r.rep_value
        for r in df.select("epoch", "rep_value").distinct().collect()
    }
    assert vals == {e: 1.0 / (1 << (e - 1)) for e in range(1, N_EPOCHS + 1)}
