"""q_fuzzy_join invariants the oracle hash can't articulate on its own:
the union-of-block-keys candidate generation has EXACT recall for
single-edit corruptions (the scale claim that justifies never running
all-pairs), and the clean-mode control group resolves perfectly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.dedup import (
    FUZZY_BLOCK,
    _fuzzy_dirty_expr,
    _q_fuzzy_join,
)
from orders_kafka_streams_spark.sources.tables import load_table


def test_single_edit_always_resolves(spark, sf_dir):
    """A one-edit corruption can break the prefix block key or the
    suffix block key, but never both — so every ≤1-edit record must
    resolve (n_resolved == n_records in modes 0-2)."""
    rows = _q_fuzzy_join(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        if r.mode != 3:
            assert r.n_resolved == r.n_records, f"mode {r.mode} dropped records"


def test_clean_mode_is_perfect(spark, sf_dir):
    """Mode 2 leaves names untouched: every record must resolve to its
    own name at distance 0 — the control group that catches a broken
    distance or argmin."""
    rows = {r.mode: r for r in _q_fuzzy_join(spark, sf_dir).collect()}
    clean = rows[2]
    assert clean.n_correct == clean.n_records
    assert clean.avg_dist == 0.0


def test_corrupted_modes_mostly_correct(spark, sf_dir):
    """Deletion/duplication modes resolve to the true name unless the
    edit lands exactly on another dictionary name (possible — 'bolt'
    vs 'bolts' style collisions) — require a high floor rather than
    perfection so the test states the real contract."""
    rows = {r.mode: r for r in _q_fuzzy_join(spark, sf_dir).collect()}
    for mode in (0, 1):
        r = rows[mode]
        assert r.n_correct >= 0.9 * r.n_records, (
            f"mode {mode}: {r.n_correct}/{r.n_records} correct"
        )


def test_two_edit_mode_measures_honest_recall(spark, sf_dir):
    """The mode-3 adversarial class (VERDICT r5 item 7): two edits CAN
    break both block keys, so the blocking scheme must MISS some
    records (n_resolved < n_records — the fixture is genuinely
    adversarial, not vacuously passing) while measured recall stays
    above the gated floor. If recall ever reads 1.0 here the fixture
    has gone benign and the honesty row is lying."""
    rows = {r.mode: r for r in _q_fuzzy_join(spark, sf_dir).collect()}
    adv = rows[3]
    assert adv.n_resolved < adv.n_records, "two-edit fixture never broke a block"
    assert adv.recall < 1.0
    assert adv.recall >= 0.85, f"recall collapsed: {adv.recall}"


def test_block_keys_survive_single_edit(spark, sf_dir):
    """Directly assert the recall argument on the fixture: for every
    corrupted name, the clean name shares the prefix key OR the
    suffix key."""
    part = load_table(spark, sf_dir, "part")
    d = part.select(
        F.col("p_name").alias("clean"),
        F.expr(_fuzzy_dirty_expr("p_name", "p_partkey")).alias("dirty"),
    )
    bad = d.filter(
        (F.substring("clean", 1, FUZZY_BLOCK) != F.substring("dirty", 1, FUZZY_BLOCK))
        & (
            F.substring("clean", -FUZZY_BLOCK, FUZZY_BLOCK)
            != F.substring("dirty", -FUZZY_BLOCK, FUZZY_BLOCK)
        )
    ).count()
    assert bad == 0
