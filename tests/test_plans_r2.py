"""Plan-shape assertions for the round-2 additions: SCD2's exchange
budget, the map-only privacy/z-order operators, and the classifier's
scan-stage confinement."""

from __future__ import annotations

import re

from orders_kafka_streams_spark.operators import curation, privacy, warehouse


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(plan: str) -> int:
    # AQE wraps plans; count distinct Exchange operators, not reuses
    return len(re.findall(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))


def test_scd2_single_user_exchange(spark, sf_dir):
    """Both window passes and the island agg share the user_id hash
    partitioning — exactly one shuffle in the whole SCD build."""
    plan = plan_of(warehouse._q_scd2(spark, sf_dir))
    assert _n_exchanges(plan) == 1, plan


def test_pseudonymize_is_map_only(spark, sf_dir):
    plan = plan_of(privacy._q_pseudonymize(spark, sf_dir))
    assert "Exchange" not in plan, plan
    # token + mask stay inside whole-stage codegen ("*(n)" stage prefix)
    assert "*(1) Project" in plan


def test_zorder_layout_single_small_agg_exchange(spark, sf_dir):
    """Z-key arithmetic is map-side; the only shuffle carries one row
    per (partition, file_id) partial — never a global sort."""
    plan = plan_of(warehouse._q_zorder_layout(spark, sf_dir))
    assert _n_exchanges(plan) == 1, plan
    assert "rangepartitioning" not in plan and "SinglePartition" not in plan, plan


def test_cusum_two_pass_no_per_type_task(spark, sf_dir):
    """r7 contract (replaces the r2 one-exchange pin): the prefix sum
    and running min run as grouped two-pass forms — range-partitioned
    across tasks, with every window partitioned by the physical range
    partition id, never a per-type partition that would put one type's
    whole event relation (0.8·N under dominant-type skew) in one
    task."""
    from orders_kafka_streams_spark.operators import timeseries

    plan = plan_of(timeseries._q_cusum(spark, sf_dir))
    assert "rangepartitioning" in plan, plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "_pid" in line, line


def test_psi_shuffles_carry_bins_not_rows(spark, sf_dir):
    """After the (type, bin) cell aggregation every relation is ≤
    types×bins rows; the scan-side aggregate must be partial."""
    from orders_kafka_streams_spark.operators import stats

    plan = plan_of(stats._q_psi_drift(spark, sf_dir))
    assert "partial_count" in plan or "partial" in plan.lower(), plan
    assert "SortMergeJoin" not in plan, plan  # tiny sides broadcast


def test_classifier_no_shuffle_above_token_cache(spark, sf_dir):
    """Scoring is a projection over the cached token relation — the
    only exchange permitted is the cache's own build repartition."""
    plan = plan_of(curation._q_quality_classifier(spark, sf_dir))
    assert _n_exchanges(plan) <= 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
