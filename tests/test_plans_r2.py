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


def test_classifier_no_shuffle_above_token_cache(spark, sf_dir):
    """Scoring is a projection over the cached token relation — the
    only exchange permitted is the cache's own build repartition."""
    plan = plan_of(curation._q_quality_classifier(spark, sf_dir))
    assert _n_exchanges(plan) <= 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
