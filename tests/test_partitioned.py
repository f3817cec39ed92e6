"""Partitioned-layout pruning evidence (VERDICT r3 item 6): the
date-partitioned events layout must actually PRUNE — statically via
PartitionFilters for a predicate on the partition column, dynamically
via a DPP subquery when joined to a filtered calendar dim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.warehouse import (
    _q_partition_dpp,
    _q_partition_prune,
)
from orders_kafka_streams_spark.sources.partitioned import (
    PARTITION_COL,
    partitioned_events,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_layout_roundtrip_preserves_rows(spark, sf_dir):
    from orders_kafka_streams_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    part = partitioned_events(spark, sf_dir)
    assert part.count() == ev.count()
    assert PARTITION_COL in part.columns
    # the partition column really is the day of ts
    bad = part.filter(F.to_date("ts") != F.col(PARTITION_COL)).count()
    assert bad == 0


def test_static_partition_filter_reaches_listing(spark, sf_dir):
    df = _q_partition_prune(spark, sf_dir)
    plan = plan_of(df)
    # the Monday predicate must appear as a PartitionFilter on the
    # scan (listing-time pruning), NOT as a post-scan Filter only
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("dayofweek" in ln and PARTITION_COL in ln for ln in pf), pf
    # and it selects exactly the 5 January-2024 Mondays
    days = df.select(PARTITION_COL).distinct().count()
    assert days == 5


def test_dpp_subquery_on_fact_scan(spark, sf_dir):
    df = _q_partition_dpp(spark, sf_dir)
    plan = plan_of(df)
    assert "dynamicpruning" in plan, plan[:2000]
    # correctness of the join itself: 5 Mondays' worth of events
    total = df.agg(F.sum("n")).collect()[0][0]
    prune_total = (
        _q_partition_prune(spark, sf_dir).agg(F.sum("n")).collect()[0][0]
    )
    assert total == prune_total
