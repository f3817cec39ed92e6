"""Unit tests for the cached-subtree-aware shuffle counter
(plans/budget._count_exchanges) on synthetic plan text — the
registry gate (test_plan_budget.py) exercises it on real plans, but
the NESTED-cache dedupe rules are easiest to pin with hand-built
trees (r5: a memoized relation scanning two other memos inflated 18
executed build shuffles to a recorded 45 before extraction became
recursive)."""

from __future__ import annotations

from orders_kafka_streams_spark.plans.budget import _count_exchanges

EX = "Exchange hashpartitioning(x#{0}, 8)"


def _tree(lines):
    return "\n".join(lines)


def test_plain_plan_counts_every_exchange():
    plan = _tree(
        [
            "AdaptiveSparkPlan",
            "+- " + EX.format(1),
            "   +- HashAggregate",
            "      +- " + EX.format(2),
        ]
    )
    assert _count_exchanges(plan) == 2


def test_repeated_cache_reference_counted_once():
    build = [
        "         +- " + EX.format(7),
        "            +- FileScan parquet",
    ]
    ref = [
        "   +- InMemoryTableScan [a#{0}]",
        "      +- InMemoryRelation [a#{0}], StorageLevel(memory)",
    ]
    plan = _tree(
        [
            "AdaptiveSparkPlan",
            "+- SortMergeJoin",
            *[ln.format(3) for ln in ref],
            *build,
            *[ln.format(9) for ln in ref],  # same build, re-aliased ids
            *build,
        ]
    )
    # one build shuffle, not two: the re-aliased reference dedupes
    assert _count_exchanges(plan) == 1


def test_nested_cache_inside_cached_build_lifted_once():
    inner_build = [
        "                  +- " + EX.format(5),
        "                     +- FileScan parquet",
    ]
    outer_body = [
        "         +- " + EX.format(6),
        "            +- InMemoryTableScan [b#1]",
        "               +- InMemoryRelation [b#1], StorageLevel(memory)",
        *inner_build,
    ]
    outer_ref = [
        "   +- InMemoryTableScan [a#{0}]",
        "      +- InMemoryRelation [a#{0}], StorageLevel(memory)",
    ]
    plan = _tree(
        [
            "AdaptiveSparkPlan",
            "+- Union",
            *[ln.format(2) for ln in outer_ref],
            *outer_body,
            *[ln.format(8) for ln in outer_ref],
            *outer_body,
            *[ln.format(11) for ln in outer_ref],
            *outer_body,
        ]
    )
    # outer build shuffle once + inner build shuffle once = 2,
    # regardless of three outer references each reprinting both
    assert _count_exchanges(plan) == 2


def test_initial_plan_section_trimmed():
    plan = _tree(
        [
            "AdaptiveSparkPlan",
            "+- InMemoryTableScan [a#1]",
            "   +- InMemoryRelation [a#1], StorageLevel(memory)",
            "      +- == Final Plan ==",
            "         +- " + EX.format(4),
            "      +- == Initial Plan ==",
            "         +- " + EX.format(4),
        ]
    )
    # the materialized cache prints final+initial; only final counts
    assert _count_exchanges(plan) == 1
