"""Registry contract tests (VERDICT r1 item 2 + r2 item 2): the
driver's CORRECTNESS report caps at ~50 entries in registry order.
Round 1-2 interleaved families so any prefix sampled every family;
round 3 ROTATES — queries never driver-checked sort first so the union
of per-round samples converges on full coverage. The prefix must now
sample every family that still HAS never-checked queries (families
fully verified in earlier rounds may sit behind them), and import
failures must never silently shrink the registry."""

from __future__ import annotations

from importlib import import_module

from orders_kafka_streams_spark.operators import (
    _DRIVER_CHECKED,
    _MODULES,
    SKIPPED_MODULES,
    all_oracles,
    all_queries,
)


def test_first_50_queries_favor_unchecked_and_sample_families():
    qs = list(all_queries())
    prefix = set(qs[:50])
    # rotation: the prefix is never-checked queries plus the pinned
    # rechecks (previously-verified queries rewritten this round)
    from orders_kafka_streams_spark.operators import _RECHECK_FIRST

    # r5: _DRIVER_CHECKED is derived from the committed CORRECTNESS
    # artifacts and coverage has converged — there may be FEWER
    # never-checked queries than prefix capacity, in which case every
    # one of them must be in the prefix (not a fixed count).
    unchecked_total = [n for n in qs if n not in _DRIVER_CHECKED]
    fresh = [n for n in prefix if n not in _DRIVER_CHECKED]
    expect = min(len(unchecked_total), 50 - len(_RECHECK_FIRST))
    assert len(fresh) >= expect, (
        f"only {len(fresh)} never-checked queries in prefix (expected ≥ {expect})"
    )
    assert set(_RECHECK_FIRST) <= prefix
    missing = []
    for m in _MODULES:
        mod = import_module(f"orders_kafka_streams_spark.operators.{m}")
        names = set(getattr(mod, "QUERIES", {}))
        unchecked = names - _DRIVER_CHECKED
        if unchecked and not (unchecked & prefix):
            missing.append(m)
    assert not missing, f"families with unchecked queries absent from prefix: {missing}"


def test_no_modules_silently_skipped():
    all_queries()  # force the import sweep
    assert SKIPPED_MODULES == [], SKIPPED_MODULES


def test_oracles_subset_of_queries_and_ordered_alike():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    # every oracle-less query is a documented sketch/rows-only case
    rows_only = set(qs) - set(os_)
    assert rows_only <= {"q_approx_distinct", "q_approx_percentile"}, rows_only
    # oracle iteration order follows the query registry order
    qorder = [q for q in qs if q in os_]
    assert list(os_) == qorder
