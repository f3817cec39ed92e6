"""Registry contract tests (VERDICT r1 item 2): the driver's
CORRECTNESS report caps at ~50 entries in registry order, so the merged
registry must sample EVERY operator family in any 50-entry prefix, and
import failures must never silently shrink it."""

from __future__ import annotations

from importlib import import_module

from orders_kafka_streams_spark.operators import (
    _MODULES,
    SKIPPED_MODULES,
    all_oracles,
    all_queries,
)


def test_first_50_queries_sample_every_family():
    qs = list(all_queries())
    prefix = set(qs[:50])
    missing = []
    for m in _MODULES:
        mod = import_module(f"orders_kafka_streams_spark.operators.{m}")
        names = set(getattr(mod, "QUERIES", {}))
        if names and not (names & prefix):
            missing.append(m)
    assert not missing, f"families absent from the driver-checked prefix: {missing}"


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
