"""Registry-wide plan-budget gate (VERDICT r3 item 1).

Every registered query's physical plan is analyzed at the oracle
scale (sf0.01) and asserted against the committed table
``tests/plan_budgets.json``:

- exchanges  <= committed budget (a refactor can REDUCE shuffles
  freely; adding one is a conscious, diff-reviewed budget bump via
  ``python tools/gen_plan_budgets.py``);
- CartesianProduct: banned outright (no committed entry allows it —
  the two audit grids that used to plan as cartesians now broadcast
  their 4-row method relation);
- BroadcastNestedLoopJoin: only where the committed entry records it
  (1-row/scalar broadcast cross-joins — the audit-summary pattern);
- Python-eval nodes: only the committed Arrow-kernel queries, and
  only the node kinds recorded for them. BatchEvalPython (row-at-a-
  time Python) is banned everywhere.

All plans are collected by ONE module fixture in sorted-name order —
the same order the generator uses — so session-memoized relations
(shingle cache, LSH index) are built by the same first caller in both
runs and the recorded exchange counts reproduce exactly, even under
``pytest -k``.

Queries from operators.streaming_queries execute the streaming engine
when called (their returned frame is a memory-sink scan), so they are
``gate: streaming`` rows — covered by test_streaming.py and the
driver oracle, not by this static gate.
"""

from __future__ import annotations

import json
import os

import pytest

from orders_kafka_streams_spark.operators import all_queries
from orders_kafka_streams_spark.plans.budget import (
    CONST_KEY_WINDOW_WHITELIST,
    GLOBAL_WINDOW_WHITELIST,
    analyze_plan,
    streaming_query_names,
)

BUDGET_PATH = os.path.join(os.path.dirname(__file__), "plan_budgets.json")
PLAN_SF_DIR = os.environ.get("OKSS_PLAN_SF_DIR", "/root/testdata/sf0.01")

with open(BUDGET_PATH) as _fh:
    BUDGETS: dict[str, dict] = json.load(_fh)

_NAMES = sorted(all_queries())

#: row-at-a-time Python is never acceptable, even in kernel queries
BANNED_PYTHON_NODES = {"BatchEvalPython"}


@pytest.fixture(scope="module")
def observed(spark):
    """Analyze the full registry once, in the generator's order — from
    the generator's COLD cache state: tools/gen_plan_budgets.py runs in
    a fresh session, so if earlier tests in this pytest process already
    built session memos at the SAME sf_dir (OKSS_TEST_SF_DIR=sf0.01),
    the analyzed plans would see materialized/NON-generator-order
    caches and the exchange counts would drift from the committed table
    (observed: 20 spurious failures under that env). Clearing the memo
    + Spark cache reproduces the generator conditions; anything another
    test still references simply re-persists on next access."""
    from orders_kafka_streams_spark.operators.dedup import _PERSIST_MEMO

    for df in list(_PERSIST_MEMO.values()):
        try:
            df.unpersist()
        except Exception:
            pass
    _PERSIST_MEMO.clear()
    spark.catalog.clearCache()

    qs = all_queries()
    streaming = streaming_query_names()
    out: dict[str, dict] = {}
    for name in _NAMES:
        if name in streaming:
            out[name] = {"gate": "streaming"}
            continue
        out[name] = analyze_plan(qs[name](spark, PLAN_SF_DIR))
    return out


def test_every_query_has_a_committed_budget():
    missing = sorted(set(_NAMES) - set(BUDGETS))
    stale = sorted(set(BUDGETS) - set(_NAMES))
    assert not missing, f"new queries without a committed plan budget: {missing}"
    assert not stale, f"budgets for queries no longer registered: {stale}"


@pytest.mark.parametrize("name", _NAMES)
def test_plan_budget(name, observed):
    committed = BUDGETS[name]
    got = observed[name]
    if committed.get("gate") == "streaming":
        assert got.get("gate") == "streaming"
        return
    assert not got["cartesian"], f"{name}: CartesianProduct in plan (banned)"
    if got["bnlj"]:
        assert committed.get("bnlj"), f"{name}: unbudgeted BroadcastNestedLoopJoin"
    banned = set(got["python"]) & BANNED_PYTHON_NODES
    assert not banned, f"{name}: row-at-a-time Python nodes {sorted(banned)}"
    extra_py = set(got["python"]) - set(committed.get("python", []))
    assert not extra_py, f"{name}: unbudgeted Python nodes {sorted(extra_py)}"
    assert got["exchanges"] <= committed["exchanges"], (
        f"{name}: {got['exchanges']} shuffle exchanges > committed budget "
        f"{committed['exchanges']} — if intentional, regenerate via "
        f"tools/gen_plan_budgets.py and review the diff"
    )
    # no-global-window gate (VERDICT r6 item 4): an unpartitioned
    # WindowExec is a single-task sort of its whole input — banned
    # unless the documented whitelist names this query with the bound
    # that makes it safe (K-row post-limit / O(days)/O(bins) cells)
    allowed, _reason = GLOBAL_WINDOW_WHITELIST.get(name, (0, ""))
    gw = got.get("global_windows")
    if gw is not None:
        assert gw <= allowed, (
            f"{name}: {gw} unpartitioned window node(s) > whitelisted "
            f"{allowed} — a single-task global sort at 100x; use "
            f"sampling.global_prefix_sums / global_row_numbers, or add a "
            f"documented GLOBAL_WINDOW_WHITELIST entry with the bound"
        )
    # constant-cardinality-key window gate (VERDICT r8 item 1): a
    # window partitioned only by a probe-set key (query_id) has a
    # CONSTANT partition count, so unless Spark's InferWindowGroupLimit
    # planned the map-side Partial WindowGroupLimit (each scan task
    # keeps top-k per key BEFORE the shuffle), each of its tasks sorts
    # a corpus-sized slice at 100x — the same hazard class as the
    # unpartitioned window, just keyed. Whitelisted only for windows
    # whose input is bounded upstream (shortlist reranks).
    allowed_ck, _ck_reason = CONST_KEY_WINDOW_WHITELIST.get(name, (0, ""))
    ckw = got.get("const_key_windows")
    if ckw is not None:
        assert ckw <= allowed_ck, (
            f"{name}: {ckw} constant-cardinality-key window(s) without "
            f"Partial WindowGroupLimit pushdown > whitelisted {allowed_ck} "
            f"— write the rank filter as row_number().over(w) <= k so "
            f"InferWindowGroupLimit fires, or add a documented "
            f"CONST_KEY_WINDOW_WHITELIST entry with the input bound"
        )


def test_global_window_whitelist_not_stale(observed):
    """Every whitelist entry must still (a) name a registered query and
    (b) be NEEDED — an entry whose query now plans zero global windows
    is stale documentation and must be dropped."""
    stale = sorted(set(GLOBAL_WINDOW_WHITELIST) - set(_NAMES))
    assert not stale, f"whitelist entries for unregistered queries: {stale}"
    unneeded = sorted(
        n
        for n, (allowed, _r) in GLOBAL_WINDOW_WHITELIST.items()
        # None = the py4j string-parser fallback (count unknown) —
        # skip, exactly as the sibling gate does, instead of declaring
        # every entry stale on an API-drift day
        if observed[n].get("global_windows") == 0
    )
    assert not unneeded, f"whitelist entries no longer needed: {unneeded}"


def test_const_key_window_whitelist_not_stale(observed):
    """Same hygiene for the const-key whitelist: entries must name a
    registered query and still be needed. Skipped when the parquet
    footer hint is unavailable (r10 advice): without it every
    size-dispatched rank falls back to the two-pass form, so the
    whitelisted window forms legitimately never appear."""
    from orders_kafka_streams_spark.operators.similarity import _corpus_rows_hint

    import pytest as _pytest

    if _corpus_rows_hint(PLAN_SF_DIR) is None:
        _pytest.skip("footer row hint unavailable — dispatch is two-pass everywhere")
    stale = sorted(set(CONST_KEY_WINDOW_WHITELIST) - set(_NAMES))
    assert not stale, f"whitelist entries for unregistered queries: {stale}"
    unneeded = sorted(
        n
        for n, (allowed, _r) in CONST_KEY_WINDOW_WHITELIST.items()
        if observed[n].get("const_key_windows") == 0
    )
    assert not unneeded, f"whitelist entries no longer needed: {unneeded}"


def test_const_key_window_fact_mechanics(spark):
    """Pin the NEW gate's mechanics directly (r9, VERDICT r8 item 1) —
    not just its effect on the committed registry table:

    - a rank-FILTERED window on a constant-cardinality key plans the
      map-side Partial WindowGroupLimit (two-phase top-k) and is NOT
      flagged;
    - the same window WITHOUT the rank filter (full ranking — no
      pushdown possible) IS flagged as a const-key window;
    - a window keyed by a non-probe column is never counted, flagged
      or not.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = spark.range(0, 1000).select(
        (F.col("id") % 5).alias("query_id"),
        F.col("id").alias("neighbor_id"),
        (F.col("id") * 7 % 13).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    topk = df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    facts = analyze_plan(topk)
    assert facts["wgl_partial"] >= 1, "rank filter must plan Partial WGL"
    assert facts["const_key_windows"] == 0, "two-phase top-k must not be flagged"

    full = df.withColumn("rk", F.row_number().over(w))
    facts_full = analyze_plan(full)
    assert facts_full["const_key_windows"] == 1, (
        "an unfiltered constant-key ranking (no pushdown possible) must be flagged"
    )

    w_other = Window.partitionBy("neighbor_id").orderBy("score")
    other = df.withColumn("rk", F.row_number().over(w_other))
    assert analyze_plan(other)["const_key_windows"] == 0, (
        "data-scaling keys are not constant-cardinality keys"
    )
