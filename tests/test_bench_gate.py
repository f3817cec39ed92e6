"""Unit checks for bench.py's drift-normalized budget gate (pure
functions — no Spark). The gate's contract: flag a query that
regresses RELATIVE to the suite, never flag suite-wide ambient
machine drift, and never let drift normalization excuse more than
DRIFT_CAP.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "okss_bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
)
_argv = sys.argv
sys.argv = ["bench.py"]  # module-level argv peeks must not see pytest args
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)
sys.argv = _argv

BUDGETS = {"a": 1.0, "b": 2.0, "c": 0.5, "d": 4.0, "tiny": 0.05}


def test_drift_is_median_of_budgeted_ratios():
    timings = {"a": 1.2, "b": 2.4, "c": 0.6, "d": 4.8}
    assert abs(bench._drift(timings, BUDGETS) - 1.2) < 1e-9


def test_drift_never_tightens_below_one():
    timings = {"a": 0.5, "b": 1.0, "c": 0.25}
    assert bench._drift(timings, BUDGETS) == 1.0


def test_drift_capped():
    timings = {"a": 10.0, "b": 20.0, "c": 5.0}
    assert bench._drift(timings, BUDGETS) == bench.DRIFT_CAP


def test_drift_excludes_floor_size_budgets():
    # 'tiny' (budget 0.05 < FLOOR) blowing up 20x must not drag the
    # median — JIT hiccups on sub-floor queries are noise
    timings = {"a": 1.0, "b": 2.0, "c": 0.5, "tiny": 1.0}
    assert bench._drift(timings, BUDGETS) == 1.0


def test_uniform_slowdown_not_flagged(tmp_path, monkeypatch):
    """Every query 1.6x slower (> BUDGET_FACTOR) but uniformly: that is
    machine drift, and with normalization nothing breaches."""
    import json

    f = tmp_path / "budgets.json"
    f.write_text(json.dumps({"sf0.1": BUDGETS, "sf1": {}}))
    monkeypatch.setattr(bench, "BUDGET_FILE", str(f))
    timings = {n: b * 1.6 for n, b in BUDGETS.items()}
    breaches, drifts = bench._check_budgets(timings, None)
    assert breaches == []
    assert abs(drifts["sf0.1"] - 1.6) < 1e-9


def test_single_query_regression_still_flagged(tmp_path, monkeypatch):
    """One query 4x over budget while the suite holds: the drift stays
    ~1 and the regression breaches."""
    import json

    f = tmp_path / "budgets.json"
    f.write_text(json.dumps({"sf0.1": BUDGETS, "sf1": {}}))
    monkeypatch.setattr(bench, "BUDGET_FILE", str(f))
    timings = {"a": 1.0, "b": 2.0, "c": 0.5, "d": 16.0}
    breaches, _ = bench._check_budgets(timings, None)
    assert [b["q"] for b in breaches] == ["d"]


def test_missing_budget_is_a_breach(tmp_path, monkeypatch):
    import json

    f = tmp_path / "budgets.json"
    f.write_text(json.dumps({"sf0.1": {"a": 1.0}, "sf1": {}}))
    monkeypatch.setattr(bench, "BUDGET_FILE", str(f))
    breaches, _ = bench._check_budgets({"a": 1.0, "new_q": 0.1}, None)
    assert [b["q"] for b in breaches] == ["new_q"]
    assert breaches[0]["budget"] is None


def test_additive_noise_pad_absorbs_small_query_blips(tmp_path, monkeypatch):
    """r6: a 0.34s-budget query breached by 2 ms under an ambient wave
    while every heavy query passed — GC/scheduler noise is ADDITIVE
    (~100-300 ms) and a multiplicative gate mis-models it at small
    budgets. A sub-second query one hiccup over its relative bound
    must pass; the same 0.25s on a heavy query changes nothing."""
    import json

    f = tmp_path / "budgets.json"
    budgets = {"small": 0.34, "big": 4.0, "s1": 1.0, "s2": 2.0, "s3": 0.5}
    f.write_text(json.dumps({"sf0.1": budgets, "sf1": {}}))
    monkeypatch.setattr(bench, "BUDGET_FILE", str(f))
    steady = {"s1": 1.0, "s2": 2.0, "s3": 0.5}  # suite on budget -> drift 1
    # small: at its relative bound plus a 0.2s hiccup -> inside the pad
    breaches, _ = bench._check_budgets(
        dict(steady, small=0.34 * 1.5 + 0.2, big=4.0), None
    )
    assert breaches == []
    # big: the pad must NOT excuse a real relative regression
    breaches, _ = bench._check_budgets(
        dict(steady, small=0.34, big=4.0 * 1.6 + 0.3), None
    )
    assert [b["q"] for b in breaches] == ["big"]


def test_uniform_regression_beyond_cap_hits_suite_guard(tmp_path, monkeypatch):
    """ADVICE r5: a genuine UNIFORM 2.5x regression (framework/session
    config change) sits under BUDGET_FACTOR x DRIFT_CAP = 3x per
    query, so drift normalization alone would exit green. The
    absolute suite guard (not drift-normalized) must flag it."""
    import json

    f = tmp_path / "budgets.json"
    f.write_text(json.dumps({"sf0.1": BUDGETS, "sf1": {}}))
    monkeypatch.setattr(bench, "BUDGET_FILE", str(f))
    timings = {n: b * 2.5 for n, b in BUDGETS.items()}
    breaches, drifts = bench._check_budgets(timings, None)
    assert [b["q"] for b in breaches] == ["__suite__"]
    assert drifts["sf0.1"] == bench.DRIFT_CAP  # per-query gate was capped
    assert breaches[0]["sec"] > bench.SUITE_FACTOR * breaches[0]["budget"]


def test_suite_guard_quiet_within_factor(tmp_path, monkeypatch):
    """Uniform 1.9x (under SUITE_FACTOR): drift normalization handles
    it and the absolute guard stays quiet."""
    import json

    f = tmp_path / "budgets.json"
    f.write_text(json.dumps({"sf0.1": BUDGETS, "sf1": {}}))
    monkeypatch.setattr(bench, "BUDGET_FILE", str(f))
    timings = {n: b * 1.9 for n, b in BUDGETS.items()}
    breaches, _ = bench._check_budgets(timings, None)
    assert breaches == []


def test_absolve_transients_reclassifies_only_passing_remeasures():
    """The storm guard: a breach whose re-measure passes the same gate
    moves to the absolved list; one that still fails stays a breach;
    suite-ceiling and missing-budget entries are never re-measured; a
    raising re-measure leaves the breach standing."""
    import bench

    breaches = [
        {"q": "q_storm", "tier": "sf1", "sec": 8.0, "budget": 3.0, "drift": 1.0},
        {"q": "q_real", "tier": "sf1", "sec": 9.0, "budget": 3.0, "drift": 1.0},
        {"q": "__suite__", "tier": "sf1", "sec": 99.0, "budget": 10.0, "drift": 1.0},
        {"q": "q_nobudget", "tier": "sf1", "sec": 2.0, "budget": None},
        {"q": "q_flaky", "tier": "sf0.1", "sec": 5.0, "budget": 1.0, "drift": 1.0},
    ]
    measured = []

    def remeasure(b):
        measured.append(b["q"])
        if b["q"] == "q_storm":
            return 2.0  # back under 1.5x*3.0 + pad
        if b["q"] == "q_flaky":
            raise RuntimeError("re-measure failed")
        return 8.5  # still over

    absolved = bench._absolve_transients(breaches, remeasure)
    assert [a["q"] for a in absolved] == ["q_storm"]
    assert absolved[0]["remeasured_sec"] == 2.0
    assert {b["q"] for b in breaches} == {"q_real", "__suite__", "q_nobudget", "q_flaky"}
    assert "__suite__" not in measured and "q_nobudget" not in measured


def test_absolve_transients_caps_remeasures():
    import bench

    breaches = [
        {"q": f"q{i}", "tier": "sf1", "sec": 9.0, "budget": 3.0, "drift": 1.0}
        for i in range(8)
    ]
    n = [0]

    def remeasure(b):
        n[0] += 1
        return 9.0  # never passes

    bench._absolve_transients(breaches, remeasure)
    assert n[0] == 5
    assert len(breaches) == 8


def test_headline_growth_rule_enforced():
    """The r9 promotion/demotion rule (VERDICT r8 item 8) is a GATE,
    not just a comment: the timed suite stays under its cap, demoted
    queries never silently rejoin, and every demoted query keeps a
    committed budget in any tier where its behavior genuinely differs
    (the rule's own demotion criterion)."""
    import json

    assert len(bench.HEADLINE) < 150, "HEADLINE at/over cap — demote before adding"
    overlap = set(bench.SMOKE_ONLY) & set(bench.HEADLINE)
    assert not overlap, f"demoted queries re-added to HEADLINE: {sorted(overlap)}"
    with open(os.path.join(os.path.dirname(bench.__file__) or ".", "bench_budgets.json")) as fh:
        budgets = json.load(fh)
    # demoted queries must not keep stale sf0.1 budgets (they are no
    # longer timed there), and the scale-tier members keep theirs
    stale = [q for q in bench.SMOKE_ONLY if q in budgets["sf0.1"]]
    assert not stale, f"sf0.1 budgets for demoted queries: {stale}"
    for q in ("q_item_cooccurrence_capped",):
        assert q in budgets["sf1"] and q in budgets["sf1skew"]
    assert "q_percentile_interp" in budgets["sf1skew"]
