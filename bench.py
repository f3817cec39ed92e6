#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (VERDICT r3 item 3 — the round driver captures only
the LAST 2000 chars of stdout and json-parses a line from it, so the
63-query full dict overflowed the capture and BENCH_r03 recorded
``parsed: null``):

- the FULL per-query payload (steady + cold + sf1 + budgets) is
  written to ``BENCH_FULL.json`` next to this script AND printed as
  the first stdout line (for humans / whole-stdout parsers);
- the LAST stdout line is a COMPACT summary that always fits the
  tail capture: ``{"metric": "headline_suite_wall", "value": <steady
  total sec>, "unit": "sec", "value_cold": ..., "flagship_rows_per_
  sec": ..., "r1_subset_sec": ..., "sf1_wall": ..., "sf1skew_wall":
  ..., "n_queries": ...,
  "budget_breaches": [...], "queries_file": "BENCH_FULL.json",
  "sf": <sf>}``.

``value`` stays the headline (steady-state, the long-running-engine
number) but the COLD total is first-class alongside it so round-over-
round comparisons can't be confounded by cache warm-up masking a
regression (VERDICT r1 item 8).

Per-query budgets (VERDICT r3 item 7): ``bench_budgets.json`` commits
a steady-time budget per query (sf0.1 + the sf1 heavy set). Any query
slower than BUDGET_FACTOR x budget is a BREACH: listed on stderr,
named in the summary line, and the process exits 3 — aggregate wall
can no longer hide a single-query regression. Regenerate budgets
after an intentional perf change with ``python bench.py
--write-budgets`` (reviewing the diff is the point).

The headline set spans the engine's surface: the flagship reference
pipeline, scan-heavy and join-heavy TPC-H shapes, window functions,
sessionization, as-of join, the dedup/text/similarity extension
operators, and one through-the-streaming-engine run. Each query
executes to a noop sink (full plan, no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

#: HEADLINE growth-control rule (r9, VERDICT r8 item 8). The timed
#: sf0.1 suite exists to catch regressions ABOVE the per-query noise
#: floor; every query added to it dilutes that (128 queries ≈ 0.4 s/q
#: steady, where a 100 ms JIT hiccup is already 25%). Membership
#: therefore follows a promotion/demotion rule instead of append-only
#: growth:
#:
#: - CAP: HEADLINE stays under 150 entries. At the cap, adding a query
#:   requires demoting one first.
#: - REPRESENTATION: each operator family keeps its 2-3 most
#:   plan-representative members in HEADLINE (the members whose
#:   physical plans cover the family's distinct scale shapes); further
#:   variants of an already-represented plan shape are SMOKE_ONLY.
#: - DEMOTION target: a query is demoted when its plan shape is a
#:   strict twin of a retained member AND any tier where its behavior
#:   genuinely differs (skew cap, adversarial corpus) keeps a
#:   committed budget for it.
#: - SMOKE_ONLY queries keep full coverage elsewhere: the correctness
#:   oracle runs every registered query at sf0.01, and
#:   tests/scale_smoke.py drives the ENTIRE registry at sf0.1 (and
#:   .benchdata/sf1) under a per-query latency budget — the coarse
#:   regression gate for everything outside HEADLINE.
#:
#: Applied once at r9 (the rule's first exercise): demoted
#: q_item_cooccurrence_capped (plan twin of q_item_cooccurrence; both
#: keep sf1 + sf1skew budgets, where the cap is actually measurable),
#: q_percentile_interp (4th member of the exact-quantile family —
#: q_percentile_distributed + its streaming twin +
#: q_char_budget_quantiles stay; keeps its sf1skew budget), and
#: q_logrank (same O(days)-cell running-stats plan as the retained
#: q_msprt / q_survival_km family reps).
SMOKE_ONLY = [
    "q_item_cooccurrence_capped",
    "q_percentile_interp",
    "q_logrank",
]

HEADLINE = [
    "q_pipeline",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_join_broadcast",
    "q_window_rank",
    "q_win_session",
    "q_asof_join",
    "q_text_quality",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_knn_brute",
    "q_tpch_q18",
    "q_range_join",
    "q_clean_pipeline",
    "q_knn_ivf",
    "q_funnel",
    "q_tpch_q9",
    "q_tpch_q13",
    "q_tpch_q17",
    "q_tpch_q21",
    "q_stream_win_tumble",
    "q_winnow_match",
    "q_dedup_consensus",
    "q_sessionize",
    # round-2 operators
    "q_dedup_embedding",
    "q_knn_pq",
    "q_text_langid",
    "q_contamination",
    # late round-2 operators
    "q_kmeans",
    "q_unigram_logprob",
    "q_dup_spans",
    # continuation-session operators
    "q_scd2",
    "q_asof_nearest",
    "q_quality_classifier",
    "q_dq_audit",
    "q_prepare_training",
    "q_dedup_incremental",
    "q_cusum",
    "q_hybrid_search",
    "q_novelty",
    # round-3 additions
    "q_knn_lsh",
    "q_hybrid_search_ann",
    "q_bpe_train",
    "q_knn_ivfpq",
    "q_dsir_weights",
    "q_semdedup",
    "q_cdc_chunks",
    "q_source_overlap",
    # round-3 continuation operators
    "q_ccnet_buckets",
    "q_source_divergence",
    "q_semantic_contamination",
    "q_hubness",
    "q_heldout_bigram",
    "q_kcenter_coreset",
    "q_mmr_rerank",
    "q_dedup_pagerank",
    "q_char_entropy",
    "q_jsonl_roundtrip",
    "q_cluster_topics",
    "q_emb_principal",
    "q_gapfill_locf",
    # round-4 additions
    "q_pipeline_salted",
    # round-5 additions
    "q_excise_spans",
    "q_exact_substrings",
    "q_pii_scan",
    "q_maxsim",
    "q_transition_matrix",
    "q_distinct_ngrams",
    "q_hard_negatives",
    "q_doremi_step",
    "q_autocorr",
    "q_fuzzy_join",
    "q_phrase_search",
    "q_event_pattern",
    "q_roc_auc",
    "q_seasonal_outliers",
    "q_item_cooccurrence",
    "q_stream_phrase_search",
    "q_ivm_refresh",
    "q_table_diff",
    "q_state_inspect",
    "q_pysource_batch",
    "q_drop_ledger",
    "q_holt_forecast",
    "q_attribution",
    "q_calibration",
    "q_sample_priority",
    "q_matryoshka",
    "q_linkage_weights",
    "q_msprt",
    # r6 additions: the experimentation/trend/profile family growth
    "q_bh_fdr",
    "q_kruskal",
    "q_theil_sen",
    "q_xcorr_leadlag",
    "q_neyman_alloc",
    "q_table_stats",
    "q_kcenter_coreset_batched",
    "q_stream_bh_fdr",
    "q_gini_activity",
    "q_skyline_users",
    "q_isotonic_calibration",
    "q_conformal",
    "q_join_card_audit",
    "q_histogram_equidepth",
    "q_holt_winters",
    "q_rfm_segments",
    "q_degree_powerlaw",
    "q_stream_unconverted",
    # r7 additions: the distributed-quantile showcases
    "q_percentile_distributed",
    "q_char_budget_quantiles",
    # r8: the streaming twin of the exact distributed quantiles
    "q_stream_percentile_distributed",
    # r8: per-source mixing quota (batch rank + streaming admission)
    "q_source_quota",
    "q_stream_source_quota",
    # r8: asymmetric containment dedup (the subset-duplicate sweep)
    "q_dedup_containment",
    # r8: binary-quantization ANN (the cheapest index tier)
    "q_knn_binary",
    # r8: Spark 4 recursive CTE (engine-looped hierarchy walk)
    "q_part_hierarchy",
    # r8: streaming containment ingest gate
    "q_stream_dedup_containment",
    # r8: positional proximity query (phrase <-> bag-of-words middle tier)
    "q_proximity_search",
    # r8: streaming binary-signature index ingest
    "q_stream_knn_binary_ingest",
    # r8: containment keep/drop artifact (rides the memoized pair relation)
    "q_containment_keep",
    # r8: the mixture datasheet (second capstone composition)
    "q_mixture_manifest",
    # r8: streaming point-in-time feature enrichment
    "q_stream_pit_enrich",
    # r8: TextRank keyword extraction (weighted PageRank over word graph)
    "q_textrank_keywords",
    # r9: the ExactSubstr REWRITE artifact (span surgery over the
    # shared exsub relation — detect -> report -> apply completed)
    "q_apply_excision",
    # r9: deterministic corpus-wide training-order shuffle (two-pass
    # rank family; the natural consumer of q_shard_layout)
    "q_global_shuffle",
    # r9: the redacted-corpus artifact (map-only regex, zero shuffles —
    # the privacy family's detect -> apply completion)
    "q_apply_redaction",
    # r9 capstone: gates + span excision + redaction -> the shippable
    # cleaned corpus in one lazy plan
    "q_clean_corpus",
    # r9: mean-centering applied (the embedding family's apply step)
    "q_emb_center",
    # r9: materialized packed training sequences (packing's apply step)
    "q_apply_packing",
    # r9: IVF inverted-list occupancy audit (index-health monitor)
    "q_ivf_balance",
    # r9: span-level benchmark decontamination applied (surgical
    # alternative to doc-level drops)
    "q_apply_decontamination",
    # r10 capstone (VERDICT r9 item 5): packed sequences + global
    # shuffle MATERIALIZED to parquet shards, read back and audited.
    # COLD pays the one-time write (construction); STEADY times the
    # read-back + audit only (the _WRITTEN marker caches the write
    # per session) — the round-trip CORRECTNESS is what the oracle
    # hash certifies, not what steady re-times
    "q_write_shards",
    # r10: the easy→hard training schedule (stage buckets + seeded
    # within-stage shuffle via the grouped two-pass rank)
    "q_curriculum_order",
    # r10: the temperature-weighted source interleave (stride
    # scheduling — two two-pass ranks, zero windows)
    "q_interleave_mixture",
    # r10: mergeable-sketch set algebra (KMV union/intersection,
    # per-tag two-phase top-K — the theta-sketch pattern, oracle-checked)
    "q_kmv_union",
]

#: the heaviest operators additionally timed at sf1 (10× the headline
#: sf) — per-query sf0.1 timings drown in JVM/stage noise as the suite
#: grows, so regressions on the queries that matter are measured above
#: the noise floor (VERDICT r2 item 10). The sf1 corpus is generated
#: once into .benchdata/sf1 (gitignored) by tools/gen_benchdata.py —
#: a PERF corpus scaled from the driver's sf0.1 with key-domain
#: shifts; correctness stays gated at the driver's sf0.01.
SF1_HEAVY = [
    "q_knn_pq",
    "q_winnow_match",
    "q_dedup_consensus",
    "q_dup_spans",
    "q_exact_substrings",
    "q_tpch_q21",
    # r5 additions (VERDICT r4 item 5): the two queries with active
    # sf1 regression/fix stories, pinned above the sf0.1 noise floor
    "q_semdedup",
    "q_stream_contamination",
    # r5: catalog-bounded but fan-out-heavy — the one new operator
    # whose regression would hide in sf0.1 noise
    "q_item_cooccurrence",
    # r6: the explicit power-user truncation variant — pinned at sf1
    # alongside the uncapped query so the cap's bound stays measured
    "q_item_cooccurrence_capped",
    # r8: containment's probe-prefix x full-posting-list join is the
    # one new shape whose fan-out grows with corpus size — pinned at
    # sf1 (10x docs, including the 100x-length skew doc's twin corpus)
    "q_dedup_containment",
    # r9 (VERDICT r8 item 5): the span surgery rides the same exsub
    # positional relation — the 100x skew doc is exactly what stresses
    # the L-window histogram plus the per-doc cuts-array join
    "q_apply_excision",
]

#: r7 (VERDICT r6 item 5): run ONLY in the sf1skew tier — the skew
#: corpus now carries a continuous HIGH-NDV value column (NDV ≈ rows)
#: and one event type holding ~80% of rows, exactly the shapes that
#: made the old single-partition rank/prefix windows O(N) single-task
#: sorts. The queries below were rewritten onto the distributed
#: two-pass prefix sum (global_prefix_sums / global_row_numbers) and
#: are budget-gated here against the corpus built to punish the old
#: form (q_trimmed_mean additionally pays the 0.8·N dominant-type
#: partition in its grouped pass). The list grows as the rest of the
#: two-pass family gains committed skew budgets.
SKEW_STATS = [
    "q_kruskal",
    "q_roc_auc",
    "q_histogram_equidepth",
    "q_rfm_segments",
    "q_trimmed_mean",
    # exact per-group quantiles under the 0.8N dominant type + ~1M-NDV
    # value — the corpus the old per-group-sort forms could not survive
    "q_percentile_distributed",
    # r8 (VERDICT r7 item 3): the REST of the two-pass prefix-sum
    # family — each r7 rewrite claimed 100x-skew safety; these rows
    # make every claim a committed budget on the adversarial corpus
    "q_ks_test",
    "q_rank_test",
    "q_cusum",
    "q_winsorized_mean",
    "q_char_budget_quantiles",
    "q_seq_pack",
    "q_ccnet_buckets",
    # r8: the interpolated-percentile fourth form joins its family here
    "q_percentile_interp",
    # r9 (VERDICT r8 item 5): the capstone flags relation + grouped
    # two-pass quota rank, budget-gated on the 0.8N-dominant-source
    # adversarial corpus
    "q_mixture_manifest",
    # r9: the global-shuffle two-pass rank joins its family here
    "q_global_shuffle",
]

#: the round-1 comparable subset (BENCH_r01's exact query list) —
#: summed separately every round so the like-for-like baseline
#: comparison survives headline-suite growth.
R1_SUBSET = HEADLINE[:23]

BUDGET_FILE = os.path.join(REPO, "bench_budgets.json")
FULL_FILE = os.path.join(REPO, "BENCH_FULL.json")
#: breach threshold: steady > FACTOR x max(budget, FLOOR). The floor
#: keeps sub-300ms queries (where one JIT hiccup is 2x) from paging
#: anyone; real regressions on the heavy queries sit far above it.
BUDGET_FACTOR = 1.5
BUDGET_FLOOR = 0.3
#: additive noise pad: stage scheduling / GC hiccups cost a fixed
#: 100-300 ms regardless of query size, which a purely multiplicative
#: gate mis-models at sub-second budgets (r6: two 0.3s-budget queries
#: breached by 2 ms under an ambient wave while every heavy query
#: passed). Negligible against multi-second budgets, absorbs the
#: additive component for small ones.
BUDGET_NOISE_PAD = 0.25
#: ambient-drift clamp: the suite-wide slowdown factor the gate will
#: normalize away before flagging a query. Capped at 2 so a genuinely
#: broken environment still fails loudly instead of normalizing
#: itself green.
DRIFT_CAP = 2.0
#: absolute suite guard (ADVICE r5): drift normalization excuses any
#: UNIFORM regression up to DRIFT_CAP — a framework/session-config
#: change that slows every query 2x would exit rc=0. This pairs the
#: relative per-query gate with an un-normalized ceiling on summed
#: tier wall time: fail when a tier's total exceeds SUITE_FACTOR x the
#: committed per-query-budget sum, regardless of the drift estimate.
SUITE_FACTOR = 2.0


def _drift(timings: dict[str, float], budgets: dict[str, float]) -> float:
    """Machine-speed factor for one tier: the MEDIAN of measured/budget
    over this run's budgeted queries (floor-size ones excluded — their
    ratios are JIT noise). Budgets are cut on one machine-moment; a
    later run on a loaded machine shifts EVERY query by a common
    factor (r5 observed median 1.16x with no code change), which is
    ambient drift, not a regression. A real regression moves ONE query
    far off the suite's median, which this normalization preserves.
    Clamped to [1, DRIFT_CAP]: never tightens below the committed
    budgets, never excuses more than 2x."""
    ratios = sorted(
        t / budgets[n] for n, t in timings.items() if budgets.get(n, 0) >= BUDGET_FLOOR
    )
    if not ratios:
        return 1.0
    mid = len(ratios) // 2
    med = ratios[mid] if len(ratios) % 2 else (ratios[mid - 1] + ratios[mid]) / 2
    return min(DRIFT_CAP, max(1.0, med))


def _check_budgets(
    steady: dict[str, float],
    sf1: dict[str, float] | None,
    sf1skew: dict[str, float] | None = None,
) -> tuple[list[dict], dict[str, float]]:
    if not os.path.exists(BUDGET_FILE):
        return [], {}
    with open(BUDGET_FILE) as fh:
        budgets = json.load(fh)
    breaches: list[dict] = []
    drifts: dict[str, float] = {}
    for tier, timings in (
        ("sf0.1", steady),
        ("sf1", sf1 or {}),
        ("sf1skew", sf1skew or {}),
    ):
        tier_budgets = budgets.get(tier, {})
        drift = _drift(timings, tier_budgets)
        drifts[tier] = round(drift, 3)
        for name, t in timings.items():
            b = tier_budgets.get(name)
            if b is None:
                # a headline query absent from the committed table is a
                # BREACH, not an exemption (ADVICE r4: q_pipeline_salted
                # joined HEADLINE silently outside the gate) — add it
                # via `python bench.py --write-budgets`.
                breaches.append({"q": name, "tier": tier, "sec": t, "budget": None})
            elif t > BUDGET_FACTOR * drift * max(b, BUDGET_FLOOR) + BUDGET_NOISE_PAD:
                breaches.append(
                    {"q": name, "tier": tier, "sec": t, "budget": b, "drift": drifts[tier]}
                )
        # absolute (NOT drift-normalized) suite ceiling — only over
        # queries with committed budgets that the per-query gate did
        # NOT already flag: this guard exists for the uniform
        # regression the relative gate normalizes away, not to
        # double-report a single blown query
        flagged = {b["q"] for b in breaches if b["tier"] == tier}
        budgeted = {
            n: t
            for n, t in timings.items()
            if n in tier_budgets and n not in flagged
        }
        if budgeted:
            suite_budget = sum(tier_budgets[n] for n in budgeted)
            suite_wall = sum(budgeted.values())
            if suite_wall > SUITE_FACTOR * suite_budget:
                breaches.append(
                    {
                        "q": "__suite__",
                        "tier": tier,
                        "sec": round(suite_wall, 3),
                        "budget": round(suite_budget, 3),
                        "drift": drifts[tier],
                    }
                )
    return breaches, drifts


def _absolve_transients(breaches: list[dict], remeasure) -> list[dict]:
    """Re-measure each per-query breach ONCE against the same gate and
    reclassify passing ones as transients — see the call-site comment
    for the storm-vs-regression rationale. MUTATES ``breaches``
    (removing absolved entries) and returns the absolved list; the
    suite-ceiling and missing-budget breaches are never candidates,
    at most 5 re-measures run, and a re-measure that itself fails (or
    raises) leaves the breach standing — conservative by default."""
    absolved: list[dict] = []
    recheckable = [
        b for b in breaches if b["q"] != "__suite__" and b["budget"] is not None
    ][:5]
    for b in recheckable:
        try:
            re_t = round(remeasure(b), 3)
        except Exception:
            continue
        # drift 1.0, NOT the breach-time multiplier (review finding):
        # the re-measure runs in post-suite conditions, and reusing a
        # storm-clamped drift of 2.0 would absolve a genuine 2x
        # persistent regression (4x mid-storm -> breach; 2x quiet
        # re-measure <= 1.5*2.0*b). The quiet gate is strictly
        # tighter, so errors fall on the side of keeping breaches.
        gate = BUDGET_FACTOR * max(b["budget"], BUDGET_FLOOR) + BUDGET_NOISE_PAD
        if re_t <= gate:
            breaches.remove(b)
            absolved.append({**b, "remeasured_sec": re_t})
            print(
                f"BREACH ABSOLVED {b['q']} ({b['tier']}): {b['sec']}s "
                f"mid-run but {re_t}s on re-measure (gate {round(gate, 3)}s) "
                "— transient load wave, not a regression",
                file=sys.stderr,
            )
    return absolved


def _write_budgets(
    steady: dict[str, float],
    sf1: dict[str, float] | None,
    sf1skew: dict[str, float] | None = None,
) -> None:
    with open(BUDGET_FILE, "w") as fh:
        json.dump(
            {"sf0.1": steady, "sf1": sf1 or {}, "sf1skew": sf1skew or {}},
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(f"budgets written to {BUDGET_FILE}", file=sys.stderr)


def _loadavg() -> list[float] | None:
    """1/5/15-minute load averages — recorded at run start and end so
    a breach under one of this host's external load storms (observed
    1-min > 5 with nothing of ours running; q_semdedup's kernel
    responds ~6x) is self-documenting in the committed artifact."""
    try:
        with open("/proc/loadavg") as fh:
            return [round(float(x), 2) for x in fh.read().split()[:3]]
    except OSError:  # pragma: no cover - non-Linux
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = _loadavg()

    from orders_kafka_streams_spark.operators import all_queries
    from orders_kafka_streams_spark.session import get_spark

    spark = get_spark("okss-bench")
    queries = all_queries()

    def run_once(name: str, data_dir: str | None = None, include_build: bool = False) -> float:
        # include_build=True starts the timer BEFORE query construction:
        # builders may run real Spark work at construction time
        # (memo-persist materialization on first touch, q_semdedup's
        # adaptive size probe), and the COLD metric must capture it
        # (r5 review finding). Steady runs stay execution-only — the
        # long-running-engine framing where the plan is built once;
        # timing Python plan-construction py4j chatter on every steady
        # run inflated the suite ~16 s without measuring the engine.
        if include_build:
            t0 = time.perf_counter()
            df = queries[name](spark, data_dir or sf_dir)
        else:
            df = queries[name](spark, data_dir or sf_dir)
            t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # warm the JVM/codegen/file listing once on a cheap query
    run_once("q_tpch_q6")

    # cold = construction + first execution after JVM warm-up (pays
    # plan building, codegen, first-touch persists, and any
    # construction-time probe jobs); steady = min of two subsequent
    # execution-only runs (machine noise measured +/-10%, BASELINE.md).
    # The two steady executions run in two SEPARATED full passes over
    # the suite, not back-to-back: ambient load on this host arrives in
    # multi-second waves (r5 observed the same suite flag disjoint
    # "regressions" on consecutive runs), and back-to-back runs let one
    # wave sit on both of a query's samples. Minutes apart, the min
    # survives any wave shorter than a full pass — same total
    # executions, strictly better noise rejection.
    cold: dict[str, float] = {}
    steady1: dict[str, float] = {}
    for name in HEADLINE:
        cold[name] = round(run_once(name, include_build=True), 3)
        steady1[name] = run_once(name)
    steady = {
        name: round(min(steady1[name], run_once(name)), 3) for name in HEADLINE
    }

    total_cold = round(sum(cold.values()), 3)
    total_steady = round(sum(steady.values()), 3)
    # flagship throughput: events rows through the full pair-match →
    # windowed-agg pipeline per steady-state second (the reference's
    # single-node rows/sec framing) — counts the FULL events table,
    # the pipeline's actual input cardinality
    from orders_kafka_streams_spark.sources.tables import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    flagship_rps = round(n_events / steady["q_pipeline"]) if steady["q_pipeline"] else None

    # sf1 pass: the heaviest operators at 10× scale, above the noise
    # floor. Generated on first use; skipped (reported null) only if
    # generation fails (e.g. read-only disk). The sf1skew pass repeats
    # the tier on the ADVERSARIAL corpus (power-user basket, bot
    # cohort, hot order, 100×-length doc — gen_benchdata.py --skew):
    # the 100× grading bar is skew survival, so the heavy queries are
    # budget-gated on the corpus built to hurt them, not just the
    # benign one.
    def run_scale_tier(
        tier_dir: str, gen_flags: list[str], names: list[str] = SF1_HEAVY
    ) -> dict[str, float] | None:
        try:
            # _COMPLETE is written LAST by the generator — a corpus
            # without it (interrupted generation) is regenerated, not
            # trusted
            if not os.path.exists(os.path.join(tier_dir, "_COMPLETE")):
                import subprocess

                subprocess.run(
                    [
                        sys.executable,
                        os.path.join(REPO, "tools", "gen_benchdata.py"),
                        sf_dir,
                        tier_dir,
                        *gen_flags,
                    ],
                    check=True,
                    capture_output=True,
                )
            # drop every prior-tier session memo + cached relation
            # first: each tier's queries build their OWN memos, and the
            # preceding executions leave enough persisted state that
            # storage-memory eviction churn dominates the timings (r5:
            # semdedup measured 6.1 s inside the full bench vs 3.8 s
            # isolated — same code, same corpus)
            from orders_kafka_streams_spark.operators.dedup import _PERSIST_MEMO

            for df in list(_PERSIST_MEMO.values()):
                try:
                    df.unpersist()
                except Exception:
                    pass
            _PERSIST_MEMO.clear()
            spark.catalog.clearCache()
            # localCheckpointed RDDs (dedup/similarity in-query lineage
            # cuts) survive both clears above and accumulate with the
            # headline count — at 111 queries they squeezed semdedup's
            # kernel tasks 2.4 -> 14 s (r6). No memoized DF references
            # them after the memo clear, so a full persistent-RDD
            # sweep is safe here.
            try:
                for rdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    rdd.unpersist()
            except Exception as e:
                print(f"persistent-RDD sweep skipped: {e}", file=sys.stderr)

            # back-to-back min-of-2, NOT the sf0.1 two-separated-passes
            # shape: a scale-tier query's first run pays its memo
            # build, and by a second full pass the other queries' memos
            # have evicted its cached relations (r5 measured q_semdedup
            # 6.7 s in pass 2 vs 3.8 s back-to-back — the same
            # storage-churn effect the pre-pass memo clear exists for).
            # Multi-second queries average over ambient waves anyway,
            # so temporal diversity buys nothing at this tier.
            tier: dict[str, float] = {}
            for name in names:
                try:
                    first = run_once(name, tier_dir)
                    second = run_once(name, tier_dir)
                    tier[name] = round(min(first, second), 3)
                except Exception as e:  # keep the timings already collected
                    print(f"{os.path.basename(tier_dir)} {name} failed: {e}", file=sys.stderr)
            return tier or None
        except Exception as e:  # pragma: no cover - environment-dependent
            print(f"{os.path.basename(tier_dir)} pass skipped: {e}", file=sys.stderr)
            return None

    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".benchdata", "sf1"))
    sf1 = run_scale_tier(sf1_dir, [])
    sf1skew_dir = os.environ.get(
        "SPARK_GRAFT_SF1SKEW_DIR", os.path.join(REPO, ".benchdata", "sf1skew")
    )
    sf1skew = run_scale_tier(sf1skew_dir, ["--skew"], SF1_HEAVY + SKEW_STATS)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    r1_subset_sec = round(sum(steady[q] for q in R1_SUBSET if q in steady), 3)

    if "--write-budgets" in sys.argv:
        _write_budgets(steady, sf1, sf1skew)
        breaches: list[dict] = []
        drifts: dict[str, float] = {}
        absolved: list[dict] = []
    else:
        breaches, drifts = _check_budgets(steady, sf1, sf1skew)
        # Storm-vs-regression guard (VERDICT r7 item 1): tier timings
        # are min-of-two BACK-TO-BACK runs, so one of this host's
        # multi-minute external load waves sits on both samples while
        # the tier MEDIAN (the drift estimate) stays ~1.0 — the
        # Arrow-kernel queries respond ~6x to a storm the rest of the
        # tier barely feels (r8: q_knn_pq 4.15s / q_semdedup 8.29s
        # mid-wave vs 1.46s / 2.2s quiet minutes later, drift 1.0). A
        # PERSISTENT regression still reproduces when re-measured
        # after the tiers finish; a transient does not. Each per-query
        # breach gets ONE re-measure against the SAME gate — passing
        # re-measures are reclassified to `storm_absolved` in the
        # committed artifact (visible, never silently swallowed);
        # missing-budget and suite-ceiling breaches are never
        # absolved. Bounded at 5 re-measures per run.
        tier_dirs = {"sf0.1": None, "sf1": sf1_dir, "sf1skew": sf1skew_dir}

        def _remeasure(b: dict) -> float:
            # warm-up run first (untimed result discarded): the scale
            # tiers evicted every memo/persistent RDD, so a memo-backed
            # sf0.1/sf1 query re-measured cold would pay its full
            # tokenize/shingle rebuild INSIDE the timed write and the
            # guard would fail on exactly the class it was built for
            # (review finding). The original steady timings are
            # memo-warm, so the comparison must be too.
            run_once(b["q"], tier_dirs[b["tier"]])
            return run_once(b["q"], tier_dirs[b["tier"]])

        absolved = _absolve_transients(breaches, _remeasure)
    for b in breaches:
        if b["q"] == "__suite__":
            print(
                f"BUDGET BREACH suite total ({b['tier']}): {b['sec']}s > "
                f"{SUITE_FACTOR}x committed budget sum {b['budget']}s "
                "(absolute guard — not drift-normalized)",
                file=sys.stderr,
            )
        elif b["budget"] is None:
            print(
                f"BUDGET BREACH {b['q']} ({b['tier']}): no committed budget — "
                "regenerate with `python bench.py --write-budgets`",
                file=sys.stderr,
            )
        else:
            print(
                f"BUDGET BREACH {b['q']} ({b['tier']}): {b['sec']}s > "
                f"{BUDGET_FACTOR}x (drift {b['drift']}x) budget {b['budget']}s",
                file=sys.stderr,
            )

    full = {
        "metric": "headline_suite_wall",
        "value": total_steady,
        "unit": "sec",
        "value_cold": total_cold,
        "value_steady": total_steady,
        "flagship_rows_per_sec": flagship_rps,
        "r1_subset_sec": r1_subset_sec,
        "queries": steady,
        "queries_cold": cold,
        "sf1_queries": sf1,
        "sf1_wall": round(sum(sf1.values()), 3) if sf1 else None,
        "sf1skew_queries": sf1skew,
        "sf1skew_wall": round(sum(sf1skew.values()), 3) if sf1skew else None,
        "budget_breaches": breaches,
        "storm_absolved": absolved,
        "ambient_drift": drifts,
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        "sf": sf_val,
    }
    with open(FULL_FILE, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # full dict FIRST (humans / whole-stdout parsers) ...
    print(json.dumps(full))
    # ... compact summary LAST: always inside the driver's 2000-char
    # stdout tail, so BENCH_r{N}.json gets a non-null "parsed" again.
    #
    # r12 (VERDICT r11 item 2): the driver's round-over-round and
    # 8-vs-32-core comparisons read per-query steady times from THIS
    # parsed line, and r11's line carried none (PERF_r11 per_query {},
    # n_common 0). The full 137-entry dict serializes to ~3.2 KB and
    # can never fit the 2000-char tail capture (measured — the
    # "137 entries ≈ fits" estimate in the verdict was off by 60%),
    # so the line carries as many entries as fit a hard _TAIL_BUDGET,
    # SLOWEST-FIRST: the heavy queries are where a regression or
    # speedup is distinguishable from noise, and their membership is
    # stable across rounds/core-counts so the driver's intersection
    # (n_common) stays large. "queries_omitted" makes the truncation
    # explicit; the COMPLETE dict stays in the first stdout line and
    # BENCH_FULL.json. Existing headline fields are unchanged
    # (additions only); compact separators keep the line parseable
    # json while fitting ~20% more entries.
    _TAIL_BUDGET = 1900  # hard cap: a >2000-char line parses as NOTHING
    tail_obj = {
        "metric": "headline_suite_wall",
        "value": total_steady,
        "unit": "sec",
        "value_cold": total_cold,
        "flagship_rows_per_sec": flagship_rps,
        "r1_subset_sec": r1_subset_sec,
        "sf1_wall": round(sum(sf1.values()), 3) if sf1 else None,
        "sf1skew_wall": round(sum(sf1skew.values()), 3) if sf1skew else None,
        "n_queries": len(steady),
        "queries": {},
        "queries_omitted": 0,
        "budget_breaches": [b["q"] for b in breaches],
        "queries_file": "BENCH_FULL.json",
        "sf": sf_val,
    }
    for name in sorted(steady, key=lambda n: (-steady[n], n)):
        tail_obj["queries"][name] = steady[name]
        tail_obj["queries_omitted"] = len(steady) - len(tail_obj["queries"])
        if len(json.dumps(tail_obj, separators=(",", ":"))) > _TAIL_BUDGET:
            del tail_obj["queries"][name]
            tail_obj["queries_omitted"] = len(steady) - len(tail_obj["queries"])
            break
    print(json.dumps(tail_obj, separators=(",", ":")))
    if breaches:
        sys.exit(3)


if __name__ == "__main__":
    main()
