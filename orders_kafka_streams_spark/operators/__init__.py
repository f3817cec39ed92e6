"""Operator modules. Each module exposes library functions over
DataFrames plus a ``QUERIES`` / ``ORACLE`` registry pair consumed by
``__spark_entry__.py`` (the driver's correctness contract).

Registry ORDER matters: the driver's correctness report caps at the
first ~50 entries, so the merged registry is interleaved ROUND-ROBIN
across modules — any prefix samples every query family (pipeline,
relational, windows, dedup, knn, text, streaming, multimodal, …)
instead of exhausting module 1 before module 2 appears.

ROTATION (round 3+): queries already driver-verified in earlier
rounds (`_DRIVER_CHECKED`, the union of CORRECTNESS_r01/r02 keys)
sort AFTER never-checked ones, so the union of per-round 50-query
samples converges on full driver coverage. `_RECHECK_FIRST` pins
queries the previous round flagged (q_scd2 hash-red in r2) to the
very front so the fix is re-verified by the hard signal.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module
from types import ModuleType

from pyspark.sql import DataFrame, SparkSession

#: modules contributing QUERIES/ORACLE registries
_MODULES = [
    "pipeline",
    "relational",
    "window_funcs",
    "scalar_funcs",
    "timeseries",
    "text",
    "sampling",
    "curation",
    "dedup",
    "similarity",
    "clustering",
    "multimodal",
    "robustness",
    "skew",
    "stats",
    "udfs",
    "warehouse",
    "privacy",
    "dq",
    "streaming_queries",
]

#: (module, reason) pairs skipped for a missing OPTIONAL dependency —
#: kept visible so registry shrinkage is diagnosable, never silent.
SKIPPED_MODULES: list[tuple[str, str]] = []

#: pinned to the front of the driver sample: queries the previous
#: round's driver report flagged, PLUS previously-verified queries
#: whose IMPLEMENTATION was rewritten this round — the rotation would
#: otherwise sort them last and a rewrite regression would ship
#: without the hard driver-hash signal.
_RECHECK_FIRST = (
    # the 6 queries never yet in any round's 50-entry driver sample
    # (VERDICT r4 item 4) — pinning them closes the rotation's
    # convergence promise: after r5 every registered query has carried
    # the driver's hard hash signal at least once
    "q_ccnet_buckets",
    "q_char_entropy",
    "q_heldout_bigram",
    "q_hourly_profile",
    "q_source_divergence",
    "q_tokenizer_fertility",
    # round-5 rewrites — previously verified, re-hash after the change
    "q_semdedup",  # adaptive small-path plan + vectorized kernel
    "q_cdc_chunks",  # staged cuts projection + cell-agg rewrite
    "q_rank_test",  # cell-based Mann-Whitney rank derivation
    "q_shard_layout",  # two-pass striped sharding
    "q_tpch_q21",  # windowed per-order qualification (single fact pass)
)

#: union of query names in CORRECTNESS_r01/r02/r03/r04.json
#: (driver-verified in earlier rounds) — deprioritized so this round's
#: 50-query driver sample lands on never-checked queries.
_DRIVER_CHECKED = frozenset({
    # r4-verified (CORRECTNESS_r04.json)
    "q_ann_ndcg", "q_ann_quality", "q_array_funcs", "q_case_when",
    "q_chi2_independence", "q_clean_pipeline", "q_cluster_purity",
    "q_coalesce_nullif", "q_dedup_clusters", "q_dedup_embedding",
    "q_dedup_minhash", "q_dedup_simhash", "q_doc_tokenize",
    "q_emb_principal", "q_entropy", "q_funnel", "q_good_turing",
    "q_json_funcs", "q_knn_ivf", "q_knn_ivfpq", "q_knn_pq", "q_ks_test",
    "q_lang_mix", "q_outliers", "q_partition_dpp", "q_partition_prune",
    "q_percentile", "q_pipeline_salted", "q_prepare_training",
    "q_quality_classifier", "q_rank_test", "q_rollup_cascade",
    "q_scalar_subquery", "q_stream_ann_ingest", "q_stream_contamination",
    "q_stream_dedup_agg", "q_stream_dedup_incremental",
    "q_stream_quality_gate", "q_trimmed_mean", "q_unpivot",
    "q_vocab_coverage", "q_window_first_last", "q_window_range",
    "q_zipf_fit",
    # r3-verified (CORRECTNESS_r03.json)
    "q_approx_percentile", "q_bootstrap_ci", "q_bpe_encode", "q_bucketed_join",
    "q_cdc_chunks", "q_cluster_topics", "q_date_funcs", "q_dedup_pagerank",
    "q_dp_histogram", "q_drop_duplicates", "q_dsir_weights", "q_ewma",
    "q_except", "q_gapfill_locf", "q_histogram", "q_hubness",
    "q_jsonl_roundtrip", "q_kcenter_coreset", "q_l_diversity", "q_math_funcs",
    "q_memorization_ngrams", "q_mmr_rerank", "q_multimodal_audio",
    "q_multimodal_resize", "q_pack_efficiency", "q_pandas_udaf",
    "q_pmi_bigrams", "q_regexp", "q_semantic_contamination", "q_seq_pack",
    "q_shard_layout", "q_signal_correlation", "q_skew_audit",
    "q_source_overlap", "q_split_assign", "q_split_leakage",
    "q_stream_dp_release", "q_stream_semantic_contamination",
    "q_window_lag_lead", "q_window_ntile", "q_window_running",
    "q_zorder_layout",
    "q_agg_pair", "q_agg_stats", "q_approx_distinct", "q_bm25", "q_bpe_train",
    "q_chao1", "q_contamination", "q_cube", "q_dead_letter", "q_dedup_exact",
    "q_dedup_ngram", "q_doc_chunk", "q_dq_audit", "q_dup_spans",
    "q_emb_quantize", "q_err_handle", "q_filt_null", "q_grouped_map",
    "q_grouping_id", "q_grouping_sets", "q_intersect", "q_interval_join",
    "q_join_anti", "q_join_broadcast", "q_join_cross", "q_join_full",
    "q_join_left", "q_join_order", "q_join_right", "q_join_semi",
    "q_k_anonymity", "q_kmeans", "q_knn_brute", "q_knn_lsh", "q_lateral_topk",
    "q_multimodal_decode", "q_multimodal_frames", "q_multimodal_meta",
    "q_order_info", "q_pandas_scalar", "q_pipeline", "q_pivot", "q_pred_type",
    "q_pseudonymize", "q_psi_drift", "q_quality_repetition", "q_range_join",
    "q_rekey", "q_rekey_fac", "q_rollup", "q_salted_agg", "q_salted_join",
    "q_sample_hash", "q_sample_weighted", "q_scd2", "q_scd2_pit", "q_semdedup",
    "q_sort_limit", "q_str_funcs", "q_stratified_sample", "q_stream_dedup",
    "q_stream_win_tumble", "q_topk_per_group", "q_tpch_q1", "q_tpch_q10",
    "q_tpch_q11", "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q16", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q2",
    "q_tpch_q20", "q_tpch_q21", "q_tpch_q22", "q_tpch_q3", "q_tpch_q4",
    "q_tpch_q5", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9",
    "q_try_arith", "q_unigram_logprob", "q_union_all", "q_union_distinct",
    "q_variant", "q_win_tumble", "q_window_cume", "q_window_nth",
    "q_window_rank",
})


def _loaded_modules() -> list[ModuleType]:
    mods: list[ModuleType] = []
    for m in _MODULES:
        try:
            mods.append(import_module(f".{m}", __package__))
        except ModuleNotFoundError as e:
            # Tolerate ONLY a missing third-party optional dep; a broken
            # import inside our own package must fail loudly rather than
            # silently shrink the driver's query registry.
            if e.name and e.name.startswith("orders_kafka_streams_spark"):
                raise
            if m not in {s for s, _ in SKIPPED_MODULES}:
                SKIPPED_MODULES.append((m, str(e)))
    return mods


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    regs = []
    seen: set[str] = set()
    for mod in _loaded_modules():
        q = getattr(mod, "QUERIES", {})
        dupes = seen & set(q)
        if dupes:
            raise ValueError(f"duplicate query names {dupes} in {mod.__name__}")
        seen |= set(q)
        regs.append(list(q.items()))
    # rotation buckets: recheck-pins first, then never-driver-checked,
    # then previously-verified queries — and WITHIN each bucket a
    # round-robin interleave across modules, so the driver's ~50-entry
    # prefix samples every family that still has unchecked queries.
    def _bucket(name: str) -> int:
        if name in _RECHECK_FIRST:
            return 0
        return 1 if name not in _DRIVER_CHECKED else 2

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for b in (0, 1, 2):
        b_regs = [[kv for kv in r if _bucket(kv[0]) == b] for r in regs]
        for i in range(max((len(r) for r in b_regs), default=0)):
            for r in b_regs:
                if i < len(r):
                    name, fn = r[i]
                    out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _loaded_modules():
        merged.update(getattr(mod, "ORACLE", {}))
    # same round-robin order as all_queries(); oracle-less (rows-only)
    # queries are simply absent from this dict.
    return {name: merged[name] for name in all_queries() if name in merged}
