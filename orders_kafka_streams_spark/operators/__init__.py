"""Operator modules. Each module exposes library functions over
DataFrames plus a ``QUERIES`` / ``ORACLE`` registry pair consumed by
``__spark_entry__.py`` (the driver's correctness contract).

Registry ORDER matters: the driver's correctness report caps at the
first ~50 entries, so the merged registry is interleaved ROUND-ROBIN
across modules — any prefix samples every query family (pipeline,
relational, windows, dedup, knn, text, streaming, multimodal, …)
instead of exhausting module 1 before module 2 appears.

ROTATION (round 3+): queries already driver-verified in earlier
rounds (`_DRIVER_CHECKED`, derived from the committed
CORRECTNESS_r{N}.json artifacts at import time) sort AFTER
never-checked ones, so the union of per-round 50-query samples
converges on full driver coverage. `_RECHECK_FIRST` pins queries the
previous round flagged (q_scd2 hash-red in r2) plus this round's
rewrites to the very front so fixes are re-verified by the hard
signal.
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
    # r11 rewrites (VERDICT r10 items 1-2): consensus gained the
    # size-dispatched broadcast-semi form, semdedup's pair kernel was
    # re-vectorized, and the eager persist-memo change touches every
    # memo consumer — the driver's hard hash signal lands here first
    "q_dedup_consensus",
    "q_semdedup",
    # r11 new operators: streaming interleave admission twin, Gopher
    # repetition gates
    "q_stream_interleave",
    "q_repetition_filter",
    "q_semantic_pack",
    "q_bitext_margin",
    "q_memorization_risk",
    "q_epoch_schedule",
    "q_classifier_sweep",
    "q_corpus_final",
    "q_stream_repetition",
    "q_pack_mask_audit",
    "q_padding_waste",
    "q_dedup_ngram",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_kmeans",
)

#: union of query names across every committed CORRECTNESS_r{N}.json
#: (driver-verified in an earlier round) — deprioritized so each
#: round's 50-query driver sample lands on never-checked queries.
#: Derived from the artifacts at import time (r5: the hand-maintained
#: list had drifted 45 names behind the files, wasting sample slots on
#: already-verified queries), so folding in a new round is automatic.
def _driver_checked() -> frozenset:
    import json
    import os
    import re as _re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    seen: set[str] = set()
    try:
        entries = sorted(os.listdir(root))
    except OSError:
        return frozenset()
    for fname in entries:
        if _re.fullmatch(r"CORRECTNESS_r\d+\.json", fname):
            try:
                with open(os.path.join(root, fname)) as fh:
                    seen |= set(json.load(fh))
            except (OSError, ValueError):
                continue  # unreadable artifact: just deprioritize less
    return frozenset(seen)


_DRIVER_CHECKED = _driver_checked()


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
