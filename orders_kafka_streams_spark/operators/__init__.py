"""Operator modules. Each module exposes library functions over
DataFrames plus a ``QUERIES`` / ``ORACLE`` registry pair consumed by
``__spark_entry__.py`` (the driver's correctness contract).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

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
    "dedup",
    "similarity",
    "multimodal",
    "robustness",
    "skew",
    "stats",
    "udfs",
    "streaming_queries",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        try:
            mod = import_module(f".{m}", __package__)
        except ImportError:
            continue
        dupes = set(out) & set(getattr(mod, "QUERIES", {}))
        if dupes:
            raise ValueError(f"duplicate query names {dupes} in {m}")
        out.update(getattr(mod, "QUERIES", {}))
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        try:
            mod = import_module(f".{m}", __package__)
        except ImportError:
            continue
        out.update(getattr(mod, "ORACLE", {}))
    return out
