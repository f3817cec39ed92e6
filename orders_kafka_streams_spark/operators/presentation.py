"""Presentation-order helper for CELL-BOUNDED outputs (r11, guide
§1.2 per-task work / §2.4 remove shuffles).

A trailing ``orderBy`` on a summary table pays a RangePartitioning
SAMPLE JOB plus a range exchange + sort stage on every execution —
a fixed ~0.1-0.15 s per query on this host that buys nothing when the
relation is bounded by an enum/cell domain (segment grids, per-source
tables, per-day cells, fixed top-k picks). :func:`cells_sorted`
produces the SAME rows in the SAME total order as ``orderBy`` by
concentrating the bounded relation into one partition and sorting it
there: one task, no sample job, no extra exchange (``coalesce`` is
not a shuffle).

Contract: apply ONLY where the row count is bounded by constants or
enumerations independent of corpus size — never to per-document /
per-event / per-pair relations. Every call site states its bound in
a trailing comment; the upstream aggregation's map-side partials keep
their full parallelism (coalesce collapses only the final, cell-sized
stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cells_sorted(df: DataFrame, *cols) -> DataFrame:
    """Total-order a cell-bounded relation without a range exchange.

    One partition ⇒ ``sortWithinPartitions`` IS a total sort; accepts
    the same column/``F.desc`` arguments as ``orderBy``.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)


def cells_sorted_exchanged(df: DataFrame, *cols) -> DataFrame:
    """:func:`cells_sorted` for outputs whose PRE-SORT stage is
    corpus-scale (r12, ADVICE r11): ``coalesce(1)`` collapses the
    whole stage back to the previous exchange into ONE task, so when
    that stage contains more than the final cell-sized aggregation —
    e.g. a corpus-keyed reduce fused with a broadcast-join probe —
    the coalesce silently single-tasks corpus-scale work.
    ``repartition(1)`` inserts an exchange boundary instead: the wide
    stage keeps its parallelism and only the bounded OUTPUT rows move
    to the single sort task. Costs one SinglePartition exchange of
    cell rows — still strictly cheaper than ``orderBy`` (which pays a
    range-sample job plus the same width of exchange). Same rows,
    same total order."""
    return df.repartition(1).sortWithinPartitions(*cols)
