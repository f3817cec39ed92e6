"""Streaming incremental view maintenance — the live half of
q_ivm_refresh (operators/warehouse.py): documents ARRIVE as a stream
and each micro-batch's partial-aggregate cells MERGE into the
persisted view snapshot by addition. Counts and sums are
self-maintainable aggregates, so merging is associative and
commutative — the final snapshot is invariant to how the stream
batches the corpus (tests/test_ivm.py pins this), and equals the
batch recompute of the full table (the driver oracle).

Per-batch cost: one scan of the BATCH plus a cell-sized merge
(|sources × langs| rows) — the view never rescans history. On a
lakehouse table the snapshot swap is a transactional MERGE INTO;
the plain-parquet seam shares streaming/sinks.swap_snapshot_write
with the SCD2 sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.warehouse import _ivm_cells
from .sinks import swap_snapshot_write

CELL_SCHEMA = "source string, lang string, n_docs long, sum_chars long"


def merge_cells(cur: DataFrame, batch_cells: DataFrame) -> DataFrame:
    """Pure cell merge — additive, associative, driver-free."""
    return (
        cur.unionByName(batch_cells)
        .groupBy("source", "lang")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_chars").alias("sum_chars"),
        )
    )


def ivm_sink(view_path: str):
    """foreachBatch callable maintaining the view cells at view_path."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if os.path.exists(os.path.join(view_path, "_SUCCESS")):
            cur = spark.read.parquet(view_path)
        else:
            cur = spark.createDataFrame([], CELL_SCHEMA)
        swap_snapshot_write(merge_cells(cur, _ivm_cells(batch)), view_path, batch_id)

    return apply
