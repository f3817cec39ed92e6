"""Streaming SCD2 maintenance — incremental merge of a CDC event
stream into an effective-dated dimension table.

``scd2_sink(dim_path)`` returns a ``foreachBatch`` callable: each
micro-batch folds its state events into the persisted dimension,
closing versions whose attribute changed and extending the current
ones. Only AFFECTED USERS are recomputed per batch: the batch events
union the affected users' current-version rows (as carry-forward
pseudo-events), the gaps-and-islands rebuild runs on that tiny slice,
and untouched users' rows are rewritten verbatim. On a lakehouse
table this rewrite is a ``MERGE INTO`` keyed on (user_id, version);
plain parquet (this test seam) rewrites the snapshot — the
per-batch COMPUTE is the same in both, proportional to the batch,
not the dimension.

Ordering contract: events are folded in (ts, event_id) order within
the batch; an event older than an affected user's current
``valid_from_ms`` violates the watermark assumption and is dropped
(the reference's grace policy — late data never reopens a closed
version; Main.java:169's grace window is the same stance).

Invariant (tests/test_scd2_stream.py): after streaming any
file-split of the events table, the merged dimension equals the
batch ``scd2()`` of the full table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import epoch_ms
from ..operators.warehouse import scd2

DIM_SCHEMA = (
    "user_id long, version long, event_type string, valid_from_ms long, "
    "valid_to_ms long, is_current boolean, n_events long"
)


def _merge_batch(dim: DataFrame, batch: DataFrame) -> DataFrame:
    """Pure merge: existing dimension rows + a batch of state events →
    updated dimension. All DataFrame ops — testable without streaming."""
    ev = batch.select(
        "user_id",
        F.col("event_id"),
        F.col("event_type").alias("attr"),
        epoch_ms(F.col("ts")).alias("ms"),
        F.lit(1).alias("carry"),
    )
    affected = ev.select("user_id").distinct()
    cur = dim.filter(F.col("is_current")).join(affected, "user_id", "semi")
    keep_rows = dim.join(
        dim.filter(F.col("is_current")).join(affected, "user_id", "semi").select(
            "user_id", "version"
        ),
        ["user_id", "version"],
        "anti",
    )
    # current versions re-enter the fold as carry-forward pseudo-events
    pseudo = cur.select(
        "user_id",
        F.lit(-1).alias("event_id"),
        F.col("event_type").alias("attr"),
        F.col("valid_from_ms").alias("ms"),
        F.col("n_events").alias("carry"),
    )
    base_version = cur.select("user_id", (F.col("version") - 1).alias("v0"))
    # watermark stance: drop batch events older than the current
    # version's start (late data never reopens a closed version)
    ev_ok = ev.join(cur.select("user_id", "valid_from_ms"), "user_id", "left").filter(
        F.col("valid_from_ms").isNull() | (F.col("ms") >= F.col("valid_from_ms"))
    ).select("user_id", "event_id", "attr", "ms", "carry")
    folded = pseudo.unionByName(ev_ok)
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    prev = F.lag("attr").over(w)
    changed = F.when(prev.isNull() | (F.col("attr") != prev), 1).otherwise(0)
    runs = (
        folded.withColumn(
            "island",
            F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("user_id", "island")
        .agg(
            F.min("attr").alias("event_type"),
            F.min("ms").alias("valid_from_ms"),
            F.sum("carry").alias("n_events"),
        )
    )
    wv = Window.partitionBy("user_id").orderBy("island")
    rebuilt = (
        runs.join(base_version, "user_id", "left")
        .select(
            "user_id",
            (F.col("island") + F.coalesce("v0", F.lit(0))).alias("version"),
            "event_type",
            "valid_from_ms",
            F.lead("valid_from_ms").over(wv).alias("valid_to_ms"),
            F.lead("valid_from_ms").over(wv).isNull().alias("is_current"),
            "n_events",
        )
    )
    # closed predecessors keep their valid_to; the reopened current row
    # is replaced by the rebuilt islands, so just union
    return keep_rows.unionByName(rebuilt)


def scd2_sink(dim_path: str):
    """foreachBatch callable maintaining the SCD2 dimension at dim_path."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if os.path.exists(os.path.join(dim_path, "_SUCCESS")):
            dim = spark.read.parquet(dim_path)
        else:
            dim = spark.createDataFrame([], DIM_SCHEMA)
        merged = _merge_batch(dim, batch)
        # plain-parquet seam: crash-safe rename-aside swap (shared
        # with the IVM sink; a lakehouse MERGE INTO replaces it)
        from .sinks import swap_snapshot_write

        swap_snapshot_write(merged, dim_path, batch_id)

    return apply
