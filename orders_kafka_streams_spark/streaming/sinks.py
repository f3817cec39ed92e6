"""Exactly-once sink patterns (SURVEY §2.6 `exactly-once`).

Structured Streaming guarantees exactly-once END-TO-END only when the
sink is idempotent or transactional with respect to the micro-batch id:
after a crash between "sink wrote batch N" and "checkpoint committed
batch N", the engine REPLAYS batch N from the checkpointed offsets, so
a naive append sink double-writes. The reference app is at-least-once
(`Main.java:76-88` — Kafka producer without EOS); this module provides
the strictly-stronger idempotent-sink half of Spark's contract:

- ``idempotent_parquet_sink``: ``foreachBatch`` writer that OVERWRITES
  a deterministic per-batch directory (``.../batch_id=N``). A replay of
  batch N rewrites the same directory with the same rows — convergent,
  no duplicates — which is exactly the dynamic-partition-overwrite
  pattern a warehouse table (or Delta/Iceberg MERGE) uses at scale.

The built-in file sink achieves the same via its transaction log
(tests/test_late_data.py::test_checkpoint_recovery_no_duplicates); the
foreachBatch form is what users need for sinks WITHOUT a log (JDBC,
plain object stores), so both are covered.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def matched_dead_letter_sink(out_dir: str):
    """foreachBatch router for the LEFT OUTER pair join
    (streaming/pipeline.stream_pair_left_outer): each micro-batch's
    matched rows land in ``matched/batch_id=N`` and the NULL-padded
    finalized rows in ``dead_letter/batch_id=N`` — the reference's
    TODO side sink (OrderProcessor.java:184) as two branches of ONE
    join's state, replay-safe via the same overwrite-by-batch-id
    idempotence as :func:`idempotent_parquet_sink`."""
    from pyspark.sql import functions as F

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()  # one batch, two consumers — split, don't recompute
        try:
            batch_df.filter(F.col("p_event_id").isNotNull()).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, "matched", f"batch_id={batch_id}"))
            batch_df.filter(F.col("p_event_id").isNull()).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, "dead_letter", f"batch_id={batch_id}"))
        finally:
            batch_df.unpersist()

    return write


def idempotent_parquet_sink(out_dir: str):
    """foreachBatch callable: write each micro-batch to its own
    ``batch_id=N`` directory with overwrite semantics — replay-safe."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write


def swap_snapshot_write(df: DataFrame, path: str, batch_id: int, coalesce: int = 4) -> None:
    """Crash-safe snapshot replacement for plain-parquet seam tables
    (SCD2 dimension, IVM view cells): write beside, then rename-aside
    swap, so one valid snapshot exists on disk at every instant. A
    crash between the renames leaves ``.old-{id}`` intact;
    rmtree-then-replace would lose the table. A leftover ``.old-{id}``
    from a prior completed swap of the same batch (crash after both
    renames, before cleanup) is deleted first — ``os.replace`` cannot
    overwrite a non-empty directory, and the leftover is safe to drop
    because ``path`` exists. Coalesced: snapshot seams are small, and
    32 shuffle partitions would write 32 tiny files re-listed every
    batch (measured 14.5 → 10.8 s at sf0.1 on the SCD2 seam). On a
    lakehouse table a transactional MERGE INTO replaces this whole
    block."""
    import shutil

    tmp_path = f"{path}.tmp-{batch_id}"
    old_path = f"{path}.old-{batch_id}"
    df.coalesce(coalesce).write.mode("overwrite").parquet(tmp_path)
    if os.path.exists(path):
        shutil.rmtree(old_path, ignore_errors=True)
        os.replace(path, old_path)
    os.replace(tmp_path, path)
    shutil.rmtree(old_path, ignore_errors=True)
