"""Bucketed-table layout: the 100 TB co-location strategy.

Fact-fact joins (lineitem ⋈ orders on the order key) shuffle both
sides on every query. Persisting both tables bucketed-and-sorted by
the join key makes the join ZERO-SHUFFLE forever after: each bucket
pair sort-merges locally (`tests/test_bucketing.py` asserts the plan
has no Exchange). This file is the write-side seam the batch loader
(`tables.py`) would switch to at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (optionally sorted) managed parquet table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a fresh in-memory catalog can orphan the managed location from a
    # previous session; clear it or saveAsTable refuses the name
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if warehouse:
        shutil.rmtree(os.path.join(warehouse, table), ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    n_buckets: int = 8,
    prefix: str = "okss_bucketed",
) -> tuple[DataFrame, DataFrame]:
    """Write both sides bucketed on their join keys; return the
    re-loaded table handles (bucket metadata only survives through the
    catalog, not through plain parquet paths)."""
    lt, rt = f"{prefix}_l", f"{prefix}_r"
    write_bucketed(left, lt, key_left, n_buckets)
    write_bucketed(right, rt, key_right, n_buckets)
    return spark.table(lt), spark.table(rt)
