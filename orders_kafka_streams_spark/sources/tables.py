"""Batch table source: parquet directories laid out as ``{sf_dir}/{name}.parquet``.

This is the test/batch face of the source abstraction; the streaming
face (Kafka + JSON edge) lives in :mod:`..sources.kafka` and
:mod:`..sources.json_edge`. Query code takes DataFrames, so batch and
streaming share operator definitions.

Scale notes: ``spark.read.parquet`` gives Catalyst column pruning +
predicate pushdown for free — operators must keep filters/projections
expressible (no opaque UDFs before the first filter) so they reach the
scan. At 100 TB the same layout would be a partitioned/bucketed table
(e.g. orders bucketed by o_orderkey) — the loader is the single seam
where that changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import TABLES
from ..session import tune


def sf_dir_default() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune(spark)
    # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    # rejects; read it as a long and floor-convert ns → µs (same truncation
    # DuckDB applies when narrowing ns → its µs TIMESTAMP).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def parallelize(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition for compute-heavy per-row operators.

    Small single-row-group parquet files scan as ONE split, serializing
    any expensive projection above them (measured: 13 s of shingling on
    one core at sf0.1). One cheap exchange spreads the rows; at real
    scale inputs arrive in thousands of splits and this is a no-op.
    Apply AFTER filters so parquet pushdown is unaffected.

    The few-splits check uses ``df.inputFiles()`` — driver-side file
    metadata already gathered by the read — NOT ``df.rdd``, which would
    convert the whole plan to an RDD per load just to count partitions.
    File count under-approximates split count (a large file yields many
    splits), so this only skips the exchange when the input is already
    wide — exactly the 100 TB case.
    """
    from ..session import default_parallelism

    p = partitions or default_parallelism()
    return df if len(df.inputFiles()) >= p else df.repartition(p)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can also be exercised via spark.sql."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
