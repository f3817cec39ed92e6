"""Zero-cost observability replacing the reference's 8 ``peek`` calls.

The reference logs EVERY record at EVERY hop (Main.java:138-204) —
per-record side effects in the data path. The Spark-native equivalent
is ``Dataset.observe``: named aggregate metrics collected by the
engine during the SAME pass (no extra action, no collect, no
per-record Python) and delivered to a QueryExecutionListener /
StreamingQueryListener.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def peek(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Attach observation metrics to a plan hop.

    Default metrics: row count. Usage::

        df = peek(df, "after_join", F.count(F.lit(1)).alias("rows"),
                  F.avg("processing_ms").alias("avg_ms"))
    """
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("rows"),)
    return df.observe(name, *metrics)


class PeekListener:
    """Collects observed metrics per query execution (batch).

    Register with ``spark.listenerManager.register(listener.as_java(spark))``
    is JVM-side; for PySpark use the simpler pull model:
    ``df.collect()`` then read ``observation`` via the Observation API.
    This helper wraps pyspark.sql.Observation for multi-hop pipelines.
    """

    def __init__(self) -> None:
        from pyspark.sql import Observation

        self._obs: dict[str, "Observation"] = {}
        self._Observation = Observation

    def attach(self, df: DataFrame, name: str, *metrics: Column) -> DataFrame:
        obs = self._Observation(name)
        self._obs[name] = obs
        if not metrics:
            metrics = (F.count(F.lit(1)).alias("rows"),)
        return df.observe(obs, *metrics)

    def get(self, name: str) -> dict:
        return self._obs[name].get
