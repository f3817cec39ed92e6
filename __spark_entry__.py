"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``orders_kafka_streams_spark``; every operator
module contributes its QUERIES/ORACLE registry pair (see
``orders_kafka_streams_spark/operators/__init__.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's full topology, batch) on sf0.001."""
    from orders_kafka_streams_spark.operators.pipeline import order_pipeline
    from orders_kafka_streams_spark.sources.tables import load_table

    return order_pipeline(load_table(spark, "/root/testdata/sf0.001", "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from orders_kafka_streams_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from orders_kafka_streams_spark.operators import all_oracles

    return all_oracles()
