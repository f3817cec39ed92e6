"""User-extensibility tier (SURVEY §2.8): Arrow-vectorized Python UDFs.

The reference's "UDFs" are inline Java lambdas; PySpark's equivalents
are the pandas tiers. Hot paths in this engine stay JVM-side (see
tests/test_plans.py::test_no_python_udfs_in_relational_plans) — these
queries exist to cover the tier itself, oracle-checked like everything
else:

- q_grouped_map: per-group z-score via ``applyInPandas`` (grouped map:
  one pandas DataFrame per group, Arrow both ways).
- q_pandas_scalar: batch-vectorized ``pandas_udf`` projection.

Kernels are self-contained closures (pandas/numpy only) so Python
workers never need this package on their path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table

ZSCORE_SCHEMA = "event_id long, user_id long, z double"


def zscore_per_group(events: DataFrame) -> DataFrame:
    """Per-user z-score of event values (grouped-map pandas)."""

    def kernel(pdf):
        import numpy as np

        v = pdf["value"]
        std = v.std(ddof=1)
        if len(pdf) < 2 or not np.isfinite(std) or std == 0.0:
            z = v * float("nan")  # all-null column, typed double
            z = z.where(False, None)
        else:
            z = ((v - v.mean()) / std).round(6)
        return pdf.assign(z=z)[["event_id", "user_id", "z"]]

    return events.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        kernel, schema=ZSCORE_SCHEMA
    )


def _q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zscore_per_group(load_table(spark, sf_dir, "events"))


def _q_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.StringType())
    def normalize(s):
        # vectorized over Arrow batches: strip digits, collapse '#', upper
        return s.str.replace(r"[0-9]+", "", regex=True).str.replace("#", "-").str.upper()

    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", normalize("p_brand").alias("brand_norm"))


QUERIES = {
    "q_grouped_map": _q_grouped_map,
    "q_pandas_scalar": _q_pandas_scalar,
}

ORACLE = {
    "q_grouped_map": """
WITH s AS (
  SELECT event_id, user_id, value,
         avg(value) OVER w AS mu,
         stddev_samp(value) OVER w AS sigma,
         count(1) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id)
)
SELECT event_id, user_id,
       CASE WHEN n < 2 OR sigma IS NULL OR sigma = 0
            THEN NULL ELSE round((value - mu) / sigma, 6) END AS z
FROM s
""",
    "q_pandas_scalar": """
SELECT p_partkey,
       upper(replace(regexp_replace(p_brand, '[0-9]+', '', 'g'), '#', '-')) AS brand_norm
FROM part
""",
}
