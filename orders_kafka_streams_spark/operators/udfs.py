"""User-extensibility tier (SURVEY §2.8): Arrow-vectorized Python UDFs.

The reference's "UDFs" are inline Java lambdas; PySpark's equivalents
are the pandas tiers. Hot paths in this engine stay JVM-side (see
tests/test_plans.py::test_no_python_udfs_in_relational_plans) — these
queries exist to cover the tier itself, oracle-checked like everything
else:

- q_grouped_map: per-group z-score via ``applyInPandas`` (grouped map:
  one pandas DataFrame per group, Arrow both ways).
- q_pandas_scalar: batch-vectorized ``pandas_udf`` projection.
- q_pandas_udaf: grouped-agg pandas UDF (the UDAF tier).
- q_udtf_chunks: Python UDTF applied via LATERAL correlated TVF — the
  table-function tier, sharing the declarative chunker's oracle.

Kernels are self-contained closures (pandas/numpy only) so Python
workers never need this package on their path.
"""

from __future__ import annotations

import pandas as pd

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
            # proper NULLs (not NaN): object-dtype None column, which
            # Arrow converts to null doubles. The previous
            # Series.where(False, None) form raised "Array conditional
            # must be same shape as self" on single-row groups — found
            # by the sf1skew smoke (500 one-event rare-tail users).
            z = pd.Series([None] * len(v), index=v.index, dtype=object)
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


def _q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (the UDAF tier): per-event-type trimmed
    mean (drop top/bottom 10%) — a reduction Catalyst has no built-in
    for, and exactly what the grouped-agg tier exists to express.
    Arrow ships each group's column once; the result is a scalar per
    group (no transposed DataFrame round-trip like grouped-map)."""

    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        lo, hi = v.quantile(0.1), v.quantile(0.9)
        kept = v[(v >= lo) & (v <= hi)]
        return float(kept.mean().round(6)) if len(kept) else None

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Catalyst refuses to mix pandas and JVM aggregates in one agg
        # (INVALID_PANDAS_UDF_PLACEMENT), so the count rides the same tier
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        trimmed_mean("value").alias("trimmed_mean_value"),
        n_rows("value").alias("n"),
    )


def _q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table-function tier — the LAST rung of
    §2.8's extensibility ladder after scalar/grouped-agg/grouped-map):
    a user-defined TABLE function expanding each document's token
    count into its training-chunk spans, applied per-row via LATERAL
    correlated TVF syntax. Deliberately the UDTF twin of the
    DECLARATIVE chunker — it shares q_doc_chunk's oracle verbatim, so
    the hash match proves the Python generator reproduces the
    sequence+explode arithmetic row-for-row (the same kernel-parity
    discipline as the LSH Arrow kernel's fold-expression twin).

    Scale shape: the UDTF runs Arrow-batched per input row with no
    shuffle (the lateral join is a generator, not a join exchange);
    it remains the SLOW path vs q_doc_chunk's codegen'd explode —
    covered for surface completeness, with the declarative form as
    the production recommendation (its own docstring says why)."""
    from pyspark.sql.functions import udtf

    from .curation import CHUNK_STRIDE, CHUNK_TOKENS
    from .text import _tokenized

    # useArrow: without it the UDTF evaluates as BatchEvalPythonUDTF
    # (pickle row-at-a-time — the one node class the plan gate bans);
    # Arrow moves it to ArrowEvalPythonUDTF, the vectorized transfer
    # every other Python kernel in this repo uses (r5 full-suite catch)
    @udtf(returnType="chunk_idx int, tok_start int, tok_end int", useArrow=True)
    class ChunkSpans:
        def eval(self, n: int):
            if n is None or n <= 0:
                return
            idx = 0
            while True:
                start = idx * CHUNK_STRIDE
                yield idx, start + 1, min(start + CHUNK_TOKENS, n)
                if start + CHUNK_TOKENS >= n:
                    return
                idx += 1

    spark.udtf.register("okss_chunk_spans", ChunkSpans)
    base = _tokenized(spark, sf_dir, "source").filter(F.size("t") > 0)
    base.select("doc_id", "source", F.size("t").alias("n_tokens")).createOrReplaceTempView(
        "okss_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, d.source, c.chunk_idx, c.tok_start, c.tok_end
        FROM okss_udtf_docs d, LATERAL okss_chunk_spans(d.n_tokens) c
        """
    )


QUERIES = {
    "q_grouped_map": _q_grouped_map,
    "q_pandas_scalar": _q_pandas_scalar,
    "q_pandas_udaf": _q_pandas_udaf,
    "q_udtf_chunks": _q_udtf_chunks,
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
    "q_pandas_udaf": """
WITH q AS (
  SELECT event_type, quantile_cont(value, 0.1) AS lo, quantile_cont(value, 0.9) AS hi
  FROM events GROUP BY event_type
), t AS (
  SELECT e.event_type, round(avg(e.value), 6) AS trimmed_mean_value
  FROM events e JOIN q USING (event_type)
  WHERE e.value >= lo AND e.value <= hi
  GROUP BY e.event_type
), c AS (
  SELECT event_type, CAST(count(1) AS BIGINT) AS n FROM events GROUP BY event_type
)
SELECT event_type, trimmed_mean_value, n FROM t JOIN c USING (event_type)
""",
}

from .curation import ORACLE as _CU_ORACLE

# the UDTF twin shares the declarative chunker's oracle verbatim —
# kernel parity, not a separate truth
ORACLE["q_udtf_chunks"] = _CU_ORACLE["q_doc_chunk"]
