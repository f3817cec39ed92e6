"""q_percentile_distributed / q_char_budget_quantiles semantics: the
cell-relation rank selections must equal brute-force discrete
quantiles computed row-at-a-time in Python (the definition, not
another engine) — including heavy ties and single-row groups."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.robustness import PCTL_QS
from orders_kafka_streams_spark.operators.sampling import (
    CHAR_QS,
    global_prefix_sums,
)


def _pctl_disc(values: list[float], q: float) -> float:
    """⌈q·n⌉-th smallest — percentile_disc, the q_percentile_distributed
    contract."""
    s = sorted(values)
    return s[max(0, math.ceil(q * len(s)) - 1)]


def _weighted_q(lengths: list[int], q: float) -> int:
    """Smallest L whose inclusive cumulative char mass reaches q·total —
    the q_char_budget_quantiles contract."""
    s = sorted(lengths)
    total = sum(s)
    cum = 0
    for v in s:
        cum += v
        if cum >= q * total:
            return v
    return s[-1]


def test_percentile_disc_matches_bruteforce(spark):
    rng = random.Random(3)
    rows = []
    data: dict[str, list[float]] = {"a": [], "b": [], "c": []}
    for g in data:
        n = {"a": 977, "b": 40, "c": 1}[g]
        for _ in range(n):
            v = round(rng.uniform(0, 100), 1)  # heavy ties at 1 dp
            data[g].append(v)
            rows.append((g, v))
    df = spark.createDataFrame(rows, "event_type string, value double")

    cells = df.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    cum = global_prefix_sums(
        cells, ["value"], {"cum": "c"}, part=("event_type",), inclusive=True
    )
    n_type = cells.groupBy("event_type").agg(F.sum("c").alias("n"))
    j = cum.join(F.broadcast(n_type), "event_type")
    aggs = []
    for q in PCTL_QS:
        aggs.append(
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("value"))
            ).alias(f"p{int(round(q * 100))}")
        )
    got = {r["event_type"]: r for r in j.groupBy("event_type").agg(*aggs).collect()}
    for g, vals in data.items():
        for q in PCTL_QS:
            want = _pctl_disc(vals, q)
            assert got[g][f"p{int(round(q * 100))}"] == want, (g, q)


def test_char_budget_matches_bruteforce(spark):
    from orders_kafka_streams_spark.operators import all_queries
    import os
    import tempfile

    rng = random.Random(9)
    rows = []
    per_source: dict[str, list[int]] = {"s0": [], "s1": []}
    for i in range(3000):
        src = "s0" if i % 3 else "s1"
        # heavy tail: most docs short, a few huge — where the weighted
        # and count quantiles diverge hardest
        n = rng.randint(50, 500) if rng.random() < 0.95 else rng.randint(50_000, 90_000)
        per_source[src].append(n)
        rows.append((i, src, "en", "x" * 3, n))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string, n_chars int"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["source"]: r
            for r in all_queries()["q_char_budget_quantiles"](spark, d).collect()
        }
    for src, lens in per_source.items():
        assert got[src]["n_docs"] == len(lens)
        assert got[src]["total_chars"] == sum(lens)
        for q in CHAR_QS:
            assert got[src][f"l{int(round(q * 100))}"] == _weighted_q(lens, q), (src, q)


def _pctl_cont(values: list[float], q: float) -> float:
    """SQL-standard percentile_cont: h = q·(n−1); lerp between the
    order statistics at ⌊h⌋ and ⌊h⌋+1 (zero-based)."""
    s = sorted(values)
    h = q * (len(s) - 1)
    lo = s[int(math.floor(h))]
    hi = s[min(int(math.floor(h)) + 1, len(s) - 1)]
    return round(lo + (h - math.floor(h)) * (hi - lo), 6)


def test_percentile_cont_matches_bruteforce(spark, tmp_path):
    """q_percentile_interp through the registry (writes a synthetic
    events parquet) vs the row-at-a-time percentile_cont definition —
    including heavy ties, a two-row group, and a single-row group
    (frac collapses, upper rank caps at n)."""
    import datetime
    import os

    from orders_kafka_streams_spark.operators import all_queries

    rng = random.Random(7)
    rows = []
    data: dict[str, list[float]] = {"a": [], "b": [], "c": []}
    for g, n in (("a", 977), ("b", 2), ("c", 1)):
        for i in range(n):
            v = round(rng.uniform(0, 100), 1)
            data[g].append(v)
            rows.append(
                (
                    len(rows),
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=len(rows)),
                    1,
                    g,
                    v,
                    "{}",
                )
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    got = {r["event_type"]: r for r in all_queries()["q_percentile_interp"](spark, d).collect()}
    for g, vals in data.items():
        assert got[g]["n"] == len(vals)
        for q in PCTL_QS:
            assert got[g][f"p{int(round(q * 100))}"] == _pctl_cont(vals, q), (g, q)
