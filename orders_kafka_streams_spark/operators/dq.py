"""Declarative data-quality audit (the Deequ/Great-Expectations shape).

One query materializes the constraint suite a production pipeline runs
before publishing a dataset version: each row is a named check with
its measured metric, threshold, and verdict.

Checks (scoped to the driver tables):
- completeness — fraction of non-null ``events.value``
- uniqueness — distinct/total ``events.event_id``
- referential integrity — fraction of ``orders.o_custkey`` with a
  matching ``customer`` row (anti-join-counted)
- domain — fraction of ``events.event_type`` inside the allowed set
- non-negativity — fraction of ``orders.o_totalprice >= 0``

Scale notes: every check is a scan + partial/final aggregate (tiny
final row), and the RI check is one key join whose strategy AQE picks
(broadcast when the dimension fits, shuffle otherwise) — the audit
costs one pass over each audited table regardless of scale, which is
why constraint suites are viable at 100 TB. All metrics are exact-int
ratios — identical double bits on both engines, so verdicts
hash-match (no float-boundary ambiguity).

Reference connection: no equivalent in dhoard/orders-kafka-streams;
SURVEY §2.9 extension surface (pipeline-operations family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

EVENT_TYPES = ("click", "view", "signup", "purchase", "error")

#: (check name, minimum acceptable metric)
THRESHOLDS = {
    "completeness_events_value": 0.99,
    "uniqueness_events_event_id": 1.0,
    "ri_orders_custkey": 1.0,
    "domain_events_event_type": 1.0,
    "nonneg_orders_totalprice": 1.0,
}


def _verdict(name: str, metric: F.Column) -> list[F.Column]:
    t = THRESHOLDS[name]
    return [
        F.lit(name).alias("check"),
        F.round(metric, 6).alias("metric"),
        F.lit(t).alias("threshold"),
        (metric >= t).alias("passed"),
    ]


def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("o_custkey"))

    completeness = ev.agg(
        *_verdict(
            "completeness_events_value",
            F.count("value").cast("double") / F.count(F.lit(1)),
        )
    )
    uniqueness = ev.agg(
        *_verdict(
            "uniqueness_events_event_id",
            F.count_distinct("event_id").cast("double") / F.count(F.lit(1)),
        )
    )
    # RI: count orders without a customer via the join's null-probe —
    # one aggregation over the joined relation, strategy left to AQE
    ri = (
        orders.join(cust.withColumn("_hit", F.lit(1)), "o_custkey", "left")
        .agg(
            *_verdict(
                "ri_orders_custkey",
                F.sum(F.coalesce("_hit", F.lit(0))).cast("double") / F.count(F.lit(1)),
            )
        )
    )
    domain = ev.agg(
        *_verdict(
            "domain_events_event_type",
            F.sum(F.col("event_type").isin(*EVENT_TYPES).cast("long")).cast("double")
            / F.count(F.lit(1)),
        )
    )
    nonneg = orders.agg(
        *_verdict(
            "nonneg_orders_totalprice",
            F.sum((F.col("o_totalprice") >= 0).cast("long")).cast("double")
            / F.count(F.lit(1)),
        )
    )
    return (
        completeness.unionByName(uniqueness)
        .unionByName(ri)
        .unionByName(domain)
        .unionByName(nonneg)
    )


def _q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_audit(spark, sf_dir)


#: (table, column) pairs the ANALYZE-style profile sweeps — the CBO
#: statistics a warehouse collects before trusting join reordering.
PROFILE_COLS = (
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("orders", "o_orderstatus"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_returnflag"),
    ("events", "user_id"),
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
)


def _q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics profile — the inputs a
    cost-based optimizer (and a data-quality reviewer) reads before
    trusting join order, broadcast choices, or a dimension's
    advertised cardinality: per profiled column, row count, null
    count, EXACT distinct count, null fraction, and the
    rows-per-distinct ratio (the join fan-out predictor — ndv ≈ rows
    means a key; small ndv means a category that will broadcast).
    Exact NDV, not approx_count_distinct: this is the audited
    statistics table, and the HLL± variant already exists as
    q_approx_distinct (declared rows-only).

    Scale shape: one aggregation PER PROFILED COLUMN over its own
    table scan — count_distinct partial-aggregates map-side, so each
    check is scan + two-phase agg to ONE row; the union is |columns|
    rows. At 100 TB you'd compute all of a table's columns in one
    multi-agg pass (Spark plans the count_distincts as an expand —
    one scan either way); per-column scans keep the per-check
    pushdown (column pruning to ONE column each) visible in the plan.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (pipeline-operations family)."""
    out = None
    for table, col in PROFILE_COLS:
        t = load_table(spark, sf_dir, table)
        row = t.agg(
            F.lit(table).alias("table_name"),
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.count_distinct(F.col(col)).alias("ndv"),
            F.round(
                (F.count(F.lit(1)) - F.count(col)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("null_frac"),
            F.round(
                F.count(col).cast("double") / F.count_distinct(F.col(col)), 6
            ).alias("rows_per_value"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name", "column_name")


def _table_stats_oracle() -> str:
    parts = []
    for table, col in PROFILE_COLS:
        parts.append(
            f"""SELECT '{table}' AS table_name, '{col}' AS column_name,
       CAST(count(1) AS BIGINT) AS n_rows,
       CAST(count(1) - count({col}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {col}) AS BIGINT) AS ndv,
       round(CAST(count(1) - count({col}) AS DOUBLE) / count(1), 6) AS null_frac,
       round(CAST(count({col}) AS DOUBLE) / count(DISTINCT {col}), 6) AS rows_per_value
FROM {table}"""
        )
    return "\n".join(
        ["SELECT * FROM ("]
        + ["\nUNION ALL\n".join(parts)]
        + [") ORDER BY table_name, column_name"]
    )


QUERIES = {
    "q_dq_audit": _q_dq_audit,
    "q_table_stats": _q_table_stats,
}

_ET_LIST = ", ".join(f"'{t}'" for t in EVENT_TYPES)

ORACLE = {
    "q_table_stats": _table_stats_oracle(),
    "q_dq_audit": f"""
        SELECT 'completeness_events_value' AS check,
               round(CAST(count(value) AS DOUBLE) / count(1), 6) AS metric,
               CAST({THRESHOLDS['completeness_events_value']} AS DOUBLE) AS threshold,
               (CAST(count(value) AS DOUBLE) / count(1)
                  >= {THRESHOLDS['completeness_events_value']}) AS passed
        FROM events
        UNION ALL
        SELECT 'uniqueness_events_event_id',
               round(CAST(count(DISTINCT event_id) AS DOUBLE) / count(1), 6),
               CAST({THRESHOLDS['uniqueness_events_event_id']} AS DOUBLE),
               (CAST(count(DISTINCT event_id) AS DOUBLE) / count(1)
                  >= {THRESHOLDS['uniqueness_events_event_id']})
        FROM events
        UNION ALL
        SELECT 'ri_orders_custkey',
               round(CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
                     / count(1), 6),
               CAST({THRESHOLDS['ri_orders_custkey']} AS DOUBLE),
               (CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
                  / count(1) >= {THRESHOLDS['ri_orders_custkey']})
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'domain_events_event_type',
               round(CAST(sum(CASE WHEN event_type IN ({_ET_LIST}) THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(1), 6),
               CAST({THRESHOLDS['domain_events_event_type']} AS DOUBLE),
               (CAST(sum(CASE WHEN event_type IN ({_ET_LIST}) THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(1) >= {THRESHOLDS['domain_events_event_type']})
        FROM events
        UNION ALL
        SELECT 'nonneg_orders_totalprice',
               round(CAST(sum(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(1), 6),
               CAST({THRESHOLDS['nonneg_orders_totalprice']} AS DOUBLE),
               (CAST(sum(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(1) >= {THRESHOLDS['nonneg_orders_totalprice']})
        FROM orders
    """,
}
