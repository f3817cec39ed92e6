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

from .presentation import cells_sorted

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
    return out.transform(cells_sorted, "table_name", "column_name")  # schema-bounded


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


#: (fact, fact key, dim, dim key) joins the CBO-estimate audit checks
CARD_JOINS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
)


def _q_join_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimate audit — the feedback loop on
    q_table_stats: for each audited equi-join, the TEXTBOOK CBO
    estimate |R⋈S| ≈ |R|·|S| / max(ndv_R(k), ndv_S(k)) (uniformity +
    containment assumptions, System R onward) next to the TRUE join
    count, with the under/over ratio. The ratio IS the decision
    signal: a CBO trusting these stats reorders joins and picks
    broadcast sides by the estimate, and a ratio far from 1 (skewed
    keys, correlated filters) is exactly when runtime re-planning
    (AQE) earns its keep. All counts exact integers; the only float
    op is the final division.

    Scale shape: per join, two single-column scans for (count, ndv)
    cells — partial-combined map-side — plus ONE keyed join counted
    by a two-phase count agg; the estimate row is |joins| rows total.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (pipeline-operations family)."""
    out = None
    for ft, fk, dt, dk in CARD_JOINS:
        fact = load_table(spark, sf_dir, ft)
        dim = load_table(spark, sf_dir, dt)
        fstats = fact.agg(
            F.count(F.lit(1)).alias("n_fact"),
            F.count_distinct(F.col(fk)).alias("ndv_f"),
        )
        dstats = dim.agg(
            F.count(F.lit(1)).alias("n_dim"),
            F.count_distinct(F.col(dk)).alias("ndv_d"),
        )
        actual = (
            fact.select(F.col(fk).alias("k"))
            .join(dim.select(F.col(dk).alias("k")), "k")
            .agg(F.count(F.lit(1)).alias("actual"))
        )
        est = (
            F.col("n_fact")
            * F.col("n_dim")
            / F.greatest(F.col("ndv_f"), F.col("ndv_d"))
        )
        row = (
            fstats.crossJoin(F.broadcast(dstats))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(f"{ft}.{fk}={dt}.{dk}").alias("join_key"),
                "n_fact",
                "n_dim",
                F.greatest(F.col("ndv_f"), F.col("ndv_d")).alias("ndv_max"),
                F.floor(est).alias("estimated"),
                "actual",
                F.round(F.col("actual") / est, 6).alias("actual_over_est"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.transform(cells_sorted, "join_key")  # schema-bounded audit rows


def _join_card_oracle() -> str:
    parts = []
    for ft, fk, dt, dk in CARD_JOINS:
        parts.append(
            f"""SELECT '{ft}.{fk}={dt}.{dk}' AS join_key,
       f.n_fact, d.n_dim, greatest(f.ndv_f, d.ndv_d) AS ndv_max,
       CAST(floor(CAST(f.n_fact AS DOUBLE) * d.n_dim
                  / greatest(f.ndv_f, d.ndv_d)) AS BIGINT) AS estimated,
       a.actual,
       round(a.actual / (CAST(f.n_fact AS DOUBLE) * d.n_dim
                         / greatest(f.ndv_f, d.ndv_d)), 6) AS actual_over_est
FROM (SELECT CAST(count(1) AS BIGINT) AS n_fact,
             CAST(count(DISTINCT {fk}) AS BIGINT) AS ndv_f FROM {ft}) f
CROSS JOIN (SELECT CAST(count(1) AS BIGINT) AS n_dim,
             CAST(count(DISTINCT {dk}) AS BIGINT) AS ndv_d FROM {dt}) d
CROSS JOIN (SELECT CAST(count(1) AS BIGINT) AS actual
            FROM {ft} JOIN {dt} ON {ft}.{fk} = {dt}.{dk}) a"""
        )
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n) ORDER BY join_key"
    )


EQD_BUCKETS = 10  # equi-depth histogram bucket count


def _q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of ``events.value`` — the
    OTHER ANALYZE artifact next to q_table_stats' NDV row: fixed-width
    bins (q_histogram) waste resolution on heavy-tailed data, so
    planners store boundaries holding equal ROW counts (selectivity of
    a range predicate ≈ buckets covered / B, Piatetsky-Shapiro &
    Connell 1984). Boundary b = the smallest distinct value whose
    cumulative count reaches ⌈total·b/B⌉ — exact rank selection over
    value cells, ties spilling into a bucket kept (not split), so
    bucket populations are only approximately equal in the presence
    of heavy ties and the output reports the ACTUAL per-bucket count.

    Scale shape: one partial-agg exchange to O(distinct values)
    cells; the cumulative counts come from the DISTRIBUTED two-pass
    prefix sum (sampling.global_prefix_sums — r7: this is the ANALYZE
    artifact built FOR huge tables, and events.value is continuous so
    the cell relation is O(N); the old single running-sum window was
    exactly the single-task sort the histogram exists to avoid,
    VERDICT r6 item 1); boundary selection and per-bucket recount
    both run on the cell relation — event rows are touched once.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (pipeline-operations family)."""
    # r11: pooled value cells + running counts from the family-shared
    # memo (stats._value_rank); exclusive prefix = the oracle's
    # (cum − f) — longs, exact.
    from .stats import _value_rank

    cum = _value_rank(spark, sf_dir).select(
        "value", F.col("t").alias("f"), (F.col("cum") - F.col("t")).alias("cum_b")
    )
    tot = cum.agg(F.sum("f").alias("total"))
    # bucket of a value = number of boundaries at or below its cum:
    # floor(cum_before * B / total) places exactly ceil(total/B)-ish
    # rows per bucket with ties kept together at the boundary crossed
    bucketed = cum.crossJoin(F.broadcast(tot)).select(
        "value",
        "f",
        F.floor(
            F.col("cum_b") * EQD_BUCKETS / F.col("total")
        ).cast("int").alias("bucket"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.sum("f").alias("n_rows"),
        )
        .transform(cells_sorted, "bucket")  # <= |buckets| cells
    )


def _histogram_equidepth_oracle() -> str:
    return f"""
WITH cells AS (
  SELECT value, CAST(count(1) AS BIGINT) AS f
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT value, f,
         CAST(sum(f) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM cells
),
tot AS (SELECT CAST(sum(f) AS BIGINT) AS total FROM cells),
bucketed AS (
  SELECT value, f,
         CAST(floor((cum - f) * {EQD_BUCKETS} / CAST(total AS DOUBLE)) AS INTEGER)
           AS bucket
  FROM cum CROSS JOIN tot
)
SELECT bucket, min(value) AS lo, max(value) AS hi,
       CAST(sum(f) AS BIGINT) AS n_rows
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


QUERIES = {
    "q_dq_audit": _q_dq_audit,
    "q_table_stats": _q_table_stats,
    "q_join_card_audit": _q_join_card_audit,
    "q_histogram_equidepth": _q_histogram_equidepth,
}

_ET_LIST = ", ".join(f"'{t}'" for t in EVENT_TYPES)

ORACLE = {
    "q_table_stats": _table_stats_oracle(),
    "q_join_card_audit": _join_card_oracle(),
    "q_histogram_equidepth": _histogram_equidepth_oracle(),
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
