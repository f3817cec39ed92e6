"""Warehouse-layer temporal modeling and data-layout operators.

- q_scd2 — slowly-changing-dimension type 2 snapshot built from the
  events stream: per user, consecutive runs of the tracked attribute
  (event_type) collapse into effective-dated versions with
  ``valid_from_ms`` / ``valid_to_ms`` / ``is_current``. This is the
  batch materialization of a CDC feed — the standard way a 100 TB
  lakehouse keeps point-in-time-correct dimensions for joins against
  fact history (e.g. training-data snapshots "as of" a cutoff).
- q_zorder_layout — multi-dimensional layout audit: interleave the
  bits of two query dimensions (user hash bucket × value bucket) into
  a Z-order key, chunk the sorted order into target "files", and
  report each file's min/max envelope on both dimensions. On a real
  table this IS the write path (``df.sort(zkey).write...``); the
  min/max envelopes are exactly the parquet column statistics a scan
  planner prunes on, so the query doubles as a measurable layout-
  quality metric (tight envelopes ⇒ most files skipped for a 2-D
  selective scan).

Scale notes: q_scd2 is one exchange total — both window passes and
the island aggregation share the user_id hash partitioning, so
Catalyst inserts a single shuffle; at 100 TB SCD builds are bounded
by that one key shuffle (plus the source scan). q_zorder_layout is
map-only arithmetic + one global sort (the same sort the write would
need) + one file_id aggregation satisfied by the sort's range
partitioning.

Reference connection: no equivalent in dhoard/orders-kafka-streams
(stateless stream pipeline, no dimension persistence); SURVEY §2.9
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .presentation import cells_sorted

from ..functions.portable import epoch_ms
from ..sources.tables import load_table

#: Z-order parameters: 6 bits per dimension (64×64 grid); each
#: simulated file covers a 2^FILE_SHIFT-wide range of the 12-bit
#: Z-curve (=> up to 64 files). Layout-tuning knobs, not semantics.
Z_BITS = 6
FILE_SHIFT = 6


def scd2(events: DataFrame, attr: str = "event_type") -> DataFrame:
    """Collapse per-user attribute runs into SCD2 versions.

    Gaps-and-islands: a version starts where the attribute differs
    from the previous event's (or at the user's first event); the
    running count of starts is the version ordinal; the next version's
    start timestamps this version's ``valid_to_ms`` (NULL = current).
    """
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    prev = F.lag("attr").over(w)
    changed = F.when(prev.isNull() | (F.col("attr") != prev), 1).otherwise(0)
    runs = (
        events.select(
            "user_id", "event_id", F.col(attr).alias("attr"), epoch_ms(F.col("ts")).alias("ms")
        )
        .withColumn(
            "version",
            F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("user_id", "version")
        .agg(
            # attr is constant within an island by construction; min() is
            # the deterministic way to surface it through the aggregate
            F.min("attr").alias("attr"),
            F.min("ms").alias("valid_from_ms"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return runs.select(
        "user_id",
        "version",
        F.col("attr").alias("event_type"),
        "valid_from_ms",
        F.lead("valid_from_ms").over(wv).alias("valid_to_ms"),
        F.lead("valid_from_ms").over(wv).isNull().alias("is_current"),
        "n_events",
    )


def _q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2(load_table(spark, sf_dir, "events"))


def _q_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension — the reason SCD2
    exists: each purchase fact picks the account-state version (signup/
    error runs) valid AT its event time, never a later one (no leakage
    of future dimension state into training features).

    Same union+carry shape as the as-of join, on the version-start
    keys: dimension starts (side 0) and facts (side 1) union, shuffle
    ONCE on user_id, and a prefix-frame last() carries the in-effect
    version onto every fact — versions are contiguous, so carrying the
    latest start ≤ fact time IS interval containment, with no range
    join and no per-version explode. Facts before the first version
    survive with NULL state (left-outer semantics)."""
    ev = load_table(spark, sf_dir, "events")
    dim = scd2(ev.filter(F.col("event_type").isin("signup", "error")))
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", epoch_ms(F.col("ts")).alias("ms"), "value"
    )
    d2 = dim.select(
        "user_id",
        F.col("valid_from_ms").alias("ms"),
        F.lit(0).alias("_side"),
        "version",
        F.col("event_type").alias("state"),
    )
    f2 = facts.withColumn("_side", F.lit(1))
    u = f2.unionByName(d2, allowMissingColumns=True)
    # version as the last tiebreak: two state events at the same ms
    # yield two versions with equal valid_from — the later version must
    # win the carry on both engines (facts have unique event_id, so the
    # NULL-ordering difference between engines can never decide a row)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "_side", "event_id", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(c):
        return F.last(F.when(F.col("_side") == 0, c), ignorenulls=True).over(w)

    return (
        u.withColumn("pit_version", carry(F.col("version")))
        .withColumn("pit_state", carry(F.col("state")))
        .filter(F.col("_side") == 1)
        .select(
            "event_id",
            "user_id",
            "ms",
            F.round("value", 4).alias("value"),
            "pit_version",
            "pit_state",
        )
    )


def zorder_key(x: F.Column, y: F.Column, bits: int = Z_BITS) -> F.Column:
    """Bit-interleave two ``bits``-wide ints into a Z-order key.

    Pure integer arithmetic (shifts/masks) so the identical expression
    runs on any engine — this is the portable scalar core; Delta/Iceberg
    implement the same curve natively for OPTIMIZE ZORDER BY.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _zorder_key_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-block min/max envelopes of events on (user bucket, value
    bucket): ``file_id = zkey >> FILE_SHIFT`` chunks the Z-curve into
    fixed key ranges — the boundaries a clustered write produces.

    Deliberately NOT ``row_number() over (order by zkey)``: a global-
    order window is a single-partition sort at 100 TB. Fixed z-ranges
    are map-only + one tiny aggregation; the real write path would be
    ``repartitionByRange(zkey).sortWithinPartitions(zkey).write`` with
    row-count balance handled by the range partitioner's sampling, and
    this audit's envelopes are the same parquet min/max stats either
    way."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") % (1 << Z_BITS)).cast("long")
    y = F.least(
        F.lit((1 << Z_BITS) - 1), (F.col("value") / F.lit(4.0)).cast("long")
    )
    keyed = ev.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        zorder_key(x, y).alias("zkey"),
    )
    return (
        keyed.withColumn("file_id", F.shiftright("zkey", FILE_SHIFT).cast("long"))
        .groupBy("file_id")
        .agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static partition pruning through the date-partitioned layout
    (VERDICT r3 item 6 — the other half of the at-rest story the
    bucketed join started): events re-laid-out ``partitionBy(
    event_date)``, then a predicate ON the partition column (Mondays)
    selects 5 of 30 directories at FILE-LISTING time — the scan's
    ``PartitionFilters`` carries the predicate and the other 25
    partitions are never opened (asserted in
    tests/test_partitioned.py). At 100 TB this is the difference
    between reading a week and reading a decade."""
    from ..sources.partitioned import PARTITION_COL, partitioned_events

    ev = partitioned_events(spark, sf_dir)
    return (
        ev.filter(F.dayofweek(F.col(PARTITION_COL)) == 2)  # Monday
        .groupBy(PARTITION_COL, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def _q_partition_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Partition Pruning through the same layout: the fact
    side joins a filtered calendar dimension on the partition column,
    and Spark injects a ``dynamicpruning`` subquery into the fact scan
    — partitions are skipped based on the DIM's runtime contents, the
    mechanism that makes star-schema date-dim queries read only the
    matching fact directories. Plan assertion in
    tests/test_partitioned.py; result provably equals the plain join
    (the oracle is the plain join over a generated calendar)."""
    from ..sources.partitioned import PARTITION_COL, calendar_dim, partitioned_events

    ev = partitioned_events(spark, sf_dir)
    dim = calendar_dim(spark).filter(F.col("dow") == 2)  # Mondays
    return (
        ev.join(F.broadcast(dim), ev[PARTITION_COL] == dim["d"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct(PARTITION_COL).alias("n_days"),
        )
    )


IVM_DELTA_MOD = 10  # docs with doc_id % IVM_DELTA_MOD == 9 arrive "today"


def _ivm_cells(docs: DataFrame) -> DataFrame:
    """The mergeable partial-aggregate cells of the maintained view —
    (source, lang) → (n_docs, sum_chars). Counts and sums are the
    textbook self-maintainable aggregates; avg is DERIVED at read
    time (sum/count), never stored, so merging stays exact."""
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def _q_ivm_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a materialized per-(source, lang)
    document-stats view is REFRESHED by merging the arriving delta's
    partial cells into the stored snapshot's cells — never by
    recomputing over the base. The algebra is the classic
    self-maintainable-aggregate IVM (counts/sums merge by addition;
    averages derive at read time), and the DuckDB oracle computes the
    view from the FULL table directly — so the hash match proves
    refresh(snapshot, delta) == recompute(base ∪ delta) exactly.

    Scale shape: the snapshot cells are |sources × langs| rows
    (memoized/persisted here, a stored table in production); a
    refresh costs one scan of the DELTA plus a cell-sized merge —
    at 100 TB with a daily delta this is the difference between
    touching 100 TB and touching the day's arrivals. Both partial
    aggregations partial-combine map-side; the merge shuffles cells
    only.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (warehouse family)."""
    from .dedup import _memo_persist

    docs = load_table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % IVM_DELTA_MOD == IVM_DELTA_MOD - 1
    # the stored snapshot: computed once per session, then reused —
    # refresh runs never rescan the base corpus
    snapshot = _memo_persist(
        spark, sf_dir, "ivm_snapshot", lambda: _ivm_cells(docs.filter(~is_delta))
    )
    delta = _ivm_cells(docs.filter(is_delta))
    merged = (
        snapshot.unionByName(delta)
        .groupBy("source", "lang")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_chars").alias("sum_chars"),
        )
    )
    return merged.select(
        "source",
        "lang",
        "n_docs",
        "sum_chars",
        F.round(F.col("sum_chars") / F.col("n_docs"), 6).alias("avg_chars"),
    ).transform(cells_sorted, "source", "lang")  # source x lang cells


#: snapshot-diff fixture residues: docs with doc_id % DIFF_ADD_MOD == 9
#: exist only in NEW (arrivals), % DIFF_DEL_MOD == 4 only in OLD
#: (deletions), % DIFF_CHG_MOD == 3 in both with changed text.
DIFF_ADD_MOD = 10
DIFF_DEL_MOD = 17
DIFF_CHG_MOD = 7


def _q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (the reverse of CDC apply): diff two
    table states key-by-key into added / removed / modified /
    unchanged counts per source — the audit a warehouse runs after a
    backfill, a migration, or an untrusted pipeline hop ("did the
    rewrite change anything it shouldn't have?"). Snapshots are
    deterministic fixtures of the documents table (residue-class
    adds, deletes, and a text-splice modification — both engines
    derive the SAME two states, so the gate verifies the diff
    machinery, exactly like privacy.pii_augmented_text).

    Scale shape: each side is projected to (doc_id, source,
    content-hash) BEFORE the full-outer join, so the shuffle carries
    16-byte hashes, never document text — reconciliation of a 100 TB
    table moves keys + digests only. One doc_id-keyed join, then a
    per-source cell rollup. Both sides read the same scan (self-diff
    fixture); real deployments point the two legs at two snapshot
    paths with the identical plan.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (warehouse family)."""
    from ..functions.portable import hash60

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    old_text = F.when(
        d % DIFF_CHG_MOD == 3,
        F.substring(F.col("text"), 1, F.greatest(F.length("text") - 10, F.lit(1))),
    ).otherwise(F.col("text"))
    old = docs.filter(d % DIFF_ADD_MOD != DIFF_ADD_MOD - 1).select(
        "doc_id", "source", hash60(old_text).alias("h_old")
    )
    new = docs.filter(d % DIFF_DEL_MOD != 4).select(
        "doc_id", "source", hash60(F.col("text")).alias("h_new")
    )
    j = old.withColumnRenamed("source", "src_old").join(
        new.withColumnRenamed("source", "src_new"), "doc_id", "full"
    )
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(F.coalesce("src_new", "src_old").alias("source"), status.alias("st"))
        .groupBy("source")
        .agg(
            F.sum((F.col("st") == "added").cast("long")).alias("n_added"),
            F.sum((F.col("st") == "removed").cast("long")).alias("n_removed"),
            F.sum((F.col("st") == "modified").cast("long")).alias("n_modified"),
            F.sum((F.col("st") == "unchanged").cast("long")).alias("n_unchanged"),
        )
        .transform(cells_sorted, "source")  # <= |sources| rows
    )


QUERIES = {
    "q_ivm_refresh": _q_ivm_refresh,
    "q_table_diff": _q_table_diff,
    "q_scd2": _q_scd2,
    "q_scd2_pit": _q_scd2_pit,
    "q_zorder_layout": _q_zorder_layout,
    "q_partition_prune": _q_partition_prune,
    "q_partition_dpp": _q_partition_dpp,
}

_ZK = _zorder_key_sql("x", "y")

def _table_diff_oracle() -> str:
    from ..functions.portable import hash60_sql

    old_text = (
        f"CASE WHEN doc_id % {DIFF_CHG_MOD} = 3 "
        "THEN substr(text, 1, greatest(length(text) - 10, 1)) ELSE text END"
    )
    return f"""
WITH old AS (
  SELECT doc_id, source, {hash60_sql(old_text)} AS h_old
  FROM documents WHERE doc_id % {DIFF_ADD_MOD} <> {DIFF_ADD_MOD - 1}
),
new AS (
  SELECT doc_id, source, {hash60_sql("text")} AS h_new
  FROM documents WHERE doc_id % {DIFF_DEL_MOD} <> 4
),
j AS (
  SELECT coalesce(new.source, old.source) AS source,
         CASE WHEN h_old IS NULL THEN 'added'
              WHEN h_new IS NULL THEN 'removed'
              WHEN h_old <> h_new THEN 'modified'
              ELSE 'unchanged' END AS st
  FROM old FULL OUTER JOIN new USING (doc_id)
)
SELECT source,
       CAST(sum(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(sum(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN st = 'modified' THEN 1 ELSE 0 END) AS BIGINT) AS n_modified,
       CAST(sum(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
FROM j GROUP BY source ORDER BY source
"""


ORACLE = {
    "q_table_diff": _table_diff_oracle(),
    # the IVM proof: the oracle recomputes the view from the FULL
    # table — matching it shows merge(snapshot, delta) == recompute
    "q_ivm_refresh": """
SELECT source, lang,
       CAST(count(1) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(1), 6) AS avg_chars
FROM documents
GROUP BY source, lang
ORDER BY source, lang
""",
    # DuckDB dayofweek(): Sunday = 0, so Monday = 1 (Spark's dayofweek
    # is Sunday = 1, Monday = 2 — both sides select the same days)
    "q_partition_prune": """
SELECT CAST(date_trunc('day', ts) AS DATE) AS event_date, event_type,
       CAST(count(1) AS BIGINT) AS n,
       round(sum(value), 4) AS total_value
FROM events
WHERE dayofweek(CAST(date_trunc('day', ts) AS DATE)) = 1
GROUP BY 1, 2
""",
    "q_partition_dpp": """
WITH dim AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                     INTERVAL 1 DAY)) AS DATE) AS d
),
mon AS (SELECT d FROM dim WHERE dayofweek(d) = 1)
SELECT event_type,
       CAST(count(1) AS BIGINT) AS n,
       round(sum(value), 4) AS total_value,
       CAST(count(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS n_days
FROM events JOIN mon ON CAST(date_trunc('day', ts) AS DATE) = mon.d
GROUP BY event_type
""",
    "q_scd2": """
        WITH runs AS (
          SELECT user_id, event_id,
                 event_type AS attr,
                 epoch_ms(ts) AS ms,
                 CASE WHEN lag(event_type) OVER w IS NULL
                        OR event_type <> lag(event_type) OVER w
                      THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
        ), islands AS (
          SELECT user_id, attr, ms,
                 CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
          FROM runs
        ), versions AS (
          SELECT user_id, version,
                 min(attr) AS event_type,
                 min(ms) AS valid_from_ms,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM islands GROUP BY user_id, version
        )
        SELECT user_id, version, event_type, valid_from_ms,
               lead(valid_from_ms) OVER wv AS valid_to_ms,
               (lead(valid_from_ms) OVER wv IS NULL) AS is_current,
               n_events
        FROM versions
        WINDOW wv AS (PARTITION BY user_id ORDER BY version)
    """,
    "q_scd2_pit": """
        WITH st AS (
          SELECT user_id, event_id, event_type AS attr, epoch_ms(ts) AS ms,
                 CASE WHEN lag(event_type) OVER w IS NULL
                        OR event_type <> lag(event_type) OVER w
                      THEN 1 ELSE 0 END AS chg
          FROM events WHERE event_type IN ('signup', 'error')
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
        ), isl AS (
          SELECT user_id, attr, ms,
                 CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
          FROM st
        ), ver AS (
          SELECT user_id, version, min(attr) AS state, min(ms) AS vfrom
          FROM isl GROUP BY user_id, version
        ), u AS (
          SELECT user_id, vfrom AS ms, 0 AS side, version, state,
                 NULL::BIGINT AS event_id, NULL::DOUBLE AS value
          FROM ver
          UNION ALL
          SELECT user_id, epoch_ms(ts), 1, NULL, NULL, event_id, value
          FROM events WHERE event_type = 'purchase'
        ), c AS (
          SELECT *,
                 last_value(CASE WHEN side = 0 THEN version END IGNORE NULLS)
                   OVER wc AS pit_version,
                 last_value(CASE WHEN side = 0 THEN state END IGNORE NULLS)
                   OVER wc AS pit_state
          FROM u
          WINDOW wc AS (PARTITION BY user_id ORDER BY ms, side, event_id, version
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id, ms, round(value, 4) AS value,
               pit_version, pit_state
        FROM c WHERE side = 1
    """,
    "q_zorder_layout": f"""
        WITH keyed AS (
          SELECT event_id,
                 user_id % {1 << Z_BITS} AS x,
                 least({(1 << Z_BITS) - 1}, CAST(trunc(value / 4.0) AS BIGINT)) AS y
          FROM events
        ), zk AS (
          SELECT event_id, x, y, {_ZK} AS zkey FROM keyed
        ), filed AS (
          SELECT x, y, CAST(zkey >> {FILE_SHIFT} AS BIGINT) AS file_id
          FROM zk
        )
        SELECT file_id, min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM filed GROUP BY file_id
    """,
}
