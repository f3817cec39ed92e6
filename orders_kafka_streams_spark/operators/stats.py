"""Statistical aggregates + array/string utility surface (SURVEY §2.9
scalar/agg completeness): stddev/variance/correlation, ordered string
aggregation, array manipulation, Count-Min-Sketch heavy hitters.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import hash60, hash60_sql
from ..sources.tables import load_table
from .presentation import cells_sorted, cells_sorted_exchanged


def _q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_covar"),
    )


def _q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered string aggregation: deterministic via array_sort before join
    cust = load_table(spark, sf_dir, "customer")
    top = cust.filter(F.col("c_custkey") <= 50)
    return top.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


def _q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: F.round(x.cast("double"), 6))
    head8 = F.slice(dvec, 1, 8)
    return emb.select(
        "vec_id",
        F.sort_array(head8).alias("head8_sorted"),
        F.round(F.element_at(F.sort_array(head8, asc=False), 1), 6).alias("head8_max"),
        F.array_contains(F.transform(dvec, lambda x: x > 0), True).alias("has_positive"),
        F.size(F.array_distinct(F.transform(head8, lambda x: F.signum(x)))).alias("n_signs"),
    )


CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPK = 10


def _cms_bucket(row: int, w: Column) -> Column:
    """Deterministic CMS bucket for hash row ``row`` — portable 60-bit
    hash of a row-salted key, so Spark and the oracle address the same
    cell."""
    return hash60(F.concat(F.lit(f"cms{row}:"), w)) % CMS_WIDTH


def _cms_bucket_sql(row: int, expr: str) -> str:
    salted = f"'cms{row}:' || {expr}"
    return f"{hash60_sql(salted)} % {CMS_WIDTH}"


def cms_cells(ex: DataFrame, col: str = "w") -> DataFrame:
    """The Count-Min sketch itself: DEPTH×WIDTH counter cells built
    straight from the raw token stream — each of the DEPTH passes is a
    map-side-combined groupBy onto ≤WIDTH cells, so executor state is
    bounded at DEPTH·WIDTH counters no matter the corpus size. This is
    the path that still works when the vocabulary itself is too large
    for a per-key shuffle (the histogram this demo compares against
    would be infeasible)."""
    parts = [
        ex.groupBy(_cms_bucket(i, F.col(col)).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(i).alias("i"), "b", "c")
        for i in range(CMS_DEPTH)
    ]
    return reduce(lambda x, y: x.unionByName(y), parts)


def _q_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan 2005)
    over the corpus token stream: estimate every candidate's frequency
    as the MIN over its DEPTH sketch cells, rank by estimate. The
    sketch uses deterministic salted hashes, so the whole pipeline —
    cells included — is exactly reproducible and DuckDB-oracle-checked
    (no other engine sketch, e.g. HLL/KLL, can be). The exact count
    rides along as the error-gate column: CMS guarantees est ≥ exact,
    with overestimate ≤ e/WIDTH · stream-length w.h.p.
    (tests/test_cms.py asserts both).

    Scale: cells aggregate map-side into DEPTH·WIDTH counters (no
    per-key shuffle); the probe joins candidates to the BROADCAST
    1K-cell sketch. Output: (w, exact, est, rank) top-CMS_TOPK."""
    est = cms_estimates(spark, sf_dir)
    from pyspark.sql import Window

    # top-k FIRST via orderBy+limit (TakeOrderedAndProject — heap per
    # partition, one k-row reduce), THEN rank the k-row result; the
    # only window runs over CMS_TOPK rows, never the candidate stream
    rk = Window.orderBy(F.desc("est"), F.asc("w"))
    return (
        est.select("w", F.col("wc").alias("exact"), "est")
        .orderBy(F.desc("est"), F.asc("w"))
        .limit(CMS_TOPK)
        .select("w", "exact", "est", F.row_number().over(rk).alias("rank"))
    )


def cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, wc=exact, est=CMS estimate) for every candidate token —
    seam for the guarantee test (est ≥ exact, bounded overestimate)."""
    from .text import _tokenized, _word_hist

    ex = _tokenized(spark, sf_dir).select(F.explode("t").alias("w"))
    cells = cms_cells(ex)
    hist = _word_hist(spark, sf_dir)
    probes = hist.select(
        "w",
        "wc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _cms_bucket(i, F.col("w")).alias("b")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("w", "wc", F.col("p.i").alias("i"), F.col("p.b").alias("b"))
    return (
        probes.join(F.broadcast(cells), ["i", "b"])
        .groupBy("w", "wc")
        .agg(F.min("c").alias("est"))
    )


def _cms_oracle() -> str:
    from .text import _TOKS

    cell_parts = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, {_cms_bucket_sql(i, 'w')} AS b, CAST(count(1) AS BIGINT) AS c "
        f"FROM ex GROUP BY {_cms_bucket_sql(i, 'w')}"
        for i in range(CMS_DEPTH)
    )
    probe_parts = "\nUNION ALL\n".join(
        f"SELECT w, wc, {i} AS i, {_cms_bucket_sql(i, 'w')} AS b FROM hist"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
ex AS (SELECT unnest(t) AS w FROM toks),
hist AS (SELECT w, CAST(count(1) AS BIGINT) AS wc FROM ex GROUP BY w),
cells AS ({cell_parts}),
probes AS ({probe_parts}),
est AS (
  SELECT p.w, p.wc, min(c.c) AS est
  FROM probes p JOIN cells c ON p.i = c.i AND p.b = c.b
  GROUP BY p.w, p.wc
)
SELECT w, wc AS exact, est, rank FROM (
  SELECT w, wc, est,
         CAST(row_number() OVER (ORDER BY est DESC, w ASC) AS INTEGER) AS rank
  FROM est)
WHERE rank <= {CMS_TOPK}
"""


#: Benjamini-Hochberg family: one two-sample test per event type (the
#: metric family a real experiment readout sweeps), tested at
#: FDR level BH_ALPHA over exactly BH_M metrics. m is FIXED by the
#: metric list, not the data — the thresholds below are Φ⁻¹ constants
#: precomputed at 9 dp (stdlib-erfc bisection, see tools comment) and
#: SHARED LITERALS in both engines, because neither Spark SQL nor
#: DuckDB ships erf/Φ⁻¹: comparing |z| against z(α·i/m) is exactly the
#: p_(i) ≤ α·i/m step-up rule, monotone-transformed.
BH_ALPHA = 0.05
BH_TYPES = ("click", "error", "purchase", "signup", "view")
BH_M = len(BH_TYPES)
BH_SALT = "bhfdr"
#: z_i = Φ⁻¹(1 − α·i/(2m)) for i = 1..m (two-sided), 9 dp
BH_Z_CRIT = (2.575829304, 2.326347874, 2.170090378, 2.053748911, 1.959963985)


def _q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR-controlled multiple testing over the
    per-event-type A/B metric family (Benjamini & Hochberg 1995) —
    the correction the experimentation stack (q_cuped → q_srm →
    q_msprt → q_power_curve) needs the moment a readout sweeps more
    than one metric: per-metric α=0.05 on m metrics false-positives
    ~1−0.95^m of null experiments; BH's step-up rule (reject all
    p_(i) with i ≤ max{i: p_(i) ≤ α·i/m}) bounds the EXPECTED false
    discovery rate at α. Arms are the deterministic hash60 user
    split; per metric a Welch two-sample z on `value`. p-values never
    materialize: |z_(i)| ≥ Φ⁻¹(1−α·i/(2m)) is the same comparison
    monotone-transformed, with the Φ⁻¹ constants precomputed as
    shared 9-dp literals (neither engine ships erf). On the A/A
    fixture nothing should reject — the honest null readout; the
    lifted-fixture detection path is pinned in tests/test_bh_fdr.py.

    Scale shape: one events pass partial-aggregates (type, arm)
    moment cells (sums rounded 6 dp before the float pipeline, the
    CUPED discipline); everything after runs on 2·m cells — the rank
    window orders m rows, the step-up max attaches as a 1-row
    broadcast. Output: m rows (event_type, n_a, n_b, z_abs, bh_rank,
    z_crit, rejected) by bh_rank.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (experimentation family)."""
    from pyspark.sql import Window

    from ..functions.portable import hash60

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*BH_TYPES)
    )
    arm = (hash60(F.concat(F.lit(BH_SALT + "|"), F.col("user_id"))) % 2).alias("arm")
    cells = (
        ev.select("event_type", "value", arm)
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
            F.round(F.sum(F.col("value") * F.col("value")), 6).alias("ss"),
        )
    )
    a = cells.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("ss").alias("ss_a"),
    )
    b = cells.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("ss").alias("ss_b"),
    )
    j = a.join(b, "event_type")
    mean_a, mean_b = F.col("s_a") / F.col("n_a"), F.col("s_b") / F.col("n_b")
    var_a = (F.col("ss_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("ss_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    z = (mean_a - mean_b) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    scored = j.select(
        "event_type", "n_a", "n_b", F.round(F.abs(z), 6).alias("z_abs")
    )
    w = Window.orderBy(F.desc("z_abs"), F.asc("event_type"))
    crit = "CASE bh_rank " + "".join(
        f"WHEN {i + 1} THEN CAST({c} AS DOUBLE) " for i, c in enumerate(BH_Z_CRIT)
    ) + "END"
    ranked = scored.select(
        "event_type",
        "n_a",
        "n_b",
        "z_abs",
        F.row_number().over(w).alias("bh_rank"),
    ).withColumn("z_crit", F.expr(crit))
    kstar = ranked.agg(
        F.max(F.when(F.col("z_abs") >= F.col("z_crit"), F.col("bh_rank"))).alias(
            "kstar"
        )
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "event_type",
            "n_a",
            "n_b",
            "z_abs",
            "bh_rank",
            "z_crit",
            F.coalesce(F.col("bh_rank") <= F.col("kstar"), F.lit(False)).alias(
                "rejected"
            ),
        )
        .transform(cells_sorted, "bh_rank")  # <= |BH_TYPES| metric rows
    )


def bh_fdr_oracle() -> str:
    from ..functions.portable import hash60_sql

    types = ", ".join(f"'{t}'" for t in BH_TYPES)
    crit = "CASE bh_rank " + "".join(
        f"WHEN {i + 1} THEN CAST({c} AS DOUBLE) " for i, c in enumerate(BH_Z_CRIT)
    ) + "END"
    return f"""
WITH cells AS (
  SELECT event_type,
         {hash60_sql("'" + BH_SALT + "|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         CAST(count(1) AS BIGINT) AS n,
         round(sum(value), 6) AS s,
         round(sum(value * value), 6) AS ss
  FROM events WHERE event_type IN ({types})
  GROUP BY 1, 2
),
j AS (
  SELECT a.event_type, a.n AS n_a, b.n AS n_b,
         abs((a.s / a.n - b.s / b.n) /
             sqrt(((a.ss - a.s * a.s / a.n) / (a.n - 1)) / a.n
                + ((b.ss - b.s * b.s / b.n) / (b.n - 1)) / b.n)) AS za
  FROM cells a JOIN cells b USING (event_type)
  WHERE a.arm = 0 AND b.arm = 1
),
ranked AS (
  SELECT event_type, n_a, n_b, round(za, 6) AS z_abs,
         CAST(row_number() OVER (ORDER BY round(za, 6) DESC, event_type ASC)
              AS INTEGER) AS bh_rank
  FROM j
),
crit AS (SELECT *, {crit} AS z_crit FROM ranked),
ks AS (SELECT max(CASE WHEN z_abs >= z_crit THEN bh_rank END) AS kstar FROM crit)
SELECT event_type, n_a, n_b, z_abs, bh_rank, z_crit,
       coalesce(bh_rank <= kstar, FALSE) AS rejected
FROM crit CROSS JOIN ks
ORDER BY bh_rank
"""


def _q_gini_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity concentration, per event
    type and pooled — the Lorenz-curve inequality readout behind
    "5% of users generate 60% of events" (bot cohorts, power-user
    dependence, the load-skew complement to q_skew_audit's join-key
    view; NOT q_roc_auc's AUC-derived Gini, which measures ranking).
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over per-user counts x sorted
    ascending; within a tied block of f users at count c the rank sum
    telescopes to c·(f·cum + f(f+1)/2), so the whole statistic
    computes from count-of-count CELLS in exact integer arithmetic —
    the only float ops are the two final divisions.

    Scale shape: events → per-(type, user) counts (one partial-agg
    exchange) → count-of-count cells (second, tiny) → ONE ordered
    running-sum window per type over O(distinct counts) cells. The
    pooled row reuses the per-user relation. Output: one row per
    event type + 'all' (group_key, n_users, total_events, gini).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / stats family)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    pooled = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit("all").alias("g"), "c")
    )
    both = per_user.select(F.col("event_type").alias("g"), "c").unionByName(
        pooled
    )
    cells = both.groupBy("g", "c").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("g").orderBy("c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = cells.select(
        "g",
        "c",
        "f",
        F.coalesce(F.sum("f").over(w), F.lit(0)).alias("cum"),
    )
    # rank sum of a tied block: c * (f*cum + f(f+1)/2), exact ints
    block = F.col("c") * (
        F.col("f") * F.col("cum") + F.col("f") * (F.col("f") + 1) / 2
    )
    agg = staged.groupBy("g").agg(
        F.sum("f").alias("n_users"),
        F.sum(F.col("c") * F.col("f")).alias("total_events"),
        F.sum(block).alias("s"),
    )
    n = F.col("n_users")
    gini = F.lit(2.0) * F.col("s") / (n * F.col("total_events")) - (n + 1) / n
    return agg.select(
        F.col("g").alias("group_key"),
        "n_users",
        "total_events",
        F.round(gini, 6).alias("gini"),
    ).transform(cells_sorted, "group_key")  # <= |groups| cells


def _gini_oracle() -> str:
    return """
WITH per_user AS (
  SELECT event_type AS g, user_id, CAST(count(1) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
  UNION ALL
  SELECT 'all' AS g, user_id, CAST(count(1) AS BIGINT) AS c
  FROM events GROUP BY 2
),
cells AS (SELECT g, c, CAST(count(1) AS BIGINT) AS f FROM per_user GROUP BY 1, 2),
staged AS (
  SELECT g, c, f,
         coalesce(CAST(sum(f) OVER (PARTITION BY g ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
  FROM cells
),
agg AS (
  SELECT g, CAST(sum(f) AS BIGINT) AS n_users,
         CAST(sum(c * f) AS BIGINT) AS total_events,
         sum(c * (f * cum + f * (f + 1) / 2)) AS s
  FROM staged GROUP BY g
)
SELECT g AS group_key, n_users, total_events,
       round(2.0 * s / (n_users * total_events)
             - (n_users + 1) / CAST(n_users AS DOUBLE), 6) AS gini
FROM agg ORDER BY group_key
"""


def _q_skyline_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier (skyline) operator over per-user behavior —
    the users not dominated on (total events, total purchase value):
    the classic multi-objective SELECT the Börzsönyi et al. 2001
    SKYLINE OF clause computes, used here as "who are the
    jointly-most-active AND highest-spending users" (any weighted
    ranking picks a frontier point, so the frontier IS the candidate
    set for every possible weighting). The naive formulation is the
    O(n²) NOT EXISTS anti-join; in 2D the frontier is a WINDOW: with
    cells sorted by x descending, a (x, y) cell is on the frontier
    iff its y exceeds every y at strictly larger x — one per-x max
    pre-reduction, one ordered running-max window, zero self-joins.

    Scale shape: per-user totals partial-combine in one exchange;
    per-x maxima reduce the relation to O(distinct x) cells; the
    running max over those cells uses the distributed two-pass form
    (sampling.global_prefix_sums agg='max' — r7: x is a per-user
    count, so its NDV grows with the activity ceiling and an
    unpartitioned running-max window is a single-task sort at scale).
    Dominance uses integer/rounded-exact
    values so the frontier SET is engine-stable. Output: frontier
    users (user_id, n_events, purchase_value) by descending events.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (relational / planner family)."""
    from .sampling import global_prefix_sums

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("y"),
    )
    xcells = per_user.groupBy("x").agg(F.max("y").alias("my"))
    frontier_cells = (
        global_prefix_sums(
            xcells, [F.desc("x")], {"best_above": "my"}, agg="max"
        )
        .filter(F.col("best_above").isNull() | (F.col("my") > F.col("best_above")))
        .select("x", F.col("my").alias("y"))
    )
    return (
        per_user.join(F.broadcast(frontier_cells), ["x", "y"])
        .select(
            "user_id",
            F.col("x").alias("n_events"),
            F.col("y").alias("purchase_value"),
        )
        # r12 (ADVICE r11): the exchanged form — per_user's |users|-keyed
        # final aggregation fuses with the broadcast frontier probe, so a
        # bare coalesce(1) would run that whole corpus-scale stage in ONE
        # task; repartition(1) moves only the frontier-sized output
        .transform(cells_sorted_exchanged, F.desc("n_events"), "user_id")  # skyline frontier: <= |distinct activity levels| rows
    )


def _skyline_oracle() -> str:
    return """
WITH per_user AS (
  SELECT user_id, CAST(count(1) AS BIGINT) AS x,
         round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS y
  FROM events GROUP BY 1
),
xcells AS (SELECT x, max(y) AS my FROM per_user GROUP BY 1),
fc AS (
  SELECT x, my AS y FROM (
    SELECT x, my,
           max(my) OVER (ORDER BY x DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above
    FROM xcells
  ) WHERE best_above IS NULL OR my > best_above
)
SELECT p.user_id, p.x AS n_events, p.y AS purchase_value
FROM per_user p JOIN fc ON p.x = fc.x AND p.y = fc.y
ORDER BY n_events DESC, user_id
"""


def _q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) recalibration of the quality head's
    reliability curve — what you DO about the miscalibration
    q_calibration measures (Zadrozny & Elkan 2002's standard
    post-hoc fix): fit the nondecreasing step function minimizing
    weighted squared error to the per-bin empirical positive rates.
    Computed DECLARATIVELY via the minimax identity — the PAV
    algorithm's output satisfies fit_i = min_{k≥i} max_{j≤i}
    A(j, k), A(j, k) = weighted mean rate over bins j..k — so the
    whole fit is prefix sums + two ordered windows over bin-pair
    cells, no iterative pooling loop anywhere. A(j, k) derives from
    integer (Σnp, Σn) prefix sums, so every division is
    bit-identical cross-engine.

    Scale shape: the corpus collapses to ≤CAL_BINS reliability cells
    (q_calibration's exchange); the minimax expands to ≤CAL_BINS²
    (j, k) pairs — CELLS squared, a constant — with a running max
    over j (window per k) then a running min over k (window per i).
    Output per bin: n, raw empirical rate, isotonic-fitted rate
    (nondecreasing by construction — property-tested).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (model-eval family)."""
    from pyspark.sql import Window

    from .curation import classifier_scores
    from .text import _tokenized

    base = _tokenized(spark, sf_dir, "source", "lang").filter(F.size("t") > 0)
    scored = classifier_scores(base, extra=("lang",))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6)
    bins = (
        scored.select(
            p.alias("p"), (F.col("lang") == "en").cast("long").alias("pos")
        )
        .groupBy(
            F.least(F.floor(F.col("p") * CAL_BINS), F.lit(CAL_BINS - 1))
            .cast("int")
            .alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("np"))
    )
    wp = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "n",
        "np",
        F.sum("n").over(wp).alias("wn"),
        F.sum("np").over(wp).alias("wp"),
    )
    j = pre.select(
        F.col("bin").alias("j"),
        (F.col("wn") - F.col("n")).alias("wn_before"),
        (F.col("wp") - F.col("np")).alias("wp_before"),
    )
    k = pre.select(F.col("bin").alias("k"), "wn", "wp")
    pairs = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("wp") - F.col("wp_before")).cast("double")
            / (F.col("wn") - F.col("wn_before"))
        ).alias("a"),
    )
    # m1(i=j', k) needs max over j <= i: running max over j per k
    wmax = Window.partitionBy("k").orderBy("j").rowsBetween(
        Window.unboundedPreceding, 0
    )
    m1 = pairs.select(
        F.col("j").alias("i"), "k", F.max("a").over(wmax).alias("m")
    ).filter(F.col("k") >= F.col("i"))
    wmin = Window.partitionBy("i").orderBy(F.desc("k")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    fit = (
        m1.select("i", "k", F.min("m").over(wmin).alias("fit"))
        .filter(F.col("k") == F.col("i"))
        .select(F.col("i").alias("bin"), "fit")
    )
    return (
        bins.join(fit, "bin")
        .select(
            "bin",
            "n",
            F.round(F.col("np") / F.col("n"), 6).alias("raw_rate"),
            F.round("fit", 6).alias("iso_rate"),
        )
        .transform(cells_sorted, "bin")  # <= |bins| cells
    )


def _isotonic_oracle() -> str:
    from .curation import _CLS_MARGIN

    return f"""
WITH toks AS (SELECT lang, {_TOKS} AS t FROM documents),
f AS (SELECT lang, round({_CLS_MARGIN}, 6) AS margin FROM toks WHERE len(t) > 0),
pp AS (
  SELECT round(1.0 / (1.0 + exp(-margin)), 6) AS p,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM f
),
bins AS (
  SELECT CAST(least(floor(p * {CAL_BINS}), {CAL_BINS - 1}) AS INTEGER) AS bin,
         CAST(count(1) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS np
  FROM pp GROUP BY 1
),
pre AS (
  SELECT bin, n, np,
         CAST(sum(n) OVER w AS BIGINT) AS wn, CAST(sum(np) OVER w AS BIGINT) AS wp
  FROM bins
  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pairs AS (
  SELECT j.bin AS j, k.bin AS k,
         CAST(k.wp - (j.wp - j.np) AS DOUBLE) / (k.wn - (j.wn - j.n)) AS a
  FROM pre j JOIN pre k ON j.bin <= k.bin
),
m1 AS (
  SELECT j AS i, k, max(a) OVER (PARTITION BY k ORDER BY j
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM pairs
),
fit AS (
  SELECT i AS bin, fit FROM (
    SELECT i, k, min(m) OVER (PARTITION BY i ORDER BY k DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fit
    FROM m1 WHERE k >= i
  ) WHERE k = i
)
SELECT b.bin, b.n, round(CAST(b.np AS DOUBLE) / b.n, 6) AS raw_rate,
       round(f2.fit, 6) AS iso_rate
FROM bins b JOIN fit f2 USING (bin)
ORDER BY b.bin
"""


CONF_ALPHA = 0.1  # target miscoverage for the split-conformal set


def _q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the quality head (Vovk et al.;
    Papadopoulos et al. 2002) — the DISTRIBUTION-FREE uncertainty
    wrapper the calibration family builds toward: hash-split docs
    into calibration/test halves, take the ⌈(n+1)(1−α)⌉-th smallest
    calibration nonconformity s = |label − p̂| as the threshold q̂,
    and the set {y : |y − p̂| ≤ q̂} covers the true label on fresh
    points with probability ≥ 1−α — NO assumption on the head being
    calibrated (exactly what q_calibration shows it isn't). Reported:
    split sizes, q̂, and the measured test coverage (≥ 1−α up to
    finite-sample noise — the guarantee the hash gate pins).

    Scale shape: one scored pass (the memoized token projection),
    hash-split predicate map-side; the rank selection runs on the
    O(distinct nonconformity) cell relation via the distributed
    two-pass prefix sum (sampling.global_prefix_sums — nonconformity
    scores are continuous, so the cell relation is O(N) and the old
    single running-sum window was a single-task sort, VERDICT r6
    item 1); test coverage is one aggregate against the 1-row
    broadcast q̂. Ranks are integers, nonconformities 6-dp-rounded
    before ranking, so threshold selection is engine-stable.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (model-eval family)."""
    from ..functions.portable import hash60
    from .curation import classifier_scores
    from .sampling import global_prefix_sums
    from .text import _tokenized

    base = _tokenized(spark, sf_dir, "source", "lang").filter(F.size("t") > 0)
    scored = classifier_scores(base, extra=("lang",))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6)
    lab = (F.col("lang") == "en").cast("double")
    pts = scored.select(
        (hash60(F.col("doc_id")) % 2).alias("half"),
        F.round(F.abs(lab - p), 6).alias("s"),
    )
    calib = pts.filter(F.col("half") == 0)
    cells = calib.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
    cum = global_prefix_sums(cells, ["s"], {"cum": "f"}, inclusive=True)
    # calibration size from the helper-persisted relation, not a
    # second pass over the scored corpus
    n_cal = cum.agg(F.sum("f").alias("n_calib"))
    # q̂ = smallest s whose cumulative count reaches ⌈(n+1)(1−α)⌉
    rank_needed = F.ceil((F.col("n_calib") + 1) * F.lit(1.0 - CONF_ALPHA))
    qhat = (
        cum.select("s", "cum")
        .crossJoin(F.broadcast(n_cal))
        .filter(F.col("cum") >= rank_needed)
        .agg(F.min("s").alias("qhat"), F.max("n_calib").alias("n_calib"))
    )
    test = pts.filter(F.col("half") == 1)
    cov = test.crossJoin(F.broadcast(qhat)).agg(
        F.max("n_calib").alias("n_calib"),
        F.count(F.lit(1)).alias("n_test"),
        F.max("qhat").alias("qhat"),
        F.round(
            F.sum((F.col("s") <= F.col("qhat")).cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
    )
    return cov.select("n_calib", "n_test", "qhat", "coverage")


def _conformal_oracle() -> str:
    from ..functions.portable import hash60_sql
    from .curation import _CLS_MARGIN

    return f"""
WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
f AS (
  SELECT doc_id, lang, round({_CLS_MARGIN}, 6) AS margin FROM toks WHERE len(t) > 0
),
pts AS (
  SELECT {hash60_sql("doc_id")} % 2 AS half,
         round(abs(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END
                   - round(1.0 / (1.0 + exp(-margin)), 6)), 6) AS s
  FROM f
),
calib AS (SELECT s FROM pts WHERE half = 0),
cells AS (SELECT s, CAST(count(1) AS BIGINT) AS fc FROM calib GROUP BY 1),
cum AS (
  SELECT s, CAST(sum(fc) OVER (ORDER BY s
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM cells
),
nc AS (SELECT CAST(count(1) AS BIGINT) AS n_calib FROM calib),
q AS (
  SELECT min(s) AS qhat, max(n_calib) AS n_calib
  FROM cum CROSS JOIN nc
  WHERE cum >= ceil((n_calib + 1) * {1.0 - CONF_ALPHA})
)
SELECT q.n_calib, CAST(count(1) AS BIGINT) AS n_test, q.qhat,
       round(sum(CASE WHEN t.s <= q.qhat THEN 1 ELSE 0 END)
             / CAST(count(1) AS DOUBLE), 6) AS coverage
FROM (SELECT s FROM pts WHERE half = 1) t CROSS JOIN q
GROUP BY q.n_calib, q.qhat
"""


def bh_daily(cells: DataFrame) -> DataFrame:
    """The per-closed-day BH readout shared by q_stream_bh_fdr and its
    oracle's semantics: ``cells`` is the (day, event_type, arm, n, s,
    ss) relation (per-day moment cells, sums rounded 6 dp at the cell
    level); for every day the family of cumulative Welch z's (running
    sums over the ordered day axis — deterministic accumulation order,
    unlike a bag sum) is ranked and stepped-up against the shared
    Φ⁻¹ literals. A (day, type, arm) hole is zero-filled against the
    dense day×type×arm grid so every day ranks the FULL m-metric
    family. Output: one row per (day, metric)."""
    from pyspark.sql import Window

    spark = cells.sparkSession
    days = cells.select("day").distinct()
    types = spark.createDataFrame(
        [(t,) for t in BH_TYPES], "event_type string"
    )
    arms = spark.createDataFrame([(0,), (1,)], "arm int")
    # densify by UNION + re-aggregate, not a join back (grid derives
    # from `cells`, and a self-join against a streaming memory-sink
    # view trips analyzer reference dedup): zero rows for every grid
    # cell collapse into the sums without changing them
    zeros = (
        days.crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(arms))
        .select(
            "day",
            "event_type",
            "arm",
            F.lit(0).cast("long").alias("n"),
            F.lit(0.0).alias("s"),
            F.lit(0.0).alias("ss"),
        )
    )
    # arms fold side-by-side via conditional aggregation, NOT an
    # a⋈b self-join — two filters of the same memory-sink lineage
    # trip the analyzer's conflicting-reference dedup, and one pass
    # over the cells beats a keyed self-join anyway. r11 (guide §2.4):
    # the fold happens IN the densify aggregation, before the
    # cumulative window — running sums are linear so folding first is
    # bit-identical (the zero rows add exact 0.0) — which drops one
    # whole aggregate+exchange layer and halves the window's
    # partition-key ladder ((event_type, arm) → event_type) in a query
    # whose post-drain relation is O(days × metrics) cells: stage
    # count, not data volume, is its entire steady cost.
    am = lambda c: F.sum(F.when(F.col("arm") == 0, F.col(c)))  # noqa: E731
    bm = lambda c: F.sum(F.when(F.col("arm") == 1, F.col(c)))  # noqa: E731
    dense = (
        cells.select("day", "event_type", "arm", "n", "s", "ss")
        .unionByName(zeros)
        .groupBy("day", "event_type")
        .agg(
            am("n").alias("dn_a"),
            am("s").alias("ds_a"),
            am("ss").alias("dss_a"),
            bm("n").alias("dn_b"),
            bm("s").alias("ds_b"),
            bm("ss").alias("dss_b"),
        )
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = dense.select(
        "day",
        "event_type",
        F.sum("dn_a").over(wc).alias("n_a"),
        F.sum("ds_a").over(wc).alias("s_a"),
        F.sum("dss_a").over(wc).alias("ss_a"),
        F.sum("dn_b").over(wc).alias("n_b"),
        F.sum("ds_b").over(wc).alias("s_b"),
        F.sum("dss_b").over(wc).alias("ss_b"),
    )
    var_a = (F.col("ss_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("ss_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    z = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1),
        (F.col("s_a") / F.col("n_a") - F.col("s_b") / F.col("n_b"))
        / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
    )
    scored = j.select(
        "day", "event_type", F.round(F.abs(z), 6).alias("z_abs")
    )
    w = Window.partitionBy("day").orderBy(F.desc("z_abs"), F.asc("event_type"))
    crit = "CASE bh_rank " + "".join(
        f"WHEN {i + 1} THEN CAST({c} AS DOUBLE) " for i, c in enumerate(BH_Z_CRIT)
    ) + "END"
    ranked = scored.select(
        "day", "event_type", "z_abs", F.row_number().over(w).alias("bh_rank")
    ).withColumn("z_crit", F.expr(crit))
    # per-day step-up cutoff as a day-partitioned window max — a
    # groupBy+join-back would be a second self-join on the same
    # memory-sink lineage (same analyzer trap as above), and the
    # window computes it in the pass the rank already shuffled for
    kstar = F.max(
        F.when(F.col("z_abs") >= F.col("z_crit"), F.col("bh_rank"))
    ).over(Window.partitionBy("day"))
    return (
        ranked.withColumn("kstar", kstar)
        .select(
            "day",
            "event_type",
            "z_abs",
            "bh_rank",
            F.coalesce(F.col("bh_rank") <= F.col("kstar"), F.lit(False)).alias(
                "rejected"
            ),
        )
        .transform(cells_sorted, "day", "bh_rank")  # days x metrics cells
    )


def bh_daily_oracle(closed_windows_only: bool = True) -> str:
    """Batch SQL twin of bh_daily over raw events; with
    ``closed_windows_only`` the day cells are restricted to windows
    the final watermark closed (the msprt_oracle pattern — the
    streaming twin's append emission never sees the tail day)."""
    from ..functions.portable import hash60_sql

    wm = (
        f"WHERE (day + 1) * {DAY_MS} <= (SELECT max(epoch_ms(ts)) - 60000 FROM events)"
        if closed_windows_only
        else ""
    )
    types = ", ".join(f"('{t}')" for t in BH_TYPES)
    crit = "CASE bh_rank " + "".join(
        f"WHEN {i + 1} THEN CAST({c} AS DOUBLE) " for i, c in enumerate(BH_Z_CRIT)
    ) + "END"
    return f"""
WITH cells0 AS (
  SELECT CAST(floor(epoch_ms(ts) / {DAY_MS}) AS BIGINT) AS day,
         event_type,
         {hash60_sql(f"'{BH_SALT}|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
         CAST(count(1) AS BIGINT) AS n,
         round(sum(value), 6) AS s,
         round(sum(value * value), 6) AS ss
  FROM events WHERE event_type IN ({", ".join(f"'{t}'" for t in BH_TYPES)})
  GROUP BY 1, 2, 3
),
cells AS (SELECT * FROM cells0 {wm}),
zeros AS (
  SELECT d.day, t.event_type, a.arm,
         CAST(0 AS BIGINT) AS n, 0.0 AS s, 0.0 AS ss
  FROM (SELECT DISTINCT day FROM cells) d
  CROSS JOIN (VALUES {types}) t(event_type)
  CROSS JOIN (VALUES (0), (1)) a(arm)
),
dense AS (
  SELECT day, event_type, arm,
         CAST(sum(n) AS BIGINT) AS n, sum(s) AS s, sum(ss) AS ss
  FROM (SELECT * FROM cells UNION ALL SELECT * FROM zeros)
  GROUP BY 1, 2, 3
),
cum AS (
  SELECT day, event_type, arm,
         CAST(sum(n) OVER w AS BIGINT) AS cn, sum(s) OVER w AS cs,
         sum(ss) OVER w AS css
  FROM dense
  WINDOW w AS (PARTITION BY event_type, arm ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
j AS (
  SELECT a.day, a.event_type,
         a.cn AS n_a, a.cs AS s_a, a.css AS ss_a,
         b.cn AS n_b, b.cs AS s_b, b.css AS ss_b
  FROM cum a JOIN cum b ON a.day = b.day AND a.event_type = b.event_type
  WHERE a.arm = 0 AND b.arm = 1
),
scored AS (
  SELECT day, event_type,
         round(CASE WHEN n_a > 1 AND n_b > 1 THEN
           abs((s_a / n_a - s_b / n_b) /
               sqrt(((ss_a - s_a * s_a / n_a) / (n_a - 1)) / n_a
                  + ((ss_b - s_b * s_b / n_b) / (n_b - 1)) / n_b))
         END, 6) AS z_abs
  FROM j
),
ranked AS (
  SELECT day, event_type, z_abs,
         CAST(row_number() OVER (PARTITION BY day
              ORDER BY z_abs DESC NULLS LAST, event_type ASC) AS INTEGER)
           AS bh_rank
  FROM scored
),
cr AS (SELECT *, {crit} AS z_crit FROM ranked),
ks AS (
  SELECT day, max(CASE WHEN z_abs >= z_crit THEN bh_rank END) AS kstar
  FROM cr GROUP BY day
)
SELECT cr.day, cr.event_type, cr.z_abs, cr.bh_rank,
       coalesce(cr.bh_rank <= ks.kstar, FALSE) AS rejected
FROM cr JOIN ks USING (day)
ORDER BY cr.day, cr.bh_rank
"""


MI_BINS = 10  # fixed-width value bins for the MI contingency


def _q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and the (binned) value
    distribution — the feature-relevance measure the χ² independence
    test (q_chi2_independence) only thresholds: MI says HOW MANY nats
    the metric carries about the type (the feature-selection ranking
    criterion; 0 ⇔ independent), alongside the marginal entropies and
    the normalized MI / √(H_x·H_y) that makes values comparable
    across feature pairs. Bins are fixed-width over the observed
    [min, max] (deterministic bounds, no data-dependent quantiles),
    and every per-cell term n_xy·ln(N·n_xy/(n_x·n_y)) is computed
    from exact integer counts — libm ln in VALUES, rounded per term
    before the ≤|X|·|B|-cell sum.

    Scale shape: one events pass to the (type, bin) contingency cells
    (partial-combined); marginals and the 1-row N attach as
    broadcasts of cell aggregates; everything after the scan runs on
    ≤50 cells. Output: one row (n, mi_nats, h_type, h_bin, nmi).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / stats family)."""
    from .dedup import _memo_persist

    def build_cells() -> DataFrame:
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull()
        )
        bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        binned = ev.crossJoin(F.broadcast(bounds)).select(
            "event_type",
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * MI_BINS
                ),
                F.lit(MI_BINS - 1),
            )
            .cast("int")
            .alias("b"),
        )
        return binned.groupBy("event_type", "b").agg(
            F.count(F.lit(1)).alias("nxy")
        )

    # memo-persisted: marginals, total, and the joint-term join all
    # consume the contingency cells — one events scan per session
    cells = _memo_persist(spark, sf_dir, "mi_cells", build_cells)
    mx = cells.groupBy("event_type").agg(F.sum("nxy").alias("nx"))
    mb = cells.groupBy("b").agg(F.sum("nxy").alias("nb"))
    tot = cells.agg(F.sum("nxy").alias("n"))
    j = (
        cells.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    term = F.round(
        F.col("nxy")
        * F.log(
            F.col("n").cast("double")
            * F.col("nxy")
            / (F.col("nx").cast("double") * F.col("nb"))
        ),
        9,
    )
    hterm = lambda cnt: F.round(  # noqa: E731
        cnt * F.log(cnt / F.col("n").cast("double")), 9
    )
    mi = j.agg(
        F.max("n").alias("n"), F.sum(term).alias("s")
    ).select("n", (F.col("s") / F.col("n")).alias("mi"))
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .agg(F.sum(hterm(F.col("nx"))).alias("sx"), F.max("n").alias("n"))
        .select((-F.col("sx") / F.col("n")).alias("h_type"))
    )
    hb = (
        mb.crossJoin(F.broadcast(tot))
        .agg(F.sum(hterm(F.col("nb"))).alias("sb"), F.max("n").alias("n"))
        .select((-F.col("sb") / F.col("n")).alias("h_bin"))
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hb))
        .select(
            "n",
            F.round("mi", 6).alias("mi_nats"),
            F.round("h_type", 6).alias("h_type"),
            F.round("h_bin", 6).alias("h_bin"),
            F.round(
                F.col("mi") / F.sqrt(F.col("h_type") * F.col("h_bin")), 6
            ).alias("nmi"),
        )
    )


def _mutual_info_oracle() -> str:
    return f"""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
binned AS (
  SELECT event_type,
         CAST(least(floor((value - lo) / (hi - lo) * {MI_BINS}),
                    {MI_BINS - 1}) AS INTEGER) AS b
  FROM ev CROSS JOIN bounds
),
cells AS (
  SELECT event_type, b, CAST(count(1) AS BIGINT) AS nxy
  FROM binned GROUP BY 1, 2
),
mx AS (SELECT event_type, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1),
mb AS (SELECT b, CAST(sum(nxy) AS BIGINT) AS nb FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells),
mi AS (
  SELECT max(n) AS n,
         sum(round(nxy * ln(CAST(n AS DOUBLE) * nxy
                            / (CAST(nx AS DOUBLE) * nb)), 9)) AS s
  FROM cells JOIN mx USING (event_type) JOIN mb USING (b) CROSS JOIN tot
),
hx AS (
  SELECT -sum(round(nx * ln(nx / CAST(n AS DOUBLE)), 9)) / max(n) AS h_type
  FROM mx CROSS JOIN tot
),
hb AS (
  SELECT -sum(round(nb * ln(nb / CAST(n AS DOUBLE)), 9)) / max(n) AS h_bin
  FROM mb CROSS JOIN tot
)
SELECT mi.n, round(mi.s / mi.n, 6) AS mi_nats,
       round(hx.h_type, 6) AS h_type, round(hb.h_bin, 6) AS h_bin,
       round((mi.s / mi.n) / sqrt(hx.h_type * hb.h_bin), 6) AS nmi
FROM mi CROSS JOIN hx CROSS JOIN hb
"""


def _ranked_memo(spark: SparkSession, sf_dir: str, tag: str, build) -> DataFrame:
    """Memo-persist a two-pass rank relation WITHOUT double-caching:
    :func:`sampling.global_prefix_sums` persists its internal ranged
    relation (the spark_partition_id projection must not be recomputed
    between the totals pass and the join-back), but once the OUTER
    relation is eagerly materialized into the memo cache that scratch
    copy is pure storage overhead — release it. A later eviction of
    the memo recomputes through the unpersisted ranged subtree, which
    is deterministic (range boundaries come from seeded sampling over
    a deterministic aggregate), so correctness does not depend on the
    scratch persist."""
    from .dedup import _memo_persist

    scratch: list[DataFrame] = []

    def keep(inner_build):
        df = inner_build().persist()
        scratch.append(df)
        return df

    out = _memo_persist(spark, sf_dir, tag, lambda: build(keep))
    for df in scratch:  # non-empty only on the building call
        df.unpersist()
    return out


def _etv_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, value, c, cum): per-type value cells with the
    INCLUSIVE within-type cumulative count — ONE memo-persisted
    grouped two-pass prefix sum (sampling.global_prefix_sums
    part=event_type) shared by the whole per-type rank-statistics
    family (q_trimmed_mean, q_winsorized_mean,
    q_percentile_distributed, q_percentile_interp; the global-rank
    family derives its pooled cells from this relation too).

    r11 (guide §5 reuse): each consumer previously rebuilt the same
    events scan → (type, value) cell aggregation → range exchange →
    local window chain and persisted its own ranged copy — four
    near-identical cached relations and four window passes per bench
    sweep. One shared relation runs the chain once (cold construction
    pays it, the declared shared-index contract); every consumer is
    now a cheap aggregate over the cached cells. The exclusive form
    any consumer needs is ``cum - c`` (longs — exact)."""
    from .sampling import global_prefix_sums

    def build(keep) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
        cells = ev.groupBy("event_type", "value").agg(
            F.count(F.lit(1)).alias("c")
        )
        return global_prefix_sums(
            cells,
            ["value"],
            {"cum": "c"},
            part=("event_type",),
            inclusive=True,
            memo=keep,
        )

    return _ranked_memo(spark, sf_dir, "etv_rank", build)


def _value_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(value, t, ca, cb, tab, gcs, cum, fa, fb, cum_ab): pooled
    per-value cells with FOUR inclusive global running sums in one
    window pass — t/cum the pooled totals (q_kruskal ranks,
    q_histogram_equidepth depths), ca/cb/fa/fb the MW_A/MW_B sample
    counts (q_ks_test ECDFs), tab/cum_ab the pooled A∪B subset
    (q_rank_test ranks) — plus the ≤|types| per-type count structs
    (``gcs``) q_kruskal's per-group rank sums explode.

    Derived FROM the memoized per-type relation (:func:`_etv_rank`) by
    one value-keyed re-aggregation, so the events source is scanned
    once for the entire rank-statistics family. Consumers that
    formerly aggregated only the A∪B subset see extra rows with
    tab = 0; those contribute exact zeros to every sum they take
    (ca = cb = 0, tab³ − tab = 0) and duplicate a neighbour's ECDF
    step in q_ks_test's max — bit-identical outputs (each consumer's
    oracle pins this)."""
    from .sampling import global_prefix_sums

    def build(keep) -> DataFrame:
        cells = (
            _etv_rank(spark, sf_dir)
            .groupBy("value")
            .agg(
                F.sum("c").alias("t"),
                F.sum(
                    F.when(F.col("event_type") == MW_A, F.col("c")).otherwise(
                        F.lit(0)
                    )
                ).alias("ca"),
                F.sum(
                    F.when(F.col("event_type") == MW_B, F.col("c")).otherwise(
                        F.lit(0)
                    )
                ).alias("cb"),
                F.collect_list(
                    F.struct(F.col("event_type").alias("g"), F.col("c"))
                ).alias("gcs"),
            )
            .withColumn("tab", F.col("ca") + F.col("cb"))
        )
        return global_prefix_sums(
            cells,
            ["value"],
            {"cum": "t", "fa": "ca", "fb": "cb", "cum_ab": "tab"},
            inclusive=True,
            memo=keep,
        )

    return _ranked_memo(spark, sf_dir, "value_rank", build)


KW_CRIT = {
    1: 3.841459,
    2: 5.991465,
    3: 7.814728,
    4: 9.487729,
    5: 11.070498,
    6: 12.591587,
    7: 14.06714,
    8: 15.507313,
}


def _q_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test across ALL event types' value
    distributions (Kruskal & Wallis 1952) — the k-sample extension of
    q_rank_test's Mann-Whitney: one omnibus answer to "do ANY of the
    k metric distributions differ?" before pairwise drill-down (which
    q_bh_fdr then corrects). H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1)
    with the tie correction 1 − Σ(t³−t)/(N³−N); significance against
    the χ²(k−1) 95% critical value (shared literal lookup — the
    q_srm/q_logrank discipline, no libm CDF).

    Scale shape: the q_rank_test cell form generalized — per-
    (value, type) counts partial-combine map-side; global ranks come
    from the DISTRIBUTED two-pass prefix sum over the pooled cell
    relation (sampling.global_prefix_sums — r7: events.value is
    continuous, NDV ≈ 66% of rows, so the old single running-sum
    window was an O(N) single-task sort at 100×); per-group rank sums
    are exact half-integer arithmetic until the final divisions, so
    the H-vs-critical comparison needs no rounding gate. Output: one
    row (k, n, h_stat, h_corrected, significant).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / stats family)."""
    # r11 (guide §2.3/§2.4, then §5): the per-(value, group) counts
    # ride the value cells THROUGH the two-pass rank as a ≤k-entry
    # struct array (k = |event types|), so the per-group rank sums
    # explode them off the ranked relation instead of re-deriving
    # gcells and joining it back on the ~NDV(value) hash; the ranked
    # relation itself is the family-shared memo (_value_rank — one
    # events pass and one window ladder for the whole rank family).
    # Exclusive prefix = cum − t (longs, exact).
    ranked = _value_rank(spark, sf_dir).select(
        "value",
        "t",
        "gcs",
        (F.col("cum") - F.col("t") + (F.col("t") + 1) / 2.0).alias("avg_rank"),
    )
    per_g = (
        ranked.select(F.explode("gcs").alias("e"), "avg_rank")
        .groupBy(F.col("e.g").alias("g"))
        .agg(
            F.sum("e.c").alias("n_g"),
            F.sum(F.col("e.c") * F.col("avg_rank")).alias("r_g"),
        )
    )
    # t³ and n³ computed in DOUBLE on BOTH engines, same op order —
    # int64 wraps silently past 9.2e18 (one hot value / n ≥ ~2.1M
    # would overflow t³/n³ at 100×; the Σgap² lesson). Tie sums read
    # the helper-persisted ranked relation, not a vcells re-derivation.
    td = F.col("t").cast("double")
    ties = ranked.agg(F.sum(td * td * td - td).alias("tie3"))
    agg = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g")).alias("rr"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n").cast("double")
    h = F.lit(12.0) / (n * (n + 1)) * F.col("rr") - 3.0 * (n + 1)
    corr = F.lit(1.0) - F.col("tie3") / (n * n * n - n)
    hc = h / corr
    crit = "CASE k " + "".join(
        f"WHEN {df + 1} THEN CAST({c} AS DOUBLE) " for df, c in KW_CRIT.items()
    ) + "END"
    return agg.select(
        "k",
        "n",
        F.round(h, 6).alias("h_stat"),
        F.round(hc, 6).alias("h_corrected"),
        (hc > F.expr(crit)).alias("significant"),
    )


def kruskal_oracle() -> str:
    crit = "CASE k " + "".join(
        f"WHEN {df + 1} THEN CAST({c} AS DOUBLE) " for df, c in KW_CRIT.items()
    ) + "END"
    return f"""
WITH gcells AS (
  SELECT value, event_type AS g, CAST(count(1) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
vcells AS (SELECT value, CAST(sum(c) AS BIGINT) AS t FROM gcells GROUP BY 1),
ranked AS (
  SELECT value,
         coalesce(CAST(sum(t) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
         + (t + 1) / 2.0 AS avg_rank
  FROM vcells
),
per_g AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n_g, sum(c * avg_rank) AS r_g
  FROM gcells JOIN ranked USING (value) GROUP BY g
),
ties AS (
  SELECT sum(CAST(t AS DOUBLE) * t * t - CAST(t AS DOUBLE)) AS tie3 FROM vcells
),
agg AS (
  SELECT CAST(count(1) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
         sum(r_g * r_g / n_g) AS rr
  FROM per_g
)
SELECT k, n,
       round(12.0 / (n * (n + 1.0)) * rr - 3.0 * (n + 1.0), 6) AS h_stat,
       round((12.0 / (n * (n + 1.0)) * rr - 3.0 * (n + 1.0))
             / (1.0 - tie3 / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_corrected,
       ((12.0 / (n * (n + 1.0)) * rr - 3.0 * (n + 1.0))
        / (1.0 - tie3 / (CAST(n AS DOUBLE) * n * n - n))) > ({crit}) AS significant
FROM agg CROSS JOIN ties
"""


def _q_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimation (Chao 1984) over the document
    shingle population — the scale-planning tool for dedup: from a
    SAMPLE's shingle frequency histogram, estimate how many DISTINCT
    shingles the full corpus holds (Ŝ = S_obs + f1²/(2·f2), with f1 =
    singletons, f2 = doubletons), hence how much of the dedup work is
    still unseen. At 100 TB you run this on a 0.1% sample to budget
    the shingle-index shuffle BEFORE paying for it.

    Two tiny aggregations over the memoized shingle relation: shingle
    → occurrence count, then the frequency-of-frequencies histogram —
    shuffles carry one row per distinct shingle, then one per distinct
    count. All-integer inputs to the final arithmetic; the estimate is
    rounded on both engines."""
    from .dedup import _shingled_cached

    sh = _shingled_cached(spark, sf_dir)
    occ = (
        sh.select(F.explode("sh").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = occ.groupBy("c").agg(F.count(F.lit(1)).alias("f"))
    return fof.agg(
        F.sum("f").alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, F.col("f")).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, F.col("f")).otherwise(0)).alias("f2"),
    ).select(
        "s_obs",
        "f1",
        "f2",
        F.round(
            F.col("s_obs")
            + (F.col("f1") * F.col("f1")).cast("double")
            / (2.0 * F.greatest(F.col("f2"), F.lit(1))),
            4,
        ).alias("chao1_est"),
    )


PSI_BINS = 10
PSI_BIN_W = 20.0  # events.value spans ~[0, 200)
PSI_ALERT = 0.2  # the standard "significant shift" threshold


def _q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index drift audit: each event type's value
    distribution vs the overall population over PSI_BINS fixed-width
    bins, PSI = Σ (p_t − p_all)·ln(p_t/p_all) with Laplace smoothing
    ((c+1)/(n+B)) so empty bins never hit ln(0) — the standard
    model-monitoring drift score, fixed bins rather than quantiles so
    both engines bucket identically. Two aggregations (type×bin cells,
    then per-type fold over ≤B rows) — shuffles carry bins, not rows."""
    ev = load_table(spark, sf_dir, "events")
    b = F.least(F.lit(PSI_BINS - 1), F.floor(F.col("value") / PSI_BIN_W)).cast("int")
    cells = ev.select("event_type", b.alias("b")).groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot_t = cells.groupBy("event_type").agg(F.sum("c").alias("n_t"))
    tot_all = cells.agg(F.sum("c").alias("n_all"), F.lit(1).alias("one"))
    all_b = cells.groupBy("b").agg(F.sum("c").alias("c_all")).withColumn("one", F.lit(1))
    # dense (type × bin) grid so missing bins get the smoothed floor
    types = tot_t.select("event_type")
    grid = types.crossJoin(spark.range(PSI_BINS).select(F.col("id").cast("int").alias("b")))
    j = (
        grid.join(cells, ["event_type", "b"], "left")
        .join(tot_t, "event_type")
        .join(all_b.drop("one"), "b", "left")
        .crossJoin(F.broadcast(tot_all.drop("one")))
    )
    p_t = (F.coalesce("c", F.lit(0)) + 1).cast("double") / (F.col("n_t") + PSI_BINS)
    p_a = (F.coalesce("c_all", F.lit(0)) + 1).cast("double") / (F.col("n_all") + PSI_BINS)
    term = (p_t - p_a) * F.log(p_t / p_a)
    return (
        j.select("event_type", term.alias("term"))
        .groupBy("event_type")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select("event_type", "psi", (F.col("psi") > PSI_ALERT).alias("drifted"))
    )


MAD_K = 1.4826  # normal-consistency constant
MAD_CUT = 3.5  # the standard robust-z threshold (Iglewicz-Hoaglin)


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    heavy-tail-safe complement to the 3-sigma filter (q_outliers): mean
    and stddev are themselves dragged by the outliers they are supposed
    to find; median/MAD have a 50% breakdown point. Per event type:
    median, MAD, and the count of values whose robust z-score
    |x − med| / (1.4826·MAD) exceeds 3.5.

    Scale shape: exact medians are two passes over the (type, value)
    relation (percentile shuffles values per type — at 100 TB swap in
    approx_percentile through the same seam); the flag pass is a
    broadcast join of the 5-row stats relation back onto the scan.
    Threshold comparison happens on ROUNDED stats so both engines cut
    identically (the avg-threshold policy of q_tpch_q17/q22)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .select("event_type", F.abs(F.col("value") - F.col("med")).alias("ad"))
        .groupBy("event_type")
        .agg(F.round(F.percentile("ad", F.lit(0.5)), 6).alias("mad"))
    )
    stats = med.select("event_type", F.round("med", 6).alias("med")).join(mad, "event_type")
    z = F.abs(F.col("value") - F.col("med")) / (MAD_K * F.col("mad"))
    # MAD = 0 (more than half the values identical) makes z NULL on
    # both engines and would silently report zero outliers for exactly
    # the degenerate distribution this audit exists to catch — fall
    # back to flagging ANY deviation from the median (the conservative
    # end of the Iglewicz-Hoaglin meanAD fallback)
    is_out = F.when(F.col("mad") == 0, F.col("value") != F.col("med")).otherwise(
        z > MAD_CUT
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
        )
    )






TRIM_FRAC = 0.05  # two-sided trim fraction


def _q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided trimmed mean per event type — the third robust
    location estimate alongside 3-sigma (q_outliers) and median/MAD
    (q_mad_outliers): drop the top and bottom TRIM_FRAC of values by
    percent_rank, average the core. The robustness/efficiency
    sweet-spot for heavy-tailed metrics where the mean is hostage to
    outliers but the median wastes data.

    Engine parity: percent_rank depends only on the VALUE's rank, so
    ties get identical ranks on both engines and the trim boundary
    cuts identically. Scale shape (r7 rewrite, VERDICT r6 item 3):
    events aggregate to (event_type, value) CELLS first — the old
    per-type percent_rank window ordered O(N/|types|) RAW rows in one
    task per type; the cell form reproduces percent_rank exactly
    (rank of every row in a tied cell = cum_before + 1, so
    pr = cum_before/(n_type − 1)) with the grouped distributed
    two-pass prefix sum (sampling.global_prefix_sums part=event_type)
    and weighted cell aggregates. Output: (event_type, n_total,
    n_kept, mean_all, trimmed_mean)."""
    # NULL values are dropped on BOTH engines (rank statistics are
    # undefined on missing data, and the two engines place a NULL cell
    # at opposite ends of the value order). r11: the cells + grouped
    # two-pass prefix sum now come from the family-shared memo
    # (_etv_rank); the exclusive prefix this query ranks by is
    # cum − c (longs, exact).
    cum = _etv_rank(spark, sf_dir).withColumn(
        "cum_before", F.col("cum") - F.col("c")
    )
    n_type = cum.groupBy("event_type").agg(F.sum("c").alias("n_type"))
    # percent_rank = (rank−1)/(N−1), rank(all rows of a tied cell) =
    # cum_before + 1; N=1 → percent_rank defines 0 (guard: Spark's
    # divide-by-zero yields NULL and would silently drop the row)
    pr = F.when(
        F.col("n_type") > 1, F.col("cum_before") / (F.col("n_type") - 1)
    ).otherwise(F.lit(0.0))
    keep = (pr >= TRIM_FRAC) & (pr <= 1.0 - TRIM_FRAC)
    return (
        cum.join(F.broadcast(n_type), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("c").alias("n_total"),
            F.sum(F.when(keep, F.col("c")).otherwise(F.lit(0))).alias("n_kept"),
            F.round(
                F.sum(F.col("c") * F.col("value")) / F.sum("c"), 4
            ).alias("mean_all"),
            F.round(
                F.sum(F.when(keep, F.col("c") * F.col("value")))
                / F.sum(F.when(keep, F.col("c"))),
                4,
            ).alias("trimmed_mean"),
        )
    )



WINSOR_FRAC = 0.05  # two-sided winsorization fraction


def _q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided winsorized mean per event type — the fourth robust
    location estimate (3-sigma q_outliers / median-MAD q_mad_outliers
    / trim q_trimmed_mean / THIS): instead of DROPPING the tails like
    the trimmed mean, CLAMP them to the [p05, p95] boundary values —
    every observation still counts, so the estimator wastes less data
    on near-clean distributions while staying bounded-influence (one
    wild row moves the mean by at most (hi−lo)/n). The boundaries are
    exact percentile_disc selections (the q_percentile_distributed
    rank rule: smallest value whose inclusive cumulative count reaches
    ⌈q·n⌉), so clamp points are actual data values and both engines
    agree bit-for-bit before the final rounded division.

    Scale shape: one partial-agg exchange to (type, value) cells; ONE
    grouped two-pass prefix sum (sampling.global_prefix_sums
    part=event_type) serves both boundary selections; the winsorized
    sum is a weighted cell aggregate against the ≤|types|-row
    broadcast bounds — no per-type sort buffer anywhere, flat under
    the 0.8·N dominant-type skew corpus.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / stats family)."""
    # r11: the cells + grouped two-pass prefix sum come from the
    # family-shared memo (_etv_rank) — the source is scanned once for
    # the whole rank family, and this query is the weighted aggregate
    # over the cached cells.
    cum = _etv_rank(spark, sf_dir)
    n_type = cum.groupBy("event_type").agg(F.sum("c").alias("n"))
    j = cum.join(F.broadcast(n_type), "event_type")
    lo_rank = F.ceil(F.lit(WINSOR_FRAC) * F.col("n"))
    hi_rank = F.ceil(F.lit(1.0 - WINSOR_FRAC) * F.col("n"))
    bounds = j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= lo_rank, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("value"))).alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return (
        cum.select("event_type", "value", "c")
        .join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("lo"), 4).alias("lo_bound"),
            F.round(F.max("hi"), 4).alias("hi_bound"),
            F.round(F.sum(F.col("c") * F.col("value")) / F.max("n"), 4).alias(
                "mean_all"
            ),
            F.round(F.sum(F.col("c") * clamped) / F.max("n"), 4).alias(
                "winsorized_mean"
            ),
        )
        .transform(cells_sorted, "event_type")  # <= |event types| rows
    )


def _winsorized_oracle() -> str:
    return f"""
WITH cells AS (
  SELECT event_type, value, CAST(count(1) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT event_type, value, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM cells
),
nt AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
bounds AS (
  SELECT event_type, max(n) AS n,
         min(CASE WHEN cum >= ceil({WINSOR_FRAC} * n) THEN value END) AS lo,
         min(CASE WHEN cum >= ceil({1.0 - WINSOR_FRAC} * n) THEN value END) AS hi
  FROM cum JOIN nt USING (event_type) GROUP BY event_type
)
SELECT event_type, max(n) AS n,
       round(max(lo), 4) AS lo_bound, round(max(hi), 4) AS hi_bound,
       round(sum(c * value) / max(n), 4) AS mean_all,
       round(sum(c * greatest(lo, least(hi, value))) / max(n), 4)
         AS winsorized_mean
FROM cells JOIN bounds USING (event_type)
GROUP BY event_type ORDER BY event_type
"""


MW_A, MW_B = "click", "purchase"  # the two samples under test


def _q_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (two-sided, normal approximation
    with tie correction) between two event types' value
    distributions — the nonparametric A/B answer to "did the metric
    distribution actually shift?" that pairs with q_bootstrap_ci's
    error bars: no normality assumption, rank-based, exact under
    ties. Average ranks are rank() + (ties−1)/2 — pure rank
    arithmetic, so both engines agree exactly before any float op.

    Scale shape (r5 rewrite, VERDICT r4 item 3): the rank window runs
    over (value, count_a, count_b) CELLS, not event rows — the
    distinct-value aggregation partial-combines map-side first, and
    the single-partition running-sum window (global ranks are a
    prefix by construction) then orders O(distinct values) cells
    instead of every filtered event (the q_ks_test pattern; the
    row-level form was the WindowExec single-partition scale hazard
    the r4 verdict flagged). Per cell the t tied rows all take
    average rank cum_before + (t+1)/2, so the sample-A rank sum is
    sum(ca * (cum_before + (t+1)/2)) — ranks are half-integers,
    exactly representable, so the cell form is bit-identical to the
    row form. Output: one row (n_a, n_b, u_stat, z_score,
    cliffs_delta, significant)."""
    # r11: ranks come from the family-shared memo (_value_rank) — the
    # pooled A∪B cells are its (ca, cb, tab, cum_ab) projection; rows
    # with tab = 0 (values seen only in OTHER event types) contribute
    # exact zeros to every sum the finisher takes, so the statistics
    # are bit-identical to ranking the filtered subset directly.
    with_rank = _value_rank(spark, sf_dir).select(
        "ca",
        "cb",
        F.col("tab").alias("t"),
        (F.col("cum_ab") - F.col("tab")).alias("cum_before"),
    )
    return _mw_finish(with_rank)


def mann_whitney(ev: DataFrame, group_col: str, value_col: str, a_label) -> DataFrame:
    """Core of q_rank_test over any (group, value) relation where
    ``group == a_label`` marks sample A and everything else sample B —
    seam for the property suite (tests/test_mannwhitney_property.py).

    Global rank prefix sums come from the distributed two-pass form
    (sampling.global_prefix_sums), not a single running-sum window:
    the value column is continuous (NDV ≈ 66% of rows on the events
    fixture), so the cell relation is O(N) and the old unpartitioned
    window was a single-task sort at scale (VERDICT r6 item 1).
    NULL values are dropped (rank statistics are undefined on missing
    data; the engines also place a NULL cell at opposite ends)."""
    from .sampling import global_prefix_sums

    ev = ev.filter(F.col(value_col).isNotNull())
    cells = ev.groupBy(F.col(value_col).alias("value")).agg(
        F.sum((F.col(group_col) == a_label).cast("long")).alias("ca"),
        F.sum((F.col(group_col) != a_label).cast("long")).alias("cb"),
    )
    t = F.col("ca") + F.col("cb")
    with_rank = global_prefix_sums(
        cells.select("value", "ca", "cb", t.alias("t")),
        ["value"],
        {"cum_before": "t"},
    ).select("ca", "cb", "t", "cum_before")
    return _mw_finish(with_rank)


def _mw_finish(with_rank: DataFrame) -> DataFrame:
    """Mann-Whitney statistics from a ranked cell relation
    (ca, cb, t, cum_before) — the finisher :func:`mann_whitney` and
    q_rank_test's shared-memo path both feed. Rows with t = 0 are
    permitted: they contribute exact zeros to every aggregate."""
    avg_rank = F.col("cum_before") + (F.col("t") + 1) / 2.0
    j = with_rank.groupBy().agg(
        F.sum(F.col("ca") * avg_rank).alias("r_a"),
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    n = F.col("n_a") + F.col("n_b")
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    mu = F.col("n_a") * F.col("n_b") / 2.0
    var = (
        F.col("n_a")
        * F.col("n_b")
        / 12.0
        * ((n + 1) - F.col("tie3") / (n * (n - 1)))
    )
    # var == 0 ⇔ every pooled value tied: the test is undefined — NULL
    # z, not an ANSI divide-by-zero (surfaced by the property suite;
    # unreachable on the events fixture, oracle shares the semantics)
    z = F.when(var > 0, (u - mu) / F.sqrt(var))
    delta = F.lit(2.0) * u / (F.col("n_a") * F.col("n_b")) - F.lit(1.0)
    return j.select(
        "n_a",
        "n_b",
        F.round(u, 4).alias("u_stat"),
        F.round(z, 4).alias("z_score"),
        # Cliff's delta: the effect SIZE the z-score lacks (at corpus
        # scale everything is "significant"; delta says how much)
        F.round(delta, 4).alias("cliffs_delta"),
        (F.abs(z) > 1.959963984540054).alias("significant"),
    )



def _q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the same two
    event-type value distributions as q_rank_test — the SHAPE
    complement to its location test: D = max |ECDF_a − ECDF_b| over
    the pooled support reacts to variance/modality differences a
    rank-sum test can miss. Significance at α=0.05 via the classic
    c(α)·√((n_a+n_b)/(n_a·n_b)) critical value.

    Scale shape: per distinct pooled value, cumulative per-sample
    counts via the DISTRIBUTED two-pass prefix sum over the
    distinct-value relation (cells, not rows: the distinct agg
    partial-aggregates first; sampling.global_prefix_sums — the value
    column is continuous, so the old single running-sum window was an
    O(N) single-task sort, VERDICT r6 item 1), then a 1-row max. All
    arithmetic is integer counts until the final divisions. Output:
    (n_a, n_b, d_stat, d_crit, significant)."""
    # r11: the per-sample cumulative counts come from the family-shared
    # memo (_value_rank). Rows for values outside the A∪B samples carry
    # the previous sample point's (fa, fb) — a duplicated ECDF step
    # that cannot change the max — and exact zero (ca, cb) for the
    # totals, so D and both sample sizes are bit-identical.
    cum = _value_rank(spark, sf_dir)
    tot = cum.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    d = (
        cum.select("fa", "fb")
        .crossJoin(F.broadcast(tot))
        .select(
            F.abs(F.col("fa") / F.col("n_a") - F.col("fb") / F.col("n_b")).alias("d"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("d").alias("d_stat"))
    )
    crit = F.lit(1.3581015157406195) * F.sqrt(
        (F.col("n_a") + F.col("n_b")) / (F.col("n_a") * F.col("n_b"))
    )
    return d.select(
        "n_a",
        "n_b",
        F.round("d_stat", 6).alias("d_stat"),
        F.round(crit, 6).alias("d_crit"),
        (F.col("d_stat") > crit).alias("significant"),
    )



def _q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² test of independence between document language and source —
    the provenance-balance check: a significant χ² means languages
    are NOT spread evenly across sources, so per-source sampling
    decisions (q_lang_mix, q_sample_weighted) silently reweight
    languages too. Expected cells from the margins, χ² = Σ(O−E)²/E;
    the α=0.05 critical value is the Wilson-Hilferty approximation
    for the observed dof, embedded as one shared literal per engine
    pair (no chi-square tables in either engine).

    Scale shape: one (lang, source) contingency aggregation — cells
    in every later step; margins and totals are tiny re-aggregations
    of the cell relation. Output: (n_docs, n_cells, dof, chi2,
    chi2_crit, significant)."""
    import math as _m

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("lang").agg(F.sum("o").alias("rn"))
    cols_ = cells.groupBy("source").agg(F.sum("o").alias("cn"))
    tot = cells.agg(F.sum("o").alias("n"))
    dims = cells.agg(
        F.countDistinct("lang").alias("nl"), F.countDistinct("source").alias("ns"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    # the zero-observed cells of the full grid still contribute E to
    # χ²; build the complete lang×source grid from the margins
    grid = rows_.crossJoin(cols_)
    full = (
        grid.join(cells, ["lang", "source"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.coalesce("o", F.lit(0))).alias("o"),
            (F.col("rn") * F.col("cn") / F.col("n")).alias("e"),
        )
    )
    chi2 = full.agg(
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias("chi2")
    )
    z95 = 1.6448536269514722
    dof = (F.col("nl") - 1) * (F.col("ns") - 1)
    crit = dof * F.pow(
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dof)
        + F.lit(z95) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof)),
        F.lit(3.0),
    )
    out = (
        tot.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(chi2))
        .select(
            F.col("n").alias("n_docs"),
            "n_cells",
            dof.alias("dof"),
            F.round("chi2", 4).alias("chi2"),
            F.round(crit, 4).alias("chi2_crit"),
            (F.col("chi2") > crit).alias("significant"),
        )
    )
    return out



def _q_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: hourly volume
    shares plus the peak/trough hours and their ratio — the calendar
    rhythm that sizes streaming capacity (watermark delays, trigger
    intervals, autoscaling floors) and flags bot traffic (a flat
    profile where humans are diurnal is a red flag).

    Scale shape: one (type, hour) cell aggregation; everything after
    re-aggregates the ≤ 24·|types| cells. Output: one row per type
    (event_type, peak_hour, peak_n, trough_hour, trough_n,
    peak_trough_ratio, n_hours_seen)."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    wp = Window.partitionBy("event_type").orderBy(F.desc("c"), F.asc("h"))
    wt = Window.partitionBy("event_type").orderBy(F.asc("c"), F.asc("h"))
    ranked = cells.select(
        "event_type", "h", "c",
        F.row_number().over(wp).alias("rp"),
        F.row_number().over(wt).alias("rt"),
    )
    peak = ranked.filter(F.col("rp") == 1).select(
        "event_type", F.col("h").alias("peak_hour"), F.col("c").alias("peak_n")
    )
    trough = ranked.filter(F.col("rt") == 1).select(
        "event_type", F.col("h").alias("trough_hour"), F.col("c").alias("trough_n")
    )
    seen = cells.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_hours_seen"))
    return (
        peak.join(trough, "event_type")
        .join(seen, "event_type")
        .select(
            "event_type", "peak_hour", "peak_n", "trough_hour", "trough_n",
            F.round(F.col("peak_n") / F.col("trough_n"), 4).alias("peak_trough_ratio"),
            "n_hours_seen",
        )
    )


import math as _math

BOOT_B = 32  # bootstrap replicas
BOOT_SALT = "okss-boot-v1"
#: Poisson(1) CDF thresholds (inverse-CDF weight lookup, weights 0..7)
_POIS_CDF = tuple(
    sum(_math.exp(-1) / _math.factorial(i) for i in range(k + 1)) for k in range(7)
)


def _q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for a corpus metric (the
    mean event value) — the at-scale bootstrap (Chamandy et al. 2012,
    "Estimating uncertainty for massive data streams", the
    map-reduce-friendly replacement for resampling): each of BOOT_B
    replicas weights every row by an independent Poisson(1) draw, so
    one corpus pass computes all replica means and the CI is the
    spread of the 32 replica statistics. Error bars are what make a
    curation metric decision-grade ("did the gate move the mean or is
    that noise?"), and at 100 TB this is the only bootstrap you can
    afford.

    The draws are DERIVED (inverse Poisson CDF over the hash-uniform
    of (salt, event_id, replica)) so the release is reproducible and
    the oracle recomputes it bit-for-bit — the same honesty trade as
    q_dp_histogram; swap one line for a real RNG in production.

    Scale shape: a BOOT_B-way map-side explode aggregated to BOOT_B
    (sum, count) cells — the shuffle carries replicas, not rows; the
    CI is a sorted pick over the 32-cell relation. Output: one row
    (n_rows, point_mean, boot_lo, boot_hi, n_replicas)."""
    ev = load_table(spark, sf_dir, "events")
    rep = ev.select("event_id", "value").crossJoin(
        spark.range(BOOT_B).select(F.col("id").cast("int").alias("b"))
    )
    u = hash60(
        F.concat(
            F.lit(BOOT_SALT),
            F.lit("|"),
            F.col("event_id").cast("string"),
            F.lit("|"),
            F.col("b").cast("string"),
        )
    ) / F.lit(2.0**60)
    w = F.lit(len(_POIS_CDF))
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    means = (
        rep.select("b", "value", w.alias("w"))
        .groupBy("b")
        .agg(
            F.round(F.sum(F.col("w") * F.col("value")) / F.sum("w"), 6).alias("m")
        )
    )
    ci = means.agg(F.sort_array(F.collect_list("m")).alias("ms")).select(
        # min/max of 32 sorted replica means = the ~3.1/96.9 empirical
        # percentiles — the WIDEST (most conservative) cut 32 replicas
        # support. (Round-3 advice: elements 2 and 31 were ~4.7/95.3,
        # systematically NARROWER than the nominal 95% the comment
        # claimed; min/max errs wide instead of narrow.)
        F.element_at("ms", 1).alias("boot_lo"),
        F.element_at("ms", BOOT_B).alias("boot_hi"),
    )
    point = ev.agg(
        F.count(F.lit(1)).alias("n_rows"), F.round(F.avg("value"), 6).alias("point_mean")
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_rows", "point_mean", "boot_lo", "boot_hi", F.lit(BOOT_B).alias("n_replicas")
    )


def _q_signal_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal redundancy audit: the Pearson correlation matrix
    of four cheap per-document quality signals (token count,
    type-token ratio, stopword ratio, mean word length) — the
    measurement behind 'which gates are redundant?': two signals with
    |ρ| ≈ 1 gate the same documents, so a pipeline keeps one and
    drops the compute for the other. Run it before composing gate
    ensembles (q_clean_pipeline, q_prepare_training).

    Scale shape: one pass over the memoized token projection computes
    all four signals map-side; the corr() aggregates are partial+final
    over ONE exchange of sufficient-statistic cells (Spark's corr and
    DuckDB's corr both stream (n, Σx, Σy, Σxy, …) — already proven to
    hash-match under rounding in q_stats_agg). Output: one row of the
    six pairwise correlations."""
    from ..functions.textfns import stopword_count
    from .text import _tokenized

    base = _tokenized(spark, sf_dir).filter(F.size("t") > 0)
    chars = F.aggregate(
        F.transform("t", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    sig = base.select(
        F.size("t").cast("double").alias("nt"),
        (F.size(F.array_distinct("t")) / F.size("t")).alias("ttr"),
        (stopword_count(F.col("t")) / F.size("t")).alias("stop"),
        (chars / F.size("t")).alias("mw"),
    )
    return sig.agg(
        F.round(F.corr("nt", "ttr"), 4).alias("nt_ttr"),
        F.round(F.corr("nt", "stop"), 4).alias("nt_stop"),
        F.round(F.corr("nt", "mw"), 4).alias("nt_mw"),
        F.round(F.corr("ttr", "stop"), 4).alias("ttr_stop"),
        F.round(F.corr("ttr", "mw"), 4).alias("ttr_mw"),
        F.round(F.corr("stop", "mw"), 4).alias("stop_mw"),
    )

def _q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the linear quality classifier's margin
    (curation.classifier_scores) as a ranker for English documents —
    the threshold-free eval a corpus team runs before picking the
    q_quality_classifier cutoff: AUC = P(margin_en > margin_other)
    + ½·P(tie), computed exactly from rank sums (AUC is the
    Mann-Whitney U normalized by n_pos·n_neg — Hanley & McNeil 1982),
    plus the Gini coefficient 2·AUC − 1.

    Scale shape: the same cell trick as q_rank_test — scores
    aggregate to (margin, n_pos, n_neg) CELLS first (map-side
    partial combine), the distributed two-pass prefix sum
    (sampling.global_prefix_sums) then ranks the O(distinct margins)
    cells without a global window (margins are continuous, so the
    cell relation is O(N) — VERDICT r6 item 1), and rank arithmetic
    stays on integers/half-integers until the final
    division, so both engines agree bit-exactly. The margin is the
    already-proven cross-engine-deterministic linear head (grouping
    on its round-6 value is exactly the hash the q_quality_classifier
    oracle already matches per doc). Output: one row (n_pos, n_neg,
    auc, gini).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / model-eval family)."""
    from .curation import classifier_scores
    from .sampling import global_prefix_sums
    from .text import _tokenized

    base = _tokenized(spark, sf_dir, "source", "lang").filter(F.size("t") > 0)
    scored = classifier_scores(base, extra=("lang",))
    cells = scored.groupBy(F.col("margin").alias("value")).agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("cp"),
        F.sum((F.col("lang") != "en").cast("long")).alias("cn"),
    )
    t = F.col("cp") + F.col("cn")
    ranked = global_prefix_sums(
        cells.select("value", "cp", "cn", t.alias("t")),
        ["value"],
        {"cum_before": "t"},
    ).select("cp", "cn", "t", "cum_before")
    avg_rank = F.col("cum_before") + (F.col("t") + 1) / 2.0
    j = ranked.groupBy().agg(
        F.sum(F.col("cp") * avg_rank).alias("r_pos"),
        F.sum("cp").alias("n_pos"),
        F.sum("cn").alias("n_neg"),
    )
    u = F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    auc = u / (F.col("n_pos") * F.col("n_neg"))
    return j.select(
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(F.lit(2.0) * auc - 1.0, 6).alias("gini"),
    )


POWER_MDES = (0.02, 0.05, 0.1, 0.2)  # relative minimum detectable effects
POWER_Z = 1.959964 + 0.841621  # z_{alpha/2}=1.96 (5%) + z_beta (80% power)


def _q_power_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size planner — the step BEFORE q_srm/q_msprt
    run: for a grid of relative minimum detectable effects, the
    per-arm sample size n = 2σ²(z_{α/2}+z_β)²/Δ² of the classic
    two-sample power calculation (α = 5 % two-sided, 80 % power; the
    z-sum is a shared literal so no engine's inverse-CDF participates)
    and the days of first-exposure traffic needed to reach it at the
    corpus's observed enrollment rate. σ² and the mean come from
    per-user metric sums (the experiment unit is the user — q_srm's
    lesson), so the planner answers 'how long must this test run to
    see a 5 % lift' from the data it will actually randomize.

    Scale shape: one user_id exchange to per-user sums (rounded 6 dp),
    then the corpus collapses to ONE sufficient-statistic row plus a
    1-row enrollment-rate agg; the MDE grid is a literal explode —
    output |grid| rows, no window anywhere.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / experimentation
    family)."""
    from ..functions.portable import epoch_ms

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 6).alias("y"),
        F.min(F.floor(epoch_ms(F.col("ts")) / F.lit(DAY_MS))).alias("d0"),
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        (F.max("d0") - F.min("d0") + 1).alias("n_days"),
    )
    mean = F.col("sy") / F.col("n")
    var = (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / (F.col("n") - 1)
    rate = F.col("n") / F.col("n_days")  # first-exposure users per day
    rows = []
    for mde in POWER_MDES:
        delta = mean * mde
        n_arm = F.ceil(F.lit(2.0) * var * F.lit(POWER_Z**2) / (delta * delta))
        rows.append(
            F.struct(
                F.lit(mde).alias("mde"),
                F.round(delta, 6).alias("delta"),
                n_arm.alias("n_per_arm"),
                F.ceil(F.lit(2.0) * n_arm / rate).cast("long").alias("days_needed"),
            )
        )
    return (
        s.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .transform(cells_sorted, "mde")  # <= |MDE grid| rows
    )


SRM_CRIT = 3.841459  # chi-square(1) 95% critical value, shared literal


def _q_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch monitor — the first trust gate every A/B
    platform runs before reading any metric (Fabijan et al. 2019: a
    50/50 split that arrives 51/49 invalidates the experiment far more
    often than any treatment effect is real): per day, the cumulative
    per-arm USER counts (not event counts — a chatty user must not
    tilt the ratio) against the designed 50/50 split, χ² goodness of
    fit (na−nb)²/(na+nb) read against the shared-literal χ²₁ critical
    value. Pairs with q_msprt: SRM says whether the arms are
    comparable at all; mSPRT says whether the metric moved.

    Scale shape: the corpus collapses to each user's FIRST-seen day in
    one user_id exchange, then (day, arm) first-exposure cells; the
    only window is the cumulative running sum over O(days) cells.
    Integer arithmetic until the final division.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / experimentation
    family)."""
    from pyspark.sql import Window

    from ..functions.portable import epoch_ms, hash60

    ev = load_table(spark, sf_dir, "events")
    first_day = (
        ev.select(
            "user_id", F.floor(epoch_ms(F.col("ts")) / F.lit(DAY_MS)).alias("day")
        )
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .select(
            "day",
            (hash60(F.concat(F.lit(MSPRT_SALT + "|"), F.col("user_id"))) % 2).alias(
                "arm"
            ),
        )
    )
    cells = first_day.groupBy("day").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        F.col("day").cast("long").alias("day"),
        F.sum("na").over(w).alias("cna"),
        F.sum("nb").over(w).alias("cnb"),
    )
    d = F.col("cna") - F.col("cnb")
    chi2 = F.round((d * d) / (F.col("cna") + F.col("cnb")), 6)
    return cum.select(
        "day",
        F.col("cna").alias("n_a"),
        F.col("cnb").alias("n_b"),
        chi2.alias("chi2"),
        (chi2 > SRM_CRIT).alias("srm_detected"),
    ).transform(cells_sorted, "day")  # <= |days| cells


LOGRANK_SALT = "okss-logrank-v1"  # deterministic group assignment
LOGRANK_CRIT = 3.841459  # chi-square(1) 95% critical value, shared literal


def _q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966; Peto & Peto 1972) —
    'do these two groups convert at the same rate?': the hypothesis
    test that pairs with q_survival_km's curve the way q_rank_test
    pairs with a histogram. Users hash-split into two groups over the
    same signup→purchase time-to-event data (right-censored at the
    horizon); at each event day, group A's observed events compare to
    its hypergeometric expectation given the pooled hazard, and
    χ² = (Σ(O−E))²/ΣV is read against the shared-literal χ²₁ critical
    value (the q_chi2_independence discipline — no engine's CDF
    participates). The A/A fixture must accept the null; the pytest
    power check injects a faster-converting arm and must reject.

    Scale shape: identical to the KM curve — two user_id
    min-aggregations, then (day, group) cells; per-group at-risk
    counts are running sums over the O(days) cell relation and every
    O/E/V term is integer arithmetic until the final divisions.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / stats family)."""
    from pyspark.sql import Window

    from ..functions.portable import epoch_ms, hash60

    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_ms(F.col("ts"))).alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", epoch_ms(F.col("ts")).alias("tp"))
        .join(s, "user_id")
        .filter(F.col("tp") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tp").alias("tp"))
    )
    horizon = ev.agg(F.max(epoch_ms(F.col("ts"))).alias("tmax"))
    grp = (
        hash60(F.concat(F.lit(LOGRANK_SALT + "|"), F.col("user_id"))) % 2
    ).alias("g")
    obs = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.floor(
                (F.coalesce("tp", "tmax") - F.col("t0")) / F.lit(86_400_000)
            ).alias("day"),
            F.col("tp").isNotNull().alias("event"),
            grp,
        )
    )
    cells = obs.groupBy("day").agg(
        F.sum(F.when(F.col("g") == 0, F.col("event").cast("long")).otherwise(0)).alias("da"),
        F.sum(F.when((F.col("g") == 0) & ~F.col("event"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == 1, F.col("event").cast("long")).otherwise(0)).alias("db"),
        F.sum(F.when((F.col("g") == 1) & ~F.col("event"), 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    tot = cells.agg(
        F.sum(F.col("da") + F.col("ca")).alias("na_tot"),
        F.sum(F.col("db") + F.col("cb")).alias("nb_tot"),
    )
    risk = cells.crossJoin(F.broadcast(tot)).select(
        "day",
        "da",
        "db",
        (
            F.col("na_tot")
            - F.coalesce(F.sum(F.col("da") + F.col("ca")).over(w), F.lit(0))
        ).alias("ra"),
        (
            F.col("nb_tot")
            - F.coalesce(F.sum(F.col("db") + F.col("cb")).over(w), F.lit(0))
        ).alias("rb"),
        "na_tot",
        "nb_tot",
    )
    d = F.col("da") + F.col("db")
    n = F.col("ra") + F.col("rb")
    terms = risk.filter((d > 0) & (n > 1)).select(
        "na_tot",
        "nb_tot",
        F.col("da").alias("oa"),
        (F.col("ra") * d / n).alias("ea"),
        (
            (F.col("ra") * F.col("rb") * d * (n - d)).cast("double")
            / (n * n * (n - 1)).cast("double")
        ).alias("v"),
    )
    agg = terms.groupBy("na_tot", "nb_tot").agg(
        F.sum("oa").alias("o_a"),
        F.round(F.sum("ea"), 6).alias("e_a"),
        F.round(F.sum("v"), 6).alias("v_sum"),
        F.round(
            (F.sum("oa") - F.sum("ea")) * (F.sum("oa") - F.sum("ea")) / F.sum("v"), 6
        ).alias("chi2"),
    )
    return agg.select(
        F.col("na_tot").alias("n_a"),
        F.col("nb_tot").alias("n_b"),
        "o_a",
        "e_a",
        "chi2",
        (F.col("chi2") > LOGRANK_CRIT).alias("significant"),
    )


MSPRT_SALT = "okss-msprt-v1"  # deterministic arm assignment (≠ CUPED's)
MSPRT_TAU2 = 1.0  # mixture variance of the alternative (Johari et al.)
MSPRT_ALPHA = 0.05
DAY_MS = 86_400_000


def _q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B test — the mixture sequential
    probability ratio test (Johari, Koomen, Pekelis & Walsh, KDD 2017;
    the 'peeking-safe' monitor behind Optimizely's stats engine): users
    hash-split into two arms, per-DAY sufficient statistics accumulate
    via one ordered running-sum window, and each day emits the mixture
    likelihood ratio Λ_n and the always-valid p-value min(1, 1/Λ_n) —
    valid at EVERY interim look, so the experimenter may stop the
    moment it crosses α instead of waiting for a fixed horizon. The
    sequential complement to q_cuped's variance reduction.

    ln Λ_n = ½·ln(V/(V+τ²)) + Δ²τ²/(2V(V+τ²)), with Δ the arm mean
    difference and V = σ²_pooled·(1/n_A + 1/n_B), τ² the mixture
    variance over effect sizes.

    Scale shape: the corpus collapses to one (day, arm) cell pass
    (per-cell sums rounded 6 dp so both engines cumulate identical
    terms); the ONLY window runs over O(days) cells ordered by day —
    identical sequential fold order on both engines, so the cumulative
    doubles match bit-for-bit before the final rounded outputs.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / experimentation
    family)."""
    from pyspark.sql import Window

    from ..functions.portable import epoch_ms, hash60

    ev = load_table(spark, sf_dir, "events")
    arm = (
        hash60(F.concat(F.lit(MSPRT_SALT + "|"), F.col("user_id"))) % 2
    ).alias("arm")
    cells = (
        ev.select(
            F.floor(epoch_ms(F.col("ts")) / F.lit(DAY_MS)).alias("day"),
            arm,
            "value",
        )
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na"),
            F.round(
                F.sum(F.when(F.col("arm") == 0, F.col("value")).otherwise(0.0)), 6
            ).alias("sa"),
            F.round(
                F.sum(
                    F.when(F.col("arm") == 0, F.col("value") * F.col("value")).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("qa"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb"),
            F.round(
                F.sum(F.when(F.col("arm") == 1, F.col("value")).otherwise(0.0)), 6
            ).alias("sb"),
            F.round(
                F.sum(
                    F.when(F.col("arm") == 1, F.col("value") * F.col("value")).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("qb"),
        )
    )
    return msprt_curve(cells)


def msprt_curve(cells: DataFrame) -> DataFrame:
    """(day, na, sa, qa, nb, sb, qb) daily sufficient-statistic cells →
    the monitor rows. Shared by the batch query and the streaming twin
    (whose cells the STREAMING engine aggregates from watermarked daily
    windows), so batch and stream run the identical cumulative fold."""
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "day",
        F.sum("na").over(w).alias("cna"),
        F.sum("sa").over(w).alias("csa"),
        F.sum("qa").over(w).alias("cqa"),
        F.sum("nb").over(w).alias("cnb"),
        F.sum("sb").over(w).alias("csb"),
        F.sum("qb").over(w).alias("cqb"),
    ).filter((F.col("cna") > 1) & (F.col("cnb") > 1))
    ma = F.col("csa") / F.col("cna")
    mb = F.col("csb") / F.col("cnb")
    n = F.col("cna") + F.col("cnb")
    # pooled variance from cumulative sufficient statistics
    var = (
        (F.col("cqa") - F.col("csa") * F.col("csa") / F.col("cna"))
        + (F.col("cqb") - F.col("csb") * F.col("csb") / F.col("cnb"))
    ) / (n - 2)
    v = var * (F.lit(1.0) / F.col("cna") + F.lit(1.0) / F.col("cnb"))
    delta = mb - ma
    ln_lambda = F.lit(0.5) * F.log(v / (v + MSPRT_TAU2)) + (
        delta * delta * MSPRT_TAU2
    ) / (F.lit(2.0) * v * (v + MSPRT_TAU2))
    p = F.least(F.lit(1.0), F.exp(-ln_lambda))
    return cum.select(
        F.col("day").cast("long").alias("day"),
        F.col("cna").alias("n_a"),
        F.col("cnb").alias("n_b"),
        F.round(delta, 6).alias("diff"),
        F.round(ln_lambda, 6).alias("ln_lambda"),
        F.round(p, 6).alias("p_always_valid"),
        (p < MSPRT_ALPHA).alias("significant"),
    ).transform(cells_sorted, "day")  # <= |days| cells


CAL_BINS = 10  # fixed-width probability bins [0, 1) — data-independent


def _q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE) for the
    linear quality head as an English-document classifier — the
    companion readout to q_roc_auc: AUC says the head RANKS well, this
    says whether its sigmoid scores can be read as probabilities
    (Guo et al. 2017's ECE over equal-width bins). Per bin: count,
    mean predicted probability (confidence), empirical positive rate
    (accuracy), |gap|, and the corpus ECE = Σ n_b/N·gap_b repeated on
    every row for a single-relation readout.

    Scale shape: the scored relation collapses to ≤``CAL_BINS`` cells
    in one exchange (bins are FIXED-WIDTH on [0,1), so no min/max
    pre-pass and no data-dependent boundaries); the 1-row ECE attaches
    back by broadcast. Cross-engine floats: the margin is the proven
    6-dp-rounded head, per-doc sigmoids round to 6 dp before
    aggregation, and per-bin sums re-round to 6 dp before dividing, so
    both engines feed identical terms into every division.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / model-eval family)."""
    from .curation import classifier_scores
    from .text import _tokenized

    base = _tokenized(spark, sf_dir, "source", "lang").filter(F.size("t") > 0)
    scored = classifier_scores(base, extra=("lang",))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6)
    bins = (
        scored.select(
            p.alias("p"),
            (F.col("lang") == "en").cast("long").alias("pos"),
        )
        .groupBy(
            F.least(F.floor(F.col("p") * CAL_BINS), F.lit(CAL_BINS - 1))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("p"), 6).alias("sp"),
            F.sum("pos").alias("np"),
        )
        .select(
            "bin",
            "n",
            F.round(F.col("sp") / F.col("n"), 6).alias("conf"),
            F.round(F.col("np") / F.col("n"), 6).alias("acc"),
        )
        .withColumn("gap", F.round(F.abs(F.col("acc") - F.col("conf")), 6))
    )
    ece = bins.agg(
        F.round(F.sum(F.col("n") * F.col("gap")) / F.sum("n"), 6).alias("ece")
    )
    return bins.crossJoin(F.broadcast(ece)).transform(cells_sorted, "bin")  # <= |bins| cells


def _q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve (Kaplan & Meier 1958) of
    time-to-conversion: for every signed-up user, days from FIRST
    signup to FIRST subsequent purchase; users who never purchase are
    right-CENSORED at the corpus horizon — the estimator retention
    and conversion teams use precisely because ignoring censored
    users (q_funnel's implicit stance) biases conversion-time
    downward. Ŝ(d) = ∏_{i≤d} (1 − events_i / at_risk_i) over event
    days.

    Scale shape: two min-aggregations shuffle on user_id (signup,
    first-purchase-after), then the corpus collapses to (day,
    events, censored) CELLS; at-risk counts are one running-sum
    window over the O(distinct days) cell relation, and the
    cumulative product folds over the collected cell array in day
    order (multiplication only — IEEE-deterministic in identical
    order, so no exp/ln transcendentals whose libm could differ
    across engines). The oracle runs the product as a recursive CTE
    — same arithmetic sequence, different mechanism (the
    q_holt_forecast discipline).

    Output: one row per event day (day, at_risk, events, censored,
    survival).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / stats family)."""
    from pyspark.sql import Window

    from ..functions.portable import epoch_ms

    ev = load_table(spark, sf_dir, "events")

    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_ms(F.col("ts"))).alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", epoch_ms(F.col("ts")).alias("tp"))
        .join(s, "user_id")
        .filter(F.col("tp") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tp").alias("tp"))
    )
    horizon = ev.agg(F.max(epoch_ms(F.col("ts"))).alias("tmax"))
    obs = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.floor(
                (F.coalesce("tp", "tmax") - F.col("t0")) / F.lit(86_400_000)
            ).alias("day"),
            F.col("tp").isNotNull().alias("event"),
        )
    )
    cells = obs.groupBy("day").agg(
        F.sum(F.col("event").cast("long")).alias("d"),
        F.sum((~F.col("event")).cast("long")).alias("c"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    tot = cells.agg(F.sum(F.col("d") + F.col("c")).alias("n_total"))
    risk = cells.crossJoin(F.broadcast(tot)).select(
        "day",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0))
        ).alias("at_risk"),
    )
    rows = F.sort_array(F.collect_list(F.struct("day", "at_risk", "d", "c")))
    folded = F.aggregate(
        rows,
        F.struct(
            F.lit(1.0).alias("surv"),
            F.array().cast(
                "array<struct<day:long,at_risk:long,d:long,c:long,surv:double>>"
            ).alias("out"),
        ),
        lambda acc, x: F.struct(
            (acc["surv"] * (F.lit(1.0) - x["d"] / x["at_risk"])).alias("surv"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["at_risk"].alias("at_risk"),
                        x["d"].alias("d"),
                        x["c"].alias("c"),
                        (acc["surv"] * (F.lit(1.0) - x["d"] / x["at_risk"])).alias(
                            "surv"
                        ),
                    )
                ),
            ).alias("out"),
        ),
    )["out"]
    curve = (
        risk.agg(folded.alias("out"))
        .select(F.explode("out").alias("r"))
        .select(
            F.col("r.day").alias("day"),
            F.col("r.at_risk").alias("at_risk"),
            F.col("r.d").alias("events"),
            F.col("r.c").alias("censored"),
            F.round("r.surv", 6).alias("survival"),
        )
        .transform(cells_sorted, "day")  # <= |days| curve rows
    )
    return curve


CUPED_SALT = "okss-cuped-v1"  # deterministic arm assignment
CUPED_SPLIT_MS = 15 * 86_400_000  # pre/post boundary: corpus start + 15 d


def _q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B estimate (Deng, Xu, Kohavi & Walker,
    WSDM 2013): users hash-split into two arms, the experiment metric
    is each user's POST-period value sum and the covariate their
    PRE-period sum; θ = cov(x,y)/var(x) (pooled) gives the adjusted
    lift ŷ_B−ŷ_A − θ·(x̄_B−x̄_A), and ρ² the fraction of metric
    variance the covariate removes — the technique that lets an
    experiment platform reach significance with ~1/(1−ρ²)× less
    traffic. Closed-form moments from sufficient statistics so both
    engines run the IDENTICAL arithmetic (streaming co-moment
    implementations differ engine-to-engine).

    Scale shape: one conditional-sum aggregation per user (single
    exchange on user_id), then the corpus collapses to per-arm
    sufficient-statistic cells (n, Σx, Σy, Σxy, Σx², Σy²) — six
    doubles per arm, combined map-side; everything after is 1-row
    arithmetic. Per-user sums round to 6 dp before the moment pass so
    both engines feed identical inputs into the float pipeline.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / stats family)."""
    from ..functions.portable import epoch_ms, hash60

    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min(epoch_ms(F.col("ts"))).alias("tmin"))
    per_user = (
        ev.crossJoin(F.broadcast(t0))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        epoch_ms(F.col("ts")) < F.col("tmin") + CUPED_SPLIT_MS,
                        F.col("value"),
                    ).otherwise(F.lit(0.0))
                ),
                6,
            ).alias("x"),
            F.round(
                F.sum(
                    F.when(
                        epoch_ms(F.col("ts")) >= F.col("tmin") + CUPED_SPLIT_MS,
                        F.col("value"),
                    ).otherwise(F.lit(0.0))
                ),
                6,
            ).alias("y"),
        )
        .select(
            "x",
            "y",
            (hash60(F.concat(F.lit(CUPED_SALT + "|"), F.col("user_id"))) % 2).alias(
                "arm"
            ),
        )
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.when(F.col("arm") == 1, F.lit(1)).otherwise(F.lit(0))).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(F.lit(0.0))).alias(
            "sx_b"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(F.lit(0.0))).alias(
            "sy_b"
        ),
    )
    mx, my = F.col("sx") / F.col("n"), F.col("sy") / F.col("n")
    cov = F.col("sxy") / F.col("n") - mx * my
    varx = F.col("sxx") / F.col("n") - mx * mx
    vary = F.col("syy") / F.col("n") - my * my
    theta = cov / varx
    n_a = F.col("n") - F.col("n_b")
    mxa = (F.col("sx") - F.col("sx_b")) / n_a
    mya = (F.col("sy") - F.col("sy_b")) / n_a
    mxb = F.col("sx_b") / F.col("n_b")
    myb = F.col("sy_b") / F.col("n_b")
    return s.select(
        n_a.alias("n_a"),
        F.col("n_b").alias("n_b"),
        F.round(myb - mya, 4).alias("diff_raw"),
        F.round(theta, 6).alias("theta"),
        F.round((myb - mya) - theta * (mxb - mxa), 4).alias("diff_cuped"),
        F.round(cov * cov / (varx * vary), 4).alias("var_reduction"),
    )


def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of ``events.value`` — the
    fraud/synthetic-data smell test: naturally occurring multi-scale
    quantities follow P(d) = log10(1+1/d) (Benford 1938, Hill 1995);
    a generator or instrumentation bug that draws uniforms does not.
    Digits extract from a FIXED '%.6f' decimal rendering (both
    engines' printf) — never floor(log10(v)), whose libm ulp
    differences at power-of-ten boundaries diverge engine-to-engine.
    Expected probabilities are Python-computed literals EMBEDDED in
    both plans, so neither engine's log10 participates.

    Scale shape: one scan → per-digit counts partial-combine to ≤9
    cells; the digit spine left-join keeps zero-count digits present.
    Output: digit, n, p_obs, p_benford, abs_dev (one row per digit).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (profiling / drift family)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 1e-6)
    counts = (
        ev.select(
            F.regexp_extract(
                F.format_string("%.6f", F.col("value")), "[1-9]", 0
            ).alias("ds")
        )
        .filter(F.col("ds") != "")
        .groupBy(F.col("ds").cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("n_tot"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    import math

    p_exp = F.element_at(
        F.array(*[F.lit(round(math.log10(1 + 1 / d), 6)) for d in range(1, 10)]),
        F.col("digit"),
    )
    return (
        spine.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.round(F.coalesce("n", F.lit(0)) / F.col("n_tot"), 6).alias("p_obs"),
            p_exp.alias("p_benford"),
            F.round(
                F.abs(F.coalesce("n", F.lit(0)) / F.col("n_tot") - p_exp), 6
            ).alias("abs_dev"),
        )
        .transform(cells_sorted, "digit")  # 9 digit rows
    )


QUERIES = {
    "q_signal_correlation": _q_signal_correlation,
    "q_roc_auc": _q_roc_auc,
    "q_calibration": _q_calibration,
    "q_survival_km": _q_survival_km,
    "q_cuped": _q_cuped,
    "q_msprt": _q_msprt,
    "q_srm": _q_srm,
    "q_power_curve": _q_power_curve,
    "q_logrank": _q_logrank,
    "q_benford": _q_benford,
    "q_bootstrap_ci": _q_bootstrap_ci,
    "q_trimmed_mean": _q_trimmed_mean,
    "q_winsorized_mean": _q_winsorized_mean,
    "q_rank_test": _q_rank_test,
    "q_ks_test": _q_ks_test,
    "q_bh_fdr": _q_bh_fdr,
    "q_kruskal": _q_kruskal,
    "q_gini_activity": _q_gini_activity,
    "q_skyline_users": _q_skyline_users,
    "q_isotonic_calibration": _q_isotonic_calibration,
    "q_conformal": _q_conformal,
    "q_mutual_info": _q_mutual_info,
    "q_chi2_independence": _q_chi2_independence,
    "q_hourly_profile": _q_hourly_profile,
    "q_mad_outliers": _q_mad_outliers,
    "q_chao1": _q_chao1,
    "q_psi_drift": _q_psi_drift,
    "q_cms_topk": _q_cms_topk,
    "q_stats_agg": _q_stats_agg,
    "q_string_agg": _q_string_agg,
    "q_array_ops": _q_array_ops,
}

def _chao1_oracle() -> str:
    from .dedup import _SHINGLED_CTE

    return (
        _SHINGLED_CTE
        + """,
occ AS (
  SELECT g, count(1) AS c FROM (SELECT unnest(s) AS g FROM sh) GROUP BY g
),
fof AS (SELECT c, CAST(count(1) AS BIGINT) AS f FROM occ GROUP BY c)
SELECT CAST(sum(f) AS BIGINT) AS s_obs,
       CAST(sum(CASE WHEN c = 1 THEN f ELSE 0 END) AS BIGINT) AS f1,
       CAST(sum(CASE WHEN c = 2 THEN f ELSE 0 END) AS BIGINT) AS f2,
       round(sum(f)
             + CAST(sum(CASE WHEN c = 1 THEN f ELSE 0 END)
                    * sum(CASE WHEN c = 1 THEN f ELSE 0 END) AS DOUBLE)
               / (2.0 * greatest(sum(CASE WHEN c = 2 THEN f ELSE 0 END), 1)), 4)
         AS chao1_est
FROM fof
"""
    )


from ..functions.textfns import stopword_count_sql, tokens_sql

_TOKS = tokens_sql("text")
_SW_COUNT = stopword_count_sql("t")

_POIS_CASE = "CASE WHEN u < 0.36787944117144233 THEN 0 WHEN u < 0.7357588823428847 THEN 1 WHEN u < 0.9196986029286058 THEN 2 WHEN u < 0.9810118431238463 THEN 3 WHEN u < 0.9963401531726563 THEN 4 WHEN u < 0.9994058151824183 THEN 5 WHEN u < 0.999916758850712 THEN 6 ELSE 7 END"

def _roc_auc_oracle() -> str:
    """Deliberately the ROW-LEVEL rank-window formulation (the cell
    form's algebraic twin) so the oracle is a different algorithm
    arriving at the same half-integer rank sums."""
    from .curation import _CLS_MARGIN

    return f"""
WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
f AS (SELECT lang, round({_CLS_MARGIN}, 6) AS margin FROM toks WHERE len(t) > 0),
ranked AS (
  SELECT lang,
         CAST(rank() OVER (ORDER BY margin) AS DOUBLE)
           + (count(1) OVER (PARTITION BY margin) - 1) / 2.0 AS r
  FROM f
),
s AS (
  SELECT sum(CASE WHEN lang = 'en' THEN r END) AS r_pos,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
       round((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc,
       round(2.0 * ((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)) - 1.0, 6)
         AS gini
FROM s
"""


def _benford_oracle() -> str:
    """Expected-digit probabilities are the SAME Python-computed
    literals the Spark plan embeds — neither engine's log10 runs."""
    import math

    probs = {d: round(math.log10(1 + 1 / d), 6) for d in range(1, 10)}
    case = " ".join(f"WHEN {d} THEN {p}" for d, p in probs.items())
    return f"""
WITH counts AS (
  SELECT CAST(regexp_extract(printf('%.6f', value), '[1-9]', 0) AS INTEGER) AS digit,
         CAST(count(1) AS BIGINT) AS n
  FROM events
  WHERE value >= 1e-6 AND regexp_extract(printf('%.6f', value), '[1-9]', 0) <> ''
  GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM counts),
spine AS (SELECT CAST(range AS INTEGER) AS digit FROM range(1, 10))
SELECT s.digit,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n,
       round(coalesce(c.n, 0) / CAST(t.n_tot AS DOUBLE), 6) AS p_obs,
       CAST(CASE s.digit {case} END AS DOUBLE) AS p_benford,
       round(abs(coalesce(c.n, 0) / CAST(t.n_tot AS DOUBLE)
                 - CAST(CASE s.digit {case} END AS DOUBLE)), 6) AS abs_dev
FROM spine s LEFT JOIN counts c ON s.digit = c.digit CROSS JOIN tot t
ORDER BY s.digit
"""


def _calibration_oracle() -> str:
    """Same fixed-width-bin arithmetic; the margin/sigmoid/round
    staging mirrors the Spark side term-for-term so no engine's
    accumulation order is observable."""
    from .curation import _CLS_MARGIN

    return f"""
WITH toks AS (SELECT lang, {_TOKS} AS t FROM documents),
f AS (SELECT lang, round({_CLS_MARGIN}, 6) AS margin FROM toks WHERE len(t) > 0),
pp AS (
  SELECT round(1.0 / (1.0 + exp(-margin)), 6) AS p,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM f
),
bins AS (
  SELECT CAST(least(floor(p * {CAL_BINS}), {CAL_BINS - 1}) AS INTEGER) AS bin,
         CAST(count(1) AS BIGINT) AS n,
         round(sum(p), 6) AS sp,
         CAST(sum(pos) AS BIGINT) AS np
  FROM pp GROUP BY 1
),
b AS (
  SELECT bin, n,
         round(sp / n, 6) AS conf,
         round(np / CAST(n AS DOUBLE), 6) AS acc
  FROM bins
),
g AS (SELECT bin, n, conf, acc, round(abs(acc - conf), 6) AS gap FROM b),
e AS (SELECT round(sum(n * gap) / sum(n), 6) AS ece FROM g)
SELECT bin, n, conf, acc, gap, ece FROM g CROSS JOIN e ORDER BY bin
"""


def msprt_oracle(closed_windows_only: bool = False) -> str:
    """Batch mSPRT oracle; with ``closed_windows_only`` the daily cells
    are restricted to windows the final watermark CLOSED (the streaming
    twin's append-mode emission never sees the tail day) — the same
    wm-filter pattern as q_stream_drift's oracle. The curve is a prefix
    computation, so the filter only trims trailing rows."""
    wm = (
        f"WHERE (day + 1) * {DAY_MS} <= (SELECT max(epoch_ms(ts)) - 60000 FROM events)"
        if closed_windows_only
        else ""
    )
    return f"""
WITH cells0 AS (
  SELECT CAST(floor(epoch_ms(ts) / {DAY_MS}) AS BIGINT) AS day,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         round(sum(CASE WHEN arm = 0 THEN value ELSE 0.0 END), 6) AS sa,
         round(sum(CASE WHEN arm = 0 THEN value * value ELSE 0.0 END), 6) AS qa,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         round(sum(CASE WHEN arm = 1 THEN value ELSE 0.0 END), 6) AS sb,
         round(sum(CASE WHEN arm = 1 THEN value * value ELSE 0.0 END), 6) AS qb
  FROM (
    SELECT ts, value,
           {hash60_sql(f"'{MSPRT_SALT}|' || CAST(user_id AS VARCHAR)")} % 2 AS arm
    FROM events
  )
  GROUP BY 1
),
cells AS (SELECT * FROM cells0 {wm}),
cum AS (
  SELECT day,
         CAST(sum(na) OVER w AS BIGINT) AS cna,
         sum(sa) OVER w AS csa,
         sum(qa) OVER w AS cqa,
         CAST(sum(nb) OVER w AS BIGINT) AS cnb,
         sum(sb) OVER w AS csb,
         sum(qb) OVER w AS cqb
  FROM cells
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
m AS (
  SELECT day, cna, cnb,
         csb / cnb - csa / cna AS delta,
         (((cqa - csa * csa / cna) + (cqb - csb * csb / cnb))
           / (cna + cnb - 2))
           * (1.0 / cna + 1.0 / cnb) AS v
  FROM cum WHERE cna > 1 AND cnb > 1
),
l AS (
  SELECT day, cna, cnb, delta,
         0.5 * ln(v / (v + {MSPRT_TAU2}))
           + (delta * delta * {MSPRT_TAU2}) / (2.0 * v * (v + {MSPRT_TAU2}))
           AS ln_lambda
  FROM m
)
SELECT day, cna AS n_a, cnb AS n_b,
       round(delta, 6) AS diff,
       round(ln_lambda, 6) AS ln_lambda,
       round(least(1.0, exp(-ln_lambda)), 6) AS p_always_valid,
       (least(1.0, exp(-ln_lambda)) < {MSPRT_ALPHA}) AS significant
FROM l ORDER BY day
"""


ORACLE = {
    "q_winsorized_mean": _winsorized_oracle(),
    "q_roc_auc": _roc_auc_oracle(),
    "q_msprt": msprt_oracle(),
    "q_power_curve": f"""
WITH pu AS (
  SELECT user_id, round(sum(value), 6) AS y,
         min(CAST(floor(epoch_ms(ts) / {DAY_MS}) AS BIGINT)) AS d0
  FROM events GROUP BY user_id
),
s AS (
  SELECT CAST(count(1) AS BIGINT) AS n,
         sum(y) AS sy, sum(y * y) AS syy,
         CAST(max(d0) - min(d0) + 1 AS BIGINT) AS n_days
  FROM pu
),
m AS (
  SELECT n, n_days,
         sy / n AS mean,
         (syy - sy * sy / n) / (n - 1) AS var,
         n / CAST(n_days AS DOUBLE) AS rate
  FROM s
),
grid AS (
  SELECT CAST(unnest([{", ".join(str(m) for m in POWER_MDES)}]) AS DOUBLE) AS mde
)
SELECT g.mde,
       round(m.mean * g.mde, 6) AS delta,
       CAST(ceil(2.0 * m.var * {POWER_Z**2!r}
                 / ((m.mean * g.mde) * (m.mean * g.mde))) AS BIGINT) AS n_per_arm,
       CAST(ceil(2.0 * ceil(2.0 * m.var * {POWER_Z**2!r}
                 / ((m.mean * g.mde) * (m.mean * g.mde))) / m.rate) AS BIGINT)
         AS days_needed
FROM grid g CROSS JOIN m ORDER BY g.mde
""",
    "q_srm": f"""
WITH fd AS (
  SELECT user_id, min(CAST(floor(epoch_ms(ts) / {DAY_MS}) AS BIGINT)) AS day
  FROM events GROUP BY user_id
),
armed AS (
  SELECT day,
         {hash60_sql(f"'{MSPRT_SALT}|' || CAST(user_id AS VARCHAR)")} % 2 AS arm
  FROM fd
),
cells AS (
  SELECT day,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM armed GROUP BY day
),
cum AS (
  SELECT day,
         CAST(sum(na) OVER w AS BIGINT) AS cna,
         CAST(sum(nb) OVER w AS BIGINT) AS cnb
  FROM cells
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT day, cna AS n_a, cnb AS n_b,
       round((cna - cnb) * (cna - cnb) / CAST(cna + cnb AS DOUBLE), 6) AS chi2,
       (round((cna - cnb) * (cna - cnb) / CAST(cna + cnb AS DOUBLE), 6) > {SRM_CRIT})
         AS srm_detected
FROM cum ORDER BY day
""",
    "q_logrank": f"""
WITH s AS (
  SELECT user_id, min(epoch_ms(ts)) AS t0
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS tp
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= s.t0
  GROUP BY 1
),
h AS (SELECT max(epoch_ms(ts)) AS tmax FROM events),
obs AS (
  SELECT CAST(floor((coalesce(p.tp, h.tmax) - s.t0) / 86400000) AS BIGINT) AS day,
         p.tp IS NOT NULL AS event,
         {hash60_sql(f"'{LOGRANK_SALT}|' || CAST(s.user_id AS VARCHAR)")} % 2 AS g
  FROM s LEFT JOIN p USING (user_id) CROSS JOIN h
),
cells AS (
  SELECT day,
         CAST(sum(CASE WHEN g = 0 AND event THEN 1 ELSE 0 END) AS BIGINT) AS da,
         CAST(sum(CASE WHEN g = 0 AND NOT event THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN g = 1 AND event THEN 1 ELSE 0 END) AS BIGINT) AS db,
         CAST(sum(CASE WHEN g = 1 AND NOT event THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM obs GROUP BY 1
),
tot AS (
  SELECT CAST(sum(da + ca) AS BIGINT) AS na_tot,
         CAST(sum(db + cb) AS BIGINT) AS nb_tot
  FROM cells
),
risk AS (
  SELECT day, da, db,
         na_tot - coalesce(CAST(sum(da + ca) OVER w AS BIGINT), 0) AS ra,
         nb_tot - coalesce(CAST(sum(db + cb) OVER w AS BIGINT), 0) AS rb,
         na_tot, nb_tot
  FROM cells CROSS JOIN tot
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
terms AS (
  SELECT na_tot, nb_tot, da AS oa,
         ra * (da + db) / (ra + rb) AS ea,
         CAST(ra * rb * (da + db) * ((ra + rb) - (da + db)) AS DOUBLE)
           / CAST((ra + rb) * (ra + rb) * ((ra + rb) - 1) AS DOUBLE) AS v
  FROM risk WHERE da + db > 0 AND ra + rb > 1
),
a AS (
  SELECT na_tot, nb_tot,
         CAST(sum(oa) AS BIGINT) AS o_a,
         round(sum(ea), 6) AS e_a,
         round(sum(v), 6) AS v_sum,
         round((sum(oa) - sum(ea)) * (sum(oa) - sum(ea)) / sum(v), 6) AS chi2
  FROM terms GROUP BY 1, 2
)
SELECT na_tot AS n_a, nb_tot AS n_b, o_a, e_a, chi2,
       (chi2 > {LOGRANK_CRIT}) AS significant
FROM a
""",
    "q_calibration": _calibration_oracle(),
    "q_cuped": f"""
WITH t0 AS (SELECT min(epoch_ms(ts)) AS tmin FROM events),
pu AS (
  SELECT e.user_id,
         round(sum(CASE WHEN epoch_ms(e.ts) < t.tmin + {CUPED_SPLIT_MS}
                        THEN e.value ELSE 0.0 END), 6) AS x,
         round(sum(CASE WHEN epoch_ms(e.ts) >= t.tmin + {CUPED_SPLIT_MS}
                        THEN e.value ELSE 0.0 END), 6) AS y
  FROM events e CROSS JOIN t0 t
  GROUP BY e.user_id
),
armed AS (
  SELECT x, y,
         {hash60_sql(f"'{CUPED_SALT}|' || CAST(user_id AS VARCHAR)")} % 2 AS arm
  FROM pu
),
s AS (
  SELECT CAST(count(1) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         sum(CASE WHEN arm = 1 THEN x ELSE 0.0 END) AS sx_b,
         sum(CASE WHEN arm = 1 THEN y ELSE 0.0 END) AS sy_b
  FROM armed
),
m AS (
  SELECT n, n_b, n - n_b AS n_a,
         sx / n AS mx, sy / n AS my,
         sxy / n - (sx / n) * (sy / n) AS cov,
         sxx / n - (sx / n) * (sx / n) AS varx,
         syy / n - (sy / n) * (sy / n) AS vary,
         (sx - sx_b) / (n - n_b) AS mxa, (sy - sy_b) / (n - n_b) AS mya,
         sx_b / n_b AS mxb, sy_b / n_b AS myb
  FROM s
)
SELECT n_a, n_b,
       round(myb - mya, 4) AS diff_raw,
       round(cov / varx, 6) AS theta,
       round((myb - mya) - (cov / varx) * (mxb - mxa), 4) AS diff_cuped,
       round(cov * cov / (varx * vary), 4) AS var_reduction
FROM m
""",
    "q_benford": _benford_oracle(),
    # Kaplan-Meier: the cumulative survival product runs as a recursive
    # CTE over row_number-chained day cells — a different mechanism from
    # the Spark side's higher-order array fold, but the identical
    # multiplication sequence in the identical day order (the
    # q_holt_forecast discipline), so the doubles agree bit-for-bit.
    "q_survival_km": """
WITH RECURSIVE
s AS (
  SELECT user_id, min(epoch_ms(ts)) AS t0
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS tp
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= s.t0
  GROUP BY e.user_id
),
h AS (SELECT max(epoch_ms(ts)) AS tmax FROM events),
obs AS (
  SELECT CAST(floor((coalesce(p.tp, h.tmax) - s.t0) / 86400000.0) AS BIGINT) AS day,
         p.tp IS NOT NULL AS event
  FROM s LEFT JOIN p USING (user_id) CROSS JOIN h
),
cells AS (
  SELECT day,
         CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c
  FROM obs GROUP BY day
),
risk AS (
  SELECT day, d, c,
         (SELECT CAST(sum(d + c) AS BIGINT) FROM cells)
           - CAST(coalesce(sum(d + c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS at_risk,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
  FROM cells
),
km AS (
  SELECT i, day, at_risk, d, c,
         1.0 * (1.0 - d / CAST(at_risk AS DOUBLE)) AS surv
  FROM risk WHERE i = 1
  UNION ALL
  SELECT r.i, r.day, r.at_risk, r.d, r.c,
         km.surv * (1.0 - r.d / CAST(r.at_risk AS DOUBLE))
  FROM km JOIN risk r ON r.i = km.i + 1
)
SELECT day, at_risk, d AS events, c AS censored, round(surv, 6) AS survival
FROM km ORDER BY day
""",
    "q_hourly_profile": """
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS h, CAST(count(1) AS BIGINT) AS c
  FROM events GROUP BY event_type, hour(ts)
),
ranked AS (
  SELECT event_type, h, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c DESC, h ASC) AS rp,
         row_number() OVER (PARTITION BY event_type ORDER BY c ASC, h ASC) AS rt
  FROM cells
),
seen AS (SELECT event_type, CAST(count(1) AS BIGINT) AS n_hours_seen FROM cells GROUP BY event_type)
SELECT p.event_type, p.h AS peak_hour, p.c AS peak_n,
       t.h AS trough_hour, t.c AS trough_n,
       round(p.c / CAST(t.c AS DOUBLE), 4) AS peak_trough_ratio,
       s.n_hours_seen
FROM (SELECT * FROM ranked WHERE rp = 1) p
JOIN (SELECT * FROM ranked WHERE rt = 1) t USING (event_type)
JOIN seen s USING (event_type)
""",
    "q_chi2_independence": """
WITH cells AS (
  SELECT lang, source, CAST(count(1) AS BIGINT) AS o FROM documents GROUP BY lang, source
),
rows_ AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rn FROM cells GROUP BY lang),
cols_ AS (SELECT source, CAST(sum(o) AS BIGINT) AS cn FROM cells GROUP BY source),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
dims AS (
  SELECT CAST(count(DISTINCT lang) AS BIGINT) AS nl,
         CAST(count(DISTINCT source) AS BIGINT) AS ns,
         CAST(count(1) AS BIGINT) AS n_cells
  FROM cells
),
fg AS (
  SELECT coalesce(c.o, 0) AS o, r.rn * co.cn / CAST(t.n AS DOUBLE) AS e
  FROM rows_ r CROSS JOIN cols_ co
  LEFT JOIN cells c ON c.lang = r.lang AND c.source = co.source
  CROSS JOIN tot t
),
x AS (SELECT sum((o - e) * (o - e) / e) AS chi2 FROM fg),
f AS (
  SELECT t.n AS n_docs, d.n_cells, (d.nl - 1) * (d.ns - 1) AS dof, x.chi2,
         (d.nl - 1) * (d.ns - 1)
           * pow(1.0 - 2.0 / (9.0 * ((d.nl - 1) * (d.ns - 1)))
                 + 1.6448536269514722 * sqrt(2.0 / (9.0 * ((d.nl - 1) * (d.ns - 1)))), 3.0) AS crit
  FROM tot t CROSS JOIN dims d CROSS JOIN x
)
SELECT n_docs, n_cells, CAST(dof AS BIGINT) AS dof, round(chi2, 4) AS chi2,
       round(crit, 4) AS chi2_crit, chi2 > crit AS significant
FROM f
""",
    "q_ks_test": f"""
WITH s AS (
  SELECT event_type, value FROM events WHERE event_type IN ('{MW_A}', '{MW_B}') AND value IS NOT NULL
),
cells AS (
  SELECT value,
         CAST(sum(CASE WHEN event_type = '{MW_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN event_type = '{MW_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM s GROUP BY value
),
cum AS (
  SELECT CAST(sum(ca) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fa,
         CAST(sum(cb) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fb
  FROM cells
),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM cells),
d AS (
  SELECT n_a, n_b, max(abs(fa / CAST(n_a AS DOUBLE) - fb / CAST(n_b AS DOUBLE))) AS d_stat
  FROM cum CROSS JOIN tot GROUP BY n_a, n_b
)
SELECT n_a, n_b, round(d_stat, 6) AS d_stat,
       round(1.3581015157406195 * sqrt((n_a + n_b) / CAST(n_a * n_b AS DOUBLE)), 6) AS d_crit,
       d_stat > 1.3581015157406195 * sqrt((n_a + n_b) / CAST(n_a * n_b AS DOUBLE)) AS significant
FROM d
""",
    "q_bh_fdr": bh_fdr_oracle(),
    "q_kruskal": kruskal_oracle(),
    "q_gini_activity": _gini_oracle(),
    "q_skyline_users": _skyline_oracle(),
    "q_isotonic_calibration": _isotonic_oracle(),
    "q_conformal": _conformal_oracle(),
    "q_mutual_info": _mutual_info_oracle(),
    "q_rank_test": f"""
WITH s AS (
  SELECT event_type, value FROM events WHERE event_type IN ('{MW_A}', '{MW_B}') AND value IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         CAST(rank() OVER (ORDER BY value) AS DOUBLE)
           + (count(1) OVER (PARTITION BY value) - 1) / 2.0 AS r
  FROM s
),
sums AS (
  SELECT sum(CASE WHEN event_type = '{MW_A}' THEN r END) AS r_a,
         CAST(sum(CASE WHEN event_type = '{MW_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN event_type = '{MW_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM ranked
),
ties AS (
  SELECT sum(t * t * t - t) AS tie3
  FROM (SELECT count(1) AS t FROM ranked GROUP BY value)
),
f AS (
  SELECT n_a, n_b,
         r_a - n_a * (n_a + 1) / 2.0 AS u,
         n_a * n_b / 2.0 AS mu,
         n_a * n_b / 12.0 * ((n_a + n_b + 1) - tie3 / ((n_a + n_b) * (n_a + n_b - 1))) AS var
  FROM sums CROSS JOIN ties
)
SELECT n_a, n_b, round(u, 4) AS u_stat,
       round((u - mu) / sqrt(var), 4) AS z_score,
       round(2.0 * u / (n_a * n_b) - 1.0, 4) AS cliffs_delta,
       abs((u - mu) / sqrt(var)) > 1.959963984540054 AS significant
FROM f
""",
    "q_trimmed_mean": f"""
WITH ranked AS (
  SELECT event_type, value,
         percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pr
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(count(1) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN pr >= {TRIM_FRAC} AND pr <= 1.0 - {TRIM_FRAC}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(avg(value), 4) AS mean_all,
       round(avg(CASE WHEN pr >= {TRIM_FRAC} AND pr <= 1.0 - {TRIM_FRAC}
                      THEN value END), 4) AS trimmed_mean
FROM ranked GROUP BY event_type
""",
    "q_bootstrap_ci": f"""
WITH rep AS (
  SELECT e.event_id, e.value, CAST(g.b AS INTEGER) AS b
  FROM events e CROSS JOIN range(0, {BOOT_B}) g(b)
),
uu AS (
  SELECT b, value,
         {hash60_sql(f"'{BOOT_SALT}' || '|' || CAST(event_id AS VARCHAR) || '|' || CAST(b AS VARCHAR)")}
           / 1152921504606846976.0 AS u
  FROM rep
),
uw AS (SELECT b, value, {_POIS_CASE} AS w FROM uu),
means AS (
  SELECT b, round(sum(w * value) / sum(w), 6) AS m FROM uw GROUP BY b
),
srt AS (SELECT list_sort(list(m)) AS ms FROM means)
SELECT pt.n_rows, pt.point_mean, srt.ms[1] AS boot_lo, srt.ms[{BOOT_B}] AS boot_hi,
       CAST({BOOT_B} AS INTEGER) AS n_replicas
FROM (SELECT CAST(count(1) AS BIGINT) AS n_rows, round(avg(value), 6) AS point_mean
      FROM events) pt CROSS JOIN srt
""",
    "q_signal_correlation": f"""
WITH toks AS (SELECT {_TOKS} AS t FROM documents),
sig AS (
  SELECT CAST(len(t) AS DOUBLE) AS nt,
         len(list_distinct(t)) / CAST(len(t) AS DOUBLE) AS ttr,
         {_SW_COUNT} / CAST(len(t) AS DOUBLE) AS stop,
         list_reduce(list_transform(t, x -> length(x)), (a, x) -> a + x)
           / CAST(len(t) AS DOUBLE) AS mw
  FROM toks WHERE len(t) > 0
)
SELECT round(corr(nt, ttr), 4) AS nt_ttr,
       round(corr(nt, stop), 4) AS nt_stop,
       round(corr(nt, mw), 4) AS nt_mw,
       round(corr(ttr, stop), 4) AS ttr_stop,
       round(corr(ttr, mw), 4) AS ttr_mw,
       round(corr(stop, mw), 4) AS stop_mw
FROM sig
""",
    "q_mad_outliers": f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med_raw
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, round(quantile_cont(abs(e.value - m.med_raw), 0.5), 6) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
),
stats AS (
  SELECT m.event_type, round(m.med_raw, 6) AS med, d.mad
  FROM med m JOIN mad d USING (event_type)
)
SELECT s.event_type, s.med, s.mad,
       CAST(count(1) AS BIGINT) AS n,
       CAST(sum(CASE WHEN s.mad = 0 THEN CASE WHEN e.value <> s.med THEN 1 ELSE 0 END
                     WHEN abs(e.value - s.med) / ({MAD_K} * s.mad) > {MAD_CUT}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN stats s USING (event_type)
GROUP BY s.event_type, s.med, s.mad
""",
    "q_chao1": _chao1_oracle(),
    "q_psi_drift": f"""
WITH binned AS (
  SELECT event_type,
         CAST(least({PSI_BINS - 1}, floor(value / {PSI_BIN_W})) AS INTEGER) AS b
  FROM events
),
cells AS (SELECT event_type, b, count(1) AS c FROM binned GROUP BY event_type, b),
tot_t AS (SELECT event_type, sum(c) AS n_t FROM cells GROUP BY event_type),
all_b AS (SELECT b, sum(c) AS c_all FROM cells GROUP BY b),
tot_all AS (SELECT sum(c) AS n_all FROM cells),
grid AS (
  SELECT t.event_type, CAST(u AS INTEGER) AS b
  FROM tot_t t, unnest(range(0, {PSI_BINS})) AS g(u)
),
j AS (
  SELECT g.event_type, g.b,
         CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / (t.n_t + {PSI_BINS}) AS p_t,
         CAST(coalesce(a.c_all, 0) + 1 AS DOUBLE) / (x.n_all + {PSI_BINS}) AS p_a
  FROM grid g
  LEFT JOIN cells c ON g.event_type = c.event_type AND g.b = c.b
  JOIN tot_t t ON g.event_type = t.event_type
  LEFT JOIN all_b a ON g.b = a.b
  CROSS JOIN tot_all x
)
SELECT event_type,
       round(sum((p_t - p_a) * ln(p_t / p_a)), 6) AS psi,
       (round(sum((p_t - p_a) * ln(p_t / p_a)), 6) > {PSI_ALERT}) AS drifted
FROM j GROUP BY event_type
""",
    "q_cms_topk": _cms_oracle(),
    "q_stats_agg": """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(var_samp(l_quantity), 4) AS qty_var,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_discount, l_tax), 8) AS disc_tax_covar
FROM lineitem GROUP BY l_returnflag
""",
    "q_string_agg": """
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS names,
       CAST(count(1) AS BIGINT) AS n
FROM customer WHERE c_custkey <= 50
GROUP BY c_nationkey
""",
    "q_array_ops": """
WITH v AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS d
  FROM embeddings
), h AS (
  SELECT vec_id, d, d[1:8] AS head8 FROM v
)
SELECT vec_id,
       list_sort(head8) AS head8_sorted,
       round(list_sort(head8, 'DESC')[1], 6) AS head8_max,
       list_contains(list_transform(d, x -> x > 0), true) AS has_positive,
       CAST(len(list_distinct(list_transform(head8, x -> CAST(sign(x) AS DOUBLE)))) AS INTEGER) AS n_signs
FROM h
""",
}
