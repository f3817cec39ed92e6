"""Similarity search over the ``embeddings`` table (north-star
extension surface): brute-force cosine top-k (the exact baseline),
hyperplane-LSH bucketed ANN (the scale path), and vector aggregation
(per-label centroids).

Dot products are strict left folds (``F.aggregate`` /
``list_reduce``) over float→double-cast components so both engines
produce bit-identical doubles — ranking ties are additionally broken
by vec_id so top-k sets are engine-stable.

Scale design: brute-force is O(Q·N·d) — correct but linear; the LSH
variant buckets vectors by sign-bit signature against fixed
hyperplanes so each query probes ~N/2^b candidates after ONE
equality join on the bucket id (no cross join), the same
block-then-verify architecture as operators/dedup.py. For real ANN
recall you'd use learned centroids (IVF) — the bucketing seam is the
one line to swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .presentation import cells_sorted

from ..functions.portable import hash60, hash60_sql
from ..sources.tables import load_table, parallelize

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the demo query vectors

# Multi-table hyperplane LSH (Indyk-Motwani / Charikar SimHash for
# cosine): LSH_TABLES independent tables of LSH_BITS sign-bit planes
# each — a near neighbor collides with the probe in SOME table with
# probability 1 − (1 − p^b)^L where p = 1 − θ/π, the same band/row
# s-curve as MinHash-LSH banding (operators/dedup.py). The hyperplane
# ±1 components are sha256-derived at import time — deterministic,
# engine-portable (embedded as LITERAL arrays in both the Spark
# expression and the DuckDB oracle), and statistically independent
# (the round-2 structured patterns gave 3 correlated planes → recall
# 0.12; measured here: recall@10 ≈ 0.70 touching ≈ 0.42 of this
# near-random synthetic corpus — on clustered real embeddings the
# candidate fraction drops sharply while recall holds, which is the
# regime LSH exists for; tests/test_lsh_recall.py gates both numbers).

LSH_BITS = 4
LSH_TABLES = 8
EMB_DIM = 64


def _lsh_signs(tbl: int, plane: int, dim: int = EMB_DIM) -> list[float]:
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.sha256(f"lsh:{tbl}:{plane}:{i}".encode()).digest()
        out.append(1.0 if h[0] % 2 == 0 else -1.0)
    return out


_LSH_SIGNS = {
    (t, p): _lsh_signs(t, p) for t in range(LSH_TABLES) for p in range(LSH_BITS)
}


def _dvec(col: str = "embedding") -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def lsh_sig(vec: Column, tbl: int) -> Column:
    """LSH_BITS-bit signature of vec in table tbl: bit p = sign of the
    projection onto the (tbl, p) hyperplane — one codegen'd fold per
    plane against a literal ±1 array."""
    sig = F.lit(0)
    for p in range(LSH_BITS):
        signs = F.array(*[F.lit(s) for s in _LSH_SIGNS[(tbl, p)]])
        proj = _dot(vec, signs)
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def _lsh_sigs_long_fold(v: DataFrame) -> DataFrame:
    """Fold-expression build of the (vec_id, tbl, sig) index — the
    engine-portable reference implementation (bit-for-bit the DuckDB
    oracle's math). Kept as the parity twin for the fast build below
    (tests/test_lsh_recall.py::test_index_builds_agree); the 32
    higher-order-function folds per vector are interpreter-bound in
    Spark, so the production build is the Arrow kernel."""
    sig_cols = [lsh_sig(F.col("e"), t).alias(f"sig{t}") for t in range(LSH_TABLES)]
    wide = v.select("vec_id", *sig_cols)
    stack = ", ".join(f"{t}, sig{t}" for t in range(LSH_TABLES))
    return wide.selectExpr("vec_id", f"stack({LSH_TABLES}, {stack}) AS (tbl, sig)")


def _lsh_sigs_long(v: DataFrame) -> DataFrame:
    """(vec_id, tbl, sig) — the vector relation exploded to one row per
    LSH table, the inverted-index key side of the candidate join.

    Built with one Arrow-batched numpy matmul per partition
    (E·S for all LSH_TABLES×LSH_BITS hyperplanes at once) — the same
    vectorized-kernel pattern as the block-matrix embedding dedup
    (operators/dedup.py): ~10× the interpreted fold chain, map-only,
    no shuffle. Sign agreement with the portable fold build is exact
    unless a projection lands within float ulps of 0 (probability
    ~1e-10 per corpus; the oracle diff would catch it)."""
    import numpy as np
    import pandas as pd

    s_mat = np.array(
        [
            [_LSH_SIGNS[(t, p)][i] for t in range(LSH_TABLES) for p in range(LSH_BITS)]
            for i in range(EMB_DIM)
        ]
    )

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            e_mat = np.array(pdf["e"].tolist(), dtype=np.float64)
            bits = (e_mat @ s_mat) > 0
            n = len(pdf)
            sigs = np.zeros((n, LSH_TABLES), dtype=np.int32)
            for t in range(LSH_TABLES):
                for p in range(LSH_BITS):
                    sigs[:, t] += bits[:, t * LSH_BITS + p].astype(np.int32) << p
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), LSH_TABLES),
                    "tbl": np.tile(np.arange(LSH_TABLES, dtype=np.int32), n),
                    "sig": sigs.reshape(-1),
                }
            )

    return v.select("vec_id", "e").mapInPandas(gen, "vec_id long, tbl int, sig int")


def _lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted LSH index — (vec_id, tbl, sig), built ONCE per
    session and reused by every probe batch (the index-build /
    index-probe split every real ANN deployment has; same memo
    lifecycle as the dedup shingle cache, operators/dedup.py)."""
    from .dedup import _memo_persist

    return _memo_persist(
        spark, sf_dir, "lsh_sigs", lambda: _lsh_sigs_long(_prepared(spark, sf_dir))
    )


def lsh_candidates(spark: SparkSession, sf_dir: str, n_queries: int = N_QUERIES) -> DataFrame:
    """Distinct (query_id, neighbor_id) pairs colliding in ≥1 LSH
    table. One equality join on (tbl, sig) against the persisted
    index — never a cross join; the probe side is n_queries×LSH_TABLES
    rows, broadcast."""
    sigs = _lsh_index(spark, sf_dir)
    probes = sigs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "tbl", "sig"
    )
    return (
        F.broadcast(probes)
        .join(sigs.select(F.col("vec_id").alias("neighbor_id"), "tbl", "sig"), ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def _lsh_sig_sql(vec_expr: str, tbl: int) -> str:
    parts = []
    for p in range(LSH_BITS):
        lits = ", ".join(str(s) for s in _LSH_SIGNS[(tbl, p)])
        proj = (
            f"list_reduce(list_transform(range(1, 1 + len({vec_expr})), "
            f"i -> ({vec_expr})[i] * ([{lits}])[i]), (a, x) -> a + x)"
        )
        parts.append(f"CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END")
    return " + ".join(parts)


def _lsh_sigs_cte() -> str:
    """sigs(vec_id, tbl, sig) as UNION ALL over tables (DuckDB twin of
    ``_lsh_sigs_long``)."""
    return "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {t} AS tbl, {_lsh_sig_sql('e', t)} AS sig FROM v"
        for t in range(LSH_TABLES)
    )


def knn_brute(vectors: DataFrame, queries: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact cosine top-k: queries × vectors, rank-filtered per query.

    The query side is broadcast (it is small by construction). The
    ``row_number().over(w) <= k`` filter is written in exactly the
    shape Spark's InferWindowGroupLimit rule (SPARK-37099) rewrites
    into two-phase top-k: the physical plan puts a Partial-mode
    WindowGroupLimit BELOW the query_id shuffle, so every scan task
    keeps only its local k rows per query (a per-partition heap,
    map-side) and the per-query merge ranks P·k winners — never the
    corpus. tests/test_plan_budget.py's const_key_windows gate pins
    that pushdown: if a refactor breaks the rank-filter pattern and
    the Partial limit disappears, the gate fails (VERDICT r8 item 1)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    v = vectors.select(F.col("vec_id").alias("neighbor_id"), "e", "nrm")
    cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_raw", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("cosine_raw", 6).alias("cosine"))
    )


def _prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized double-cast corpus (vec_id, label, e, nrm) — persisted
    per session like the dedup shingle cache: every ANN variant scans it
    2-3× (probe side, neighbor side, index build), and the cast+norm
    fold chain is the dominant per-vector expression."""
    from .dedup import _memo_persist

    def build() -> DataFrame:
        emb = parallelize(load_table(spark, sf_dir, "embeddings"))
        return emb.select("vec_id", "label", _dvec().alias("e")).withColumn(
            "nrm", _norm(F.col("e"))
        )

    return _memo_persist(spark, sf_dir, "emb_prepared", build)


def _knn_truth_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact ground-truth top-k at the standard probe set,
    memo-persisted (r11, guide §5): FOUR audit consumers (matryoshka,
    ann_quality, ann_ndcg, plus the declared brute query itself) each
    re-ran the Q×N brute pass per execution — this is the recall
    reference table a vector-store owner maintains for continuous
    monitoring, Q·k rows, index-class."""
    from .dedup import _memo_persist

    def build() -> DataFrame:
        v = _prepared(spark, sf_dir)
        return knn_brute(v, v.filter(F.col("vec_id") < N_QUERIES))

    return _memo_persist(spark, sf_dir, "knn_truth", build)


def _q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_truth_cached(spark, sf_dir)


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH ANN: candidates collide with the probe in ≥1 of
    the LSH_TABLES signature tables (equality join on (tbl, sig) —
    never a cross join), then ONLY candidates are exact-cosine ranked
    for the top-10. Recall@10 vs q_knn_brute is gated at sf0.01
    (tests/test_lsh_recall.py) together with the candidate fraction —
    the honest ANN contract: measured recall at measured cost."""
    v = _prepared(spark, sf_dir)
    cand = lsh_candidates(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    n = v.select(F.col("vec_id").alias("neighbor_id"), "e", "nrm")
    cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        cand.join(n, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine_raw", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "rk", F.round("cosine_raw", 6).alias("cosine"))
    )


def _q_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health audit: per-inverted-list occupancy — the
    maintenance signal every IVF deployment watches (hot lists make
    probe cost high-variance and recall list-dependent; the fix is
    re-training centroids or splitting hot lists). Per cid: list_size,
    its share of the corpus, and rel_to_mean (size × n_lists /
    n_vectors — 1.0 is perfectly balanced; the FAISS imbalance_factor
    is the size-weighted mean of this ratio). Completes the index
    lifecycle story: build (q_knn_ivf) → serve → MONITOR (this) →
    re-train (q_kmeans through the same centroid seam).

    Scale shape: rides the same bounded-centroid assignment as
    q_knn_ivf (broadcast K-row centroid cross, per-vector argmin
    keyed by vec_id — a data-scaling key); occupancy is one 64-cell
    aggregation; totals attach as a 1-row broadcast. No global or
    constant-key window anywhere.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (similarity family)."""
    lists = _ivf_assigned(spark, sf_dir).filter(F.col("crk") == 1).select("vec_id", "cid")
    occ = lists.groupBy("cid").agg(F.count(F.lit(1)).alias("list_size"))
    tot = occ.agg(
        F.count(F.lit(1)).alias("n_lists"), F.sum("list_size").alias("n_vectors")
    )
    return (
        occ.crossJoin(F.broadcast(tot))
        .select(
            "cid",
            "list_size",
            F.round(F.col("list_size") / F.col("n_vectors"), 6).alias("share"),
            F.round(
                F.col("list_size") * F.col("n_lists") / F.col("n_vectors"), 4
            ).alias("rel_to_mean"),
        )
    )


#: binary-quantization ANN knobs: Hamming shortlist size per query
#: before the exact rerank (50 of 500 at sf0.01 = 10% candidate rate).
BINARY_SHORTLIST = 50


def _binary_sig_cols() -> tuple:
    """The 64-bit sign mask of a 64-dim embedding as TWO 32-bit lanes
    (lo = dims 1-32, hi = dims 33-64), each carried in a BIGINT.
    Two lanes instead of one 64-bit word because bit 64 as a sign bit
    would need an overflowing 2^63 addend; sums of distinct positive
    powers of two are exact and portable. Statically unrolled CASE
    terms (the LSH-signature pattern) — whole-stage codegen, no
    Python, and the oracle mirrors the sum term-for-term. A dim count
    under 64 degrades gracefully: out-of-range access is NULL on both
    engines, and NULL > 0 contributes 0."""
    e = F.col("e")
    lo = sum(
        [F.when(e.getItem(i) > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(32)],
        F.lit(0),
    )
    hi = sum(
        [
            F.when(e.getItem(i) > 0, F.lit(1 << (i - 32))).otherwise(F.lit(0))
            for i in range(32, 64)
        ],
        F.lit(0),
    )
    return lo.cast("long").alias("lo"), hi.cast("long").alias("hi")


def _binary_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted binary-signature index — (vec_id, lo, hi), 16
    bytes per vector (a 32× compression of the 64-float embedding);
    same memo lifecycle as the LSH signature index."""
    from .dedup import _memo_persist

    return _memo_persist(
        spark,
        sf_dir,
        "binary_sigs",
        lambda: _prepared(spark, sf_dir).select("vec_id", *_binary_sig_cols()),
    )


def _q_knn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN: sign-bit masks + Hamming shortlist +
    exact cosine rerank — the RaBitQ/BQ recipe every vector store
    ships as its cheapest tier. Distance over the index is
    bit_count(xor) on two ints (no floats touched until the rerank),
    so the scan is 32× smaller and integer-exact — identical shortlist
    on any engine, which is what makes the full chain hash-checkable
    (vs error-bound-only sketches). Recall@10 vs q_knn_brute is gated
    at sf0.01 (tests/test_binary_recall.py) together with the
    candidate fraction — the honest ANN contract: measured recall at
    measured cost.

    Scale shape: probes (N_QUERIES×16 bytes) broadcast against the
    signature index — a map-only scan. The Hamming shortlist is
    two-phase top-k via InferWindowGroupLimit (SPARK-37099): a
    Partial-mode WindowGroupLimit below the query_id shuffle keeps
    BINARY_SHORTLIST rows per query PER SCAN TASK map-side, so the
    per-query merge ranks P·BINARY_SHORTLIST integer distances, never
    the corpus. The exact-cosine rerank then reuses that query_id
    partitioning shuffle-free over the ≤BINARY_SHORTLIST survivors
    (whitelisted const-key window — bounded input by construction);
    it touches BINARY_SHORTLIST float vectors per query total. Both
    stages are pinned by the const_key_windows plan gate.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (similarity family)."""
    v = _prepared(spark, sf_dir)
    sigs = _binary_sigs(spark, sf_dir)
    probes = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    ham = (
        F.broadcast(probes)
        .crossJoin(sigs.select(F.col("vec_id").alias("neighbor_id"), "lo", "hi"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
                + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
            ).alias("hamming"),
        )
    )
    wh = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    short = (
        ham.withColumn("hr", F.row_number().over(wh))
        .filter(F.col("hr") <= BINARY_SHORTLIST)
        .drop("hr")
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    n = v.select(F.col("vec_id").alias("neighbor_id"), "e", "nrm")
    cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        short.join(n, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine_raw", cos)
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rk",
            "hamming",
            F.round("cosine_raw", 6).alias("cosine"),
        )
    )


def _q_emb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health audit: per-dimension moments folded into
    the three one-number diagnostics that predict retrieval quality —
    the norm of the MEAN vector (a non-zero common direction is the
    anisotropy problem: cosine similarity saturates and ANN contrast
    collapses; the fix is mean-centering), the average per-dim
    variance (effective spread), and the max/min variance ratio
    (dimension imbalance — a few dominant dims make hyperplane LSH
    bits redundant). Run this BEFORE building the index; if
    mean_norm ≫ 0 or anisotropy ≫ 1, center/whiten first.

    Scale shape: one posexplode pass partial-aggregated to 64
    (pos, sum, sumsq) cells, then a 64-row fold — the corpus shuffles
    nothing but per-dim partials. Variance is written avg(x²)−avg(x)²
    with identical operand order on both engines (var_pop's streaming
    algorithms differ engine-to-engine)."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(F.posexplode(_dvec()).alias("pos", "x"))
    per_dim = comp.groupBy("pos").agg(
        F.avg("x").alias("m"), (F.avg(F.col("x") * F.col("x"))).alias("m2")
    )
    per_dim = per_dim.select("pos", "m", (F.col("m2") - F.col("m") * F.col("m")).alias("v"))
    n_vecs = emb.select(F.count(F.lit(1)).alias("n_vecs"))
    return (
        per_dim.agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 4).alias("mean_norm"),
            F.round(F.avg("v"), 4).alias("avg_var"),
            F.round(F.max("v") / F.min("v"), 2).alias("anisotropy"),
        )
        .crossJoin(F.broadcast(n_vecs))
        .select("n_vecs", "n_dims", "mean_norm", "avg_var", "anisotropy")
    )


def _q_emb_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-centering APPLIED — the fix q_emb_stats prescribes
    (Mu & Viswanath 2018, "All-but-the-Top": subtract the common mean
    direction and cosine contrast returns). One row per vector with
    the before/after geometry a re-indexing job audits: pre_norm,
    post_norm (norm after subtracting the corpus mean), and
    cos_to_mean (how much of the vector WAS the common direction).
    Completes detect (q_emb_stats) → locate (q_emb_principal) →
    APPLY for the embedding family — the r9 apply-theme.

    Float contract: the per-dim means are rounded at 1e-9 BEFORE use
    (engine sum order differs across a corpus aggregate — the
    q_emb_principal cell contract); everything downstream is strict
    left-fold arithmetic over (vector, mean) arrays, bit-identical on
    both engines, with 6-dp output rounding.

    Scale shape: one posexplode pass partial-aggregated to 64
    (pos, mean) cells; the mean VECTOR re-folds as a 1-row relation
    crossJoin-broadcast onto the corpus; per-vector outputs are
    map-only codegen folds — no shuffle ever carries vectors.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (similarity family)."""
    v = _prepared(spark, sf_dir)
    comp = v.select(F.posexplode("e").alias("pos", "x"))
    mean = comp.groupBy("pos").agg(F.round(F.avg("x"), 9).alias("m"))
    mvec = mean.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("mv")
    )
    centered = F.zip_with(F.col("e"), F.col("mv"), lambda a, b: a - b)
    return (
        v.crossJoin(F.broadcast(mvec))
        .select(
            "vec_id",
            "label",
            F.round(F.col("nrm"), 6).alias("pre_norm"),
            F.round(_norm(centered), 6).alias("post_norm"),
            F.round(
                _dot(F.col("e"), F.col("mv")) / (F.col("nrm") * _norm(F.col("mv"))), 6
            ).alias("cos_to_mean"),
        )
    )


def _q_emb_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregation: per-label centroid via posexplode → per-dim
    avg → re-fold. Two narrow shuffles on (label, pos) then (label)."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select("label", F.posexplode(_dvec()).alias("pos", "x"))
    per_dim = comp.groupBy("label", "pos").agg(F.avg("x").alias("cx"))
    return per_dim.groupBy("label").agg(
        F.count(F.lit(1)).alias("dim"),
        F.round(F.sqrt(F.sum(F.col("cx") * F.col("cx"))), 6).alias("centroid_norm"),
        F.round(F.sum(F.abs("cx")), 6).alias("centroid_l1"),
    )


K_CENTROIDS = 64  # FIXED centroid budget — independent of N
N_PROBE = 2


def _ivf_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized IVF coarse assignment — THE inverted-file
    index build (r12, VERDICT r11 item 6, the _pq_reconstructed
    precedent): (vec_id, cid, crk, e, nrm) at crk ≤ max(N_PROBE, 1).
    An IVF deployment assigns each vector to its list ONCE at index
    build and stores the vector inside the list (the standard FAISS
    IVF layout); before this memo all three consumers (q_knn_ivf,
    q_knn_ivfpq, q_ivf_balance) re-ran the N×K_CENTROIDS broadcast
    cross + per-vector argmin window on EVERY execution. Steady
    executions now probe the cached lists; cold pays the build by the
    shared-index contract. Rows kept: crk=1 is each vector's own list
    membership, crk ≤ N_PROBE serves the query-side probe picks —
    bounded at N_PROBE rows per vector."""
    from .dedup import _memo_persist

    def build() -> DataFrame:
        v = _prepared(spark, sf_dir)
        return (
            _ivf_assign(v)
            .filter(F.col("crk") <= max(N_PROBE, 1))
            .select("vec_id", "cid", "crk", "e", "nrm")
        )

    return _memo_persist(spark, sf_dir, "ivf_assign", build)


def _ivf_assign(v: DataFrame) -> DataFrame:
    """IVF coarse assignment: every vector ranked against the bounded
    K_CENTROIDS hash-sampled centroid set (crk=1 is its inverted list;
    crk≤N_PROBE on the query side are the probed lists). Broadcast
    K-row centroid cross + one per-vector argmin window — shared by
    q_knn_ivf and the IVF+PQ composite (via the _ivf_assigned memo)."""
    c = (
        v.withColumn("hkey", hash60(F.col("vec_id")))
        .orderBy("hkey", "vec_id")
        .limit(K_CENTROIDS)
        .select(
            F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
        )
    )
    ccos = _dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cn"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        v.crossJoin(F.broadcast(c))
        .withColumn("ccos", ccos)
        .withColumn("crk", F.row_number().over(w_assign))
    )


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize to centroids, probe the 2 nearest
    inverted lists, exact-rank within the candidate set.

    Deterministic stand-in for learned centroids (k-means would be
    non-reproducible across engines): the K_CENTROIDS vectors with the
    smallest portable hash of their vec_id — a deterministic,
    well-spread sample whose size is FIXED regardless of N, selected
    with a distributed top-K (``orderBy(hash).limit(k)`` compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort). That
    bounds the centroid broadcast at K rows and makes assignment
    O(N·K·d), the real IVF cost model; production would swap in k-means
    centroids (and √N-sized K) through the same seam. The plan is the
    IVF architecture exactly: (1) assignment = broadcast-cross vs the
    bounded centroid set, argmax by window — at scale this is the
    numpy-matmul kernel from operators/dedup.py:_q_dedup_embedding, the
    fold keeps it engine-portable here; (2) the inverted index is just
    the (cid → vec) assignment, equi-joined on cid — no cross join ever
    touches the full N×N space; recall loss vs q_knn_brute is the
    probed-fraction tradeoff (nprobe/K of the lists scanned).
    """
    assign = _ivf_assigned(spark, sf_dir)
    lists = assign.filter(F.col("crk") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "cid", "e", "nrm"
    )
    probes = assign.filter((F.col("vec_id") < N_QUERIES) & (F.col("crk") <= N_PROBE)).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn"), "cid"
    )
    cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        F.broadcast(probes)
        .join(lists, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_raw", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cid", "rk", F.round("cosine_raw", 6).alias("cosine"))
    )



PQ_M = 16  # subspaces (64 dims → 16 × 4)
PQ_SUBDIM = 4
PQ_K = 32  # codes per subspace
PQ_RERANK = 100  # ADC shortlist size fed to the exact re-rank stage


def _pq_reconstructed(spark: SparkSession, sf_dir: str, v: DataFrame) -> DataFrame:
    """PQ encode + decode: each vector's PQ-code reconstruction
    (vec_id, rec_e, nrm) — the ADC side of the two-stage design,
    shared by q_knn_pq and the IVF+PQ composite. Codebooks are the
    deterministic hash-top-K data sample (see _q_knn_pq docstring);
    encode = N·M sub-rows against the broadcast (M·K)-row codebook,
    argmin window keyed (vec_id, s).

    r11: session-memoized like :func:`_prepared` — this IS the PQ
    index build (a vector store encodes once, serves many queries);
    two declared queries consume it and every re-run re-paid the
    N·M·K encode join. Cold bench runs still pay the build."""
    from .dedup import _memo_persist

    def build() -> DataFrame:
        return _pq_reconstructed_build(v)

    return _memo_persist(spark, sf_dir, "pq_reconstructed", build)


def _pq_reconstructed_build(v: DataFrame) -> DataFrame:
    samp = (
        v.withColumn("hkey", hash60(F.col("vec_id")))
        .orderBy("hkey", "vec_id")
        .limit(PQ_K)
    )
    wj = Window.orderBy("hkey", "vec_id")  # PQ_K rows — tiny window
    cb_vec = samp.withColumn("code_id", F.row_number().over(wj)).select("code_id", "e")
    sub_idx = F.array(*[F.lit(s) for s in range(PQ_M)])
    cb = cb_vec.select(
        "code_id",
        "e",
        F.explode(sub_idx).alias("s"),
    ).withColumn("csub", F.expr(f"slice(e, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})")).drop("e")
    subs = v.select(
        "vec_id",
        F.explode(sub_idx).alias("s"),
        F.col("e"),
    ).withColumn("sub", F.expr(f"slice(e, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})")).drop("e")
    l2 = F.aggregate(
        F.zip_with("sub", "csub", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wa = Window.partitionBy("vec_id", "s").orderBy(F.asc("l2"), F.asc("code_id"))
    assign = (
        subs.join(F.broadcast(cb), "s")
        .withColumn("l2", l2)
        .withColumn("ark", F.row_number().over(wa))
        .filter(F.col("ark") == 1)
    )
    rec = assign.groupBy("vec_id").agg(
        F.flatten(
            F.transform(
                F.sort_array(F.collect_list(F.struct("s", "csub"))), lambda x: x["csub"]
            )
        ).alias("rec_e")
    )
    return rec.join(v.select("vec_id", "nrm"), "vec_id")


def _q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-ranking (VERDICT r1 item
    7): split each vector into PQ_M subspaces, quantize every
    sub-vector to the nearest of PQ_K codebook entries, shortlist the
    top PQ_RERANK neighbors by ASYMMETRIC distance (exact query ×
    reconstructed neighbor), then re-rank the shortlist with the exact
    cosine — the standard two-stage memory-bound ANN design (Jégou et
    al., "Product Quantization for Nearest Neighbor Search", TPAMI
    2011): the index stores M small code ids per vector (16×5 bits)
    instead of d floats; full vectors are touched only for the
    shortlist. Measured at sf0.01: recall@10 ≈ 0.96 vs q_knn_brute
    (ADC alone ≈ 0.38 on this near-random synthetic corpus —
    re-ranking is what makes PQ usable, tests/test_pq_recall.py).

    Deterministic stand-in for k-means codebooks so the whole pipeline
    stays oracle-checkable: the codebook of subspace s is the s-th
    sub-vector of the PQ_K hash-top-K sampled DATA vectors (same
    bounded TakeOrderedAndProject selection as the IVF centroids) —
    data-adaptive, engine-portable, and swappable for trained
    codebooks through the same seam. ADC is computed by rebuilding the
    reconstructed vector (sort_array by subspace → flatten) and taking
    ONE strict left-fold dot product per (query, neighbor) — fold
    order is deterministic, so both engines produce bit-identical
    doubles and identical rankings (a groupBy-sum over per-subspace
    partials would be order-nondeterministic).

    Scale shape: encode = N·M sub-rows × broadcast (M·K)-row codebook,
    argmin window keyed (vec_id, s); shortlist = broadcast queries ×
    coded vectors, one window per query; re-rank touches only
    Q·PQ_RERANK exact rows — no shuffle ever carries N² rows.
    """
    v = _prepared(spark, sf_dir)
    neigh = _pq_reconstructed(spark, sf_dir, v).select(
        F.col("vec_id").alias("neighbor_id"), "rec_e", "nrm"
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    adc_cos = _dot(F.col("qe"), F.col("rec_e")) / (F.col("qn") * F.col("nrm"))
    wa2 = Window.partitionBy("query_id").orderBy(F.desc("adc_raw"), F.asc("neighbor_id"))
    shortlist = (
        F.broadcast(q)
        .crossJoin(neigh)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_raw", adc_cos)
        .withColumn("srk", F.row_number().over(wa2))
        .filter(F.col("srk") <= PQ_RERANK)
        .select("query_id", "qe", "qn", "neighbor_id")
    )
    # r11: the shortlist is QUERY-bounded (Q x rerank rows at any
    # corpus scale) — broadcast it so the exact re-rank streams the
    # corpus side with no exchange/sort (was a shuffle join)
    exact = F.broadcast(shortlist).join(
        v.select(F.col("vec_id").alias("neighbor_id"), "e", "nrm"), "neighbor_id"
    )
    exact_cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        exact.withColumn("cosine_raw", exact_cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "rk", F.round("cosine_raw", 6).alias("cosine"))
    )


MATRYOSHKA_DIMS = (8, 16, 32)  # audited prefix truncations of the 64-dim corpus


def _q_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022): can the
    64-dim embeddings be served at 8/16/32 prefix dims? Per truncation:
    mean recall@10 of the truncated-cosine top-k against the FULL-dim
    exact top-k (the retrieval cost of truncation) and the mean energy
    fraction ‖v[:d]‖²/‖v‖² (the geometry explanation) — the
    storage-vs-quality table a vector-store owner reads before cutting
    index size 2-8×.

    Scale shape: like q_ann_quality, the recall side is PROBE-bounded —
    r11: the broadcast query set crosses the corpus ONCE for all
    truncations (one pass computing every prefix cosine, per-dim norms
    precomputed per SIDE before the join, the per-dim cells exploded
    after) instead of once per truncation — same dot/norm expression
    trees per element, so every cosine is bit-identical to the
    per-pass form, and the (trunc_dim, query_id)-keyed rank filter
    still plans as two-phase top-k (Partial WindowGroupLimit map-side,
    P·k-row merge per key — the q_knn_brute contract); the energy side
    is one map-only fold pass collapsing to |dims| cells. Both engines
    fold dot products left-to-right over identical doubles, so
    rankings agree bit-exactly (the q_knn_brute contract).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (similarity family)."""
    v = _prepared(spark, sf_dir)
    truth = _knn_truth_cached(spark, sf_dir).select("query_id", "neighbor_id")

    def with_dim_slices(df: DataFrame, idc: str, side: str) -> DataFrame:
        # per-VECTOR prefix arrays + norms, computed once per row
        # BEFORE the crossJoin — per-pair work is then only the folds
        sliced = df.select(
            F.col("vec_id").alias(idc),
            *[F.slice(F.col("e"), 1, d).alias(f"_e{d}_{side}") for d in MATRYOSHKA_DIMS],
        )
        return sliced.select(
            idc,
            *[F.col(f"_e{d}_{side}") for d in MATRYOSHKA_DIMS],
            *[
                _norm(F.col(f"_e{d}_{side}")).alias(f"_n{d}_{side}")
                for d in MATRYOSHKA_DIMS
            ],
        )

    q = with_dim_slices(v.filter(F.col("vec_id") < N_QUERIES), "query_id", "q")
    n = with_dim_slices(v, "neighbor_id", "n")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("trunc_dim"),
                    (
                        _dot(F.col(f"_e{d}_q"), F.col(f"_e{d}_n"))
                        / (F.col(f"_n{d}_q") * F.col(f"_n{d}_n"))
                    ).alias("c"),
                )
                for d in MATRYOSHKA_DIMS
            ]
        )
    )
    w = Window.partitionBy("trunc_dim", "query_id").orderBy(
        F.desc("c"), F.asc("neighbor_id")
    )
    per = (
        F.broadcast(q)
        .crossJoin(n)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cells.alias("s"))
        .select("query_id", "neighbor_id", "s.trunc_dim", "s.c")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("trunc_dim", "query_id", "neighbor_id")
    )
    hits = (
        per.join(truth, ["query_id", "neighbor_id"])
        .groupBy("trunc_dim", "query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    probes = truth.select("query_id").distinct()
    dims_df = spark.createDataFrame([(d,) for d in MATRYOSHKA_DIMS], "trunc_dim int")
    recall = (
        probes.crossJoin(F.broadcast(dims_df))
        .join(hits, ["trunc_dim", "query_id"], "left")
        .groupBy("trunc_dim")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(
                F.avg(F.coalesce(F.col("n_rel"), F.lit(0)) / float(TOP_K)), 4
            ).alias("mean_recall"),
        )
    )

    def sq(c):  # sum of squares, left-to-right fold (mirrors list_reduce)
        return F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)

    energy = (
        v.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("trunc_dim"),
                            F.round(
                                sq(F.slice(F.col("e"), 1, d)) / sq(F.col("e")), 6
                            ).alias("energy"),
                        )
                        for d in MATRYOSHKA_DIMS
                    ]
                )
            ).alias("s")
        )
        .select("s.*")
        .groupBy("trunc_dim")
        .agg(F.round(F.avg("energy"), 4).alias("mean_energy"))
    )
    return recall.join(energy, "trunc_dim").transform(cells_sorted, "trunc_dim")  # <= |MATRYOSHKA_DIMS| rows


def _q_ann_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality AUDIT as a first-class query: every ANN variant's
    recall and MRR against the exact brute-force top-10, one row per
    method — the continuous-monitoring face of the one-off recall
    gates in tests/ (a production vector store recomputes this on a
    sample whenever the index or the corpus drifts).

    recall = |method ∩ brute-top10| / 10 per probe, averaged; mrr =
    mean over probes of 1/(method rank of the first true neighbor), 0
    when the method misses entirely. Each method is audited AS
    CONFIGURED (IVF returns its top-5, the others top-10) — the audit
    measures what the deployed query serves, not an idealized k."""
    methods = {
        "lsh": _q_knn_lsh,
        "ivf": _q_knn_ivf,
        "pq": _q_knn_pq,
        "ivfpq": _q_knn_ivfpq,
    }
    truth = _q_knn_brute(spark, sf_dir).select("query_id", "neighbor_id")
    per = None
    for mname, fn in methods.items():
        m = fn(spark, sf_dir).select(
            F.lit(mname).alias("method"), "query_id", "neighbor_id", "rk"
        )
        per = m if per is None else per.unionByName(m)
    rel = per.join(truth, ["query_id", "neighbor_id"])
    probes = truth.select("query_id").distinct()
    # explicit broadcast of the 4-row method relation: without stats
    # Spark planned this literal cross join as CartesianProductExec,
    # the one plan shape the registry-wide budget gate bans outright
    grid = probes.crossJoin(
        F.broadcast(spark.createDataFrame([(m,) for m in methods], ["method"]))
    )
    hits = rel.groupBy("method", "query_id").agg(
        F.count(F.lit(1)).alias("n_rel"), F.min("rk").alias("first_rel")
    )
    return (
        grid.join(hits, ["method", "query_id"], "left")
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(F.avg(F.coalesce("n_rel", F.lit(0)) / float(TOP_K)), 4).alias(
                "mean_recall"
            ),
            F.round(
                F.avg(F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0))), 4
            ).alias("mean_mrr"),
        )
    )


PCA_ITERS = 3  # unrolled power-iteration steps
_PR = 9  # per-iteration rounding (cross-engine float gate)


def _q_emb_principal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principal-direction audit: the top eigenvector of the embedding
    COVARIANCE by declarative power iteration — the measurement behind
    the standard anisotropy fix (Mu & Viswanath 2018, "All-but-the-
    Top": remove the mean and the top principal directions and cosine
    contrast comes back). q_emb_stats says WHETHER the space is
    anisotropic; this says WHERE: the top eigenvalue's share of total
    variance and the dominant dimension of the leading direction.

    Scale shape: covariance cells come from a double-explode of the
    corpus partial-aggregated to dim² cells BEFORE the exchange (the
    shuffle carries ≤4096 cells per partition, never vectors); the
    PCA_ITERS power steps are joins between the dim²-cell matrix and
    a dim-row vector relation — matrix-vector products as cell joins,
    no driver linear algebra; per-iteration renormalization rounds at
    1e-9 on both engines so float drift can't compound. Output: one
    row (n_dims, top_eigenvalue, trace, top_share, leading_dim).

    Engine parity note: the per-cell E[xi·xj] means are rounded at
    1e-9 before entering the iteration, the iteration renormalizes
    with the same rounded arithmetic, and the Rayleigh quotient is
    rounded at 1e-4 on output."""
    from .dedup import _memo_persist

    def build_cov() -> DataFrame:
        v = _prepared(spark, sf_dir)
        comp = v.select("vec_id", F.posexplode("e").alias("j", "xj"), F.col("e"))
        cells = (
            comp.select("j", "xj", F.posexplode("e").alias("i", "xi"))
            .groupBy("j", "i")
            .agg(F.avg(F.col("xj") * F.col("xi")).alias("m2"))
        )
        means = (
            v.select(F.posexplode("e").alias("i", "x"))
            .groupBy("i")
            .agg(F.avg("x").alias("m"))
        )
        return (
            cells.join(means.select(F.col("i").alias("j"), F.col("m").alias("mj")), "j")
            .join(means.select("i", F.col("m").alias("mi")), "i")
            .select(
                "j", "i", F.round(F.col("m2") - F.col("mj") * F.col("mi"), _PR).alias("c")
            )
        )

    # dim² cells, ONE corpus pass — persisted: the unrolled iteration
    # references it 2·ITERS+2 times and would otherwise re-scan the
    # corpus per reference (~420 stages before; ~40 after)
    cov = _memo_persist(spark, sf_dir, "emb_cov", build_cov).coalesce(1)
    b = cov.filter(F.col("i") == F.col("j")).select(
        "i", F.lit(0.125).alias("b")
    )  # uniform 1/sqrt(64)
    for _ in range(PCA_ITERS):
        raw = (
            cov.join(b, "i")
            .groupBy("j")
            .agg(F.round(F.sum(F.col("c") * F.col("b")), _PR).alias("r"))
            .coalesce(1)  # dim rows: keep the iteration single-partition
        )
        nrm = raw.agg(F.round(F.sqrt(F.sum(F.col("r") * F.col("r"))), _PR).alias("n"))
        # localCheckpoint: b is referenced by the next iteration AND by
        # cb/lam/lead/nd below — without truncation the dim-row chain
        # re-executes multiplicatively (measured 10 s of scheduler for
        # a 64-row vector; ~1 s with per-iteration truncation)
        b = (
            raw.crossJoin(F.broadcast(nrm))
            .select(F.col("j").alias("i"), F.round(F.col("r") / F.col("n"), _PR).alias("b"))
            .localCheckpoint()
        )
    # Rayleigh quotient λ = bᵀCb and the trace = Σ C_ii
    cb = (
        cov.join(b, "i")
        .groupBy("j")
        .agg(F.round(F.sum(F.col("c") * F.col("b")), _PR).alias("cb"))
    )
    lam = (
        cb.join(b.select(F.col("i").alias("j"), "b"), "j")
        .agg(F.sum(F.col("cb") * F.col("b")).alias("lam"))
    )
    tr = cov.filter(F.col("i") == F.col("j")).agg(F.sum("c").alias("trace"))
    lead = (
        b.orderBy(F.desc(F.abs(F.col("b"))), F.asc("i"))
        .limit(1)
        .select(F.col("i").alias("leading_dim"))
    )
    nd = b.agg(F.count(F.lit(1)).alias("n_dims"))
    return (
        nd.crossJoin(lam)
        .crossJoin(tr)
        .crossJoin(lead)
        .select(
            "n_dims",
            F.round("lam", 4).alias("top_eigenvalue"),
            F.round("trace", 4).alias("trace"),
            F.round(F.col("lam") / F.col("trace"), 4).alias("top_share"),
            "leading_dim",
        )
    )


def _emb_principal_oracle() -> str:
    steps = []
    prev = "b0"
    for it in range(1, PCA_ITERS + 1):
        steps.append(
            f"""r{it} AS (
  SELECT c.j, round(sum(c.c * b.b), {_PR}) AS r
  FROM cov c JOIN {prev} b ON c.i = b.i GROUP BY c.j
),
n{it} AS (SELECT round(sqrt(sum(r * r)), {_PR}) AS n FROM r{it}),
b{it} AS (
  SELECT r.j AS i, round(r.r / n.n, {_PR}) AS b FROM r{it} r CROSS JOIN n{it} n
)"""
        )
        prev = f"b{it}"
    body = ",\n".join(steps)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
comp AS (
  SELECT vec_id, gj.j - 1 AS j, e[gj.j] AS xj, e
  FROM v CROSS JOIN range(1, 65) gj(j)
),
cells AS (
  SELECT j, gi.i - 1 AS i, avg(xj * e[gi.i]) AS m2
  FROM comp CROSS JOIN range(1, 65) gi(i)
  GROUP BY j, gi.i - 1
),
means AS (
  SELECT g.i - 1 AS i, avg(e[g.i]) AS m
  FROM v CROSS JOIN range(1, 65) g(i) GROUP BY g.i - 1
),
cov AS (
  SELECT ce.j, ce.i, round(ce.m2 - mj.m * mi.m, {_PR}) AS c
  FROM cells ce
  JOIN means mj ON mj.i = ce.j
  JOIN means mi ON mi.i = ce.i
),
b0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS b FROM means),
{body},
cb AS (
  SELECT c.j, round(sum(c.c * b.b), {_PR}) AS cb
  FROM cov c JOIN b{PCA_ITERS} b ON c.i = b.i GROUP BY c.j
),
lam AS (
  SELECT sum(cb.cb * b.b) AS lam
  FROM cb JOIN b{PCA_ITERS} b ON b.i = cb.j
),
tr AS (SELECT sum(c) AS trace FROM cov WHERE i = j),
lead AS (
  SELECT CAST(i AS INTEGER) AS leading_dim FROM b{PCA_ITERS}
  ORDER BY abs(b) DESC, i ASC LIMIT 1
),
nd AS (SELECT CAST(count(1) AS BIGINT) AS n_dims FROM b{PCA_ITERS})
SELECT n_dims,
       round(lam, 4) AS top_eigenvalue,
       round(trace, 4) AS trace,
       round(lam / trace, 4) AS top_share,
       leading_dim
FROM nd CROSS JOIN lam CROSS JOIN tr CROSS JOIN lead
"""


#: IDCG@10 for the linear gain g(i) = 11−i with ln(1+i) discount —
#: computed once in Python and embedded as the SAME double literal in
#: both engines, so the normalization can't drift.
import math as _math

NDCG_IDCG = sum((11 - i) / _math.log(1 + i) for i in range(1, TOP_K + 1))


def _q_ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 audit of every ANN variant — the graded-relevance
    companion to q_ann_quality's recall/MRR: recall treats all ten
    true neighbors equally, NDCG pays more for retrieving the TOP
    true neighbors early (gain 11−brute_rank, ln(1+rank) discount) —
    the metric that distinguishes 'found the ten' from 'found the
    best ones first'. Same composition contract as q_ann_quality:
    each method is audited AS CONFIGURED, oracle composes the
    per-method SQL verbatim.

    Output: (method, n_queries, mean_ndcg)."""
    methods = {
        "lsh": _q_knn_lsh,
        "ivf": _q_knn_ivf,
        "pq": _q_knn_pq,
        "ivfpq": _q_knn_ivfpq,
    }
    truth = _q_knn_brute(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rk").alias("brk")
    )
    per = None
    for mname, fn in methods.items():
        m = fn(spark, sf_dir).select(
            F.lit(mname).alias("method"), "query_id", "neighbor_id", "rk"
        )
        per = m if per is None else per.unionByName(m)
    rel = per.join(truth, ["query_id", "neighbor_id"])
    dcg = rel.groupBy("method", "query_id").agg(
        F.sum(
            (F.lit(11) - F.col("brk")) / F.log(F.lit(1.0) + F.col("rk"))
        ).alias("dcg")
    )
    probes = truth.select("query_id").distinct()
    # explicit broadcast of the 4-row method relation: without stats
    # Spark planned this literal cross join as CartesianProductExec,
    # the one plan shape the registry-wide budget gate bans outright
    grid = probes.crossJoin(
        F.broadcast(spark.createDataFrame([(m,) for m in methods], ["method"]))
    )
    return (
        grid.join(dcg, ["method", "query_id"], "left")
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(
                F.avg(F.coalesce("dcg", F.lit(0.0)) / F.lit(NDCG_IDCG)), 4
            ).alias("mean_ndcg"),
        )
    )


def _ann_ndcg_oracle() -> str:
    unions = "\n  UNION ALL\n".join(
        f"  SELECT '{m}' AS method, query_id, neighbor_id, rk FROM (\n{ORACLE[f'q_knn_{m}']}\n) sub_{m}"
        for m in ("lsh", "ivf", "pq", "ivfpq")
    )
    return f"""
WITH truth AS (
  SELECT query_id, neighbor_id, rk AS brk FROM (
{ORACLE['q_knn_brute']}
  ) tb
),
m AS (
{unions}
),
rel AS (
  SELECT m.method, m.query_id, m.rk, t.brk
  FROM m JOIN truth t USING (query_id, neighbor_id)
),
dcg AS (
  SELECT method, query_id, sum((11 - brk) / ln(1.0 + rk)) AS dcg
  FROM rel GROUP BY method, query_id
),
probes AS (SELECT DISTINCT query_id FROM truth),
grid AS (
  SELECT g.method, p.query_id
  FROM probes p CROSS JOIN (VALUES ('lsh'), ('ivf'), ('pq'), ('ivfpq')) g(method)
)
SELECT method,
       CAST(count(1) AS BIGINT) AS n_queries,
       round(avg(COALESCE(dcg, 0.0) / {NDCG_IDCG!r}), 4) AS mean_ndcg
FROM grid LEFT JOIN dcg USING (method, query_id)
GROUP BY method
"""


IVFPQ_RERANK = 50  # ADC shortlist within the probed lists


def _q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composite ANN — the FAISS IVFADC architecture (Jégou et
    al. 2011 §IV): the coarse quantizer prunes the corpus to the
    N_PROBE probed inverted lists, PQ asymmetric distance scores ONLY
    those candidates, and the exact re-rank touches only the ADC
    shortlist. Composes the two oracle-proven pieces through their
    shared helpers (_ivf_assign, _pq_reconstructed); this simplified
    form quantizes raw vectors rather than centroid residuals (the
    classic IVFADC refinement — same seam, swap _pq_reconstructed's
    input for v − centroid).

    Scale shape: memory cost is M code-ids per vector; per query the
    ADC work is |probed lists| ≈ nprobe·N/K rows instead of N (the PQ
    form's corpus-wide ADC scan), and every join is an equality join
    on cid / neighbor_id — the standard billion-scale layout."""
    v = _prepared(spark, sf_dir)
    assign = _ivf_assigned(spark, sf_dir)
    lists = assign.filter(F.col("crk") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "cid"
    )
    probes = assign.filter((F.col("vec_id") < N_QUERIES) & (F.col("crk") <= N_PROBE)).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn"), "cid"
    )
    rec = _pq_reconstructed(spark, sf_dir, v).select(
        F.col("vec_id").alias("neighbor_id"), "rec_e", F.col("nrm").alias("rnrm")
    )
    adc_cos = _dot(F.col("qe"), F.col("rec_e")) / (F.col("qn") * F.col("rnrm"))
    wa = Window.partitionBy("query_id").orderBy(F.desc("adc_raw"), F.asc("neighbor_id"))
    shortlist = (
        F.broadcast(probes)
        .join(lists, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(rec, "neighbor_id")
        .withColumn("adc_raw", adc_cos)
        .withColumn("srk", F.row_number().over(wa))
        .filter(F.col("srk") <= IVFPQ_RERANK)
        .select("query_id", "qe", "qn", "neighbor_id")
    )
    # r11: the shortlist is QUERY-bounded (Q x rerank rows at any
    # corpus scale) — broadcast it so the exact re-rank streams the
    # corpus side with no exchange/sort (was a shuffle join)
    exact = F.broadcast(shortlist).join(
        v.select(F.col("vec_id").alias("neighbor_id"), "e", "nrm"), "neighbor_id"
    )
    exact_cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        exact.withColumn("cosine_raw", exact_cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "rk", F.round("cosine_raw", 6).alias("cosine"))
    )


def _q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the standard
    4× compression for vector stores: per-vector max-abs scale, codes =
    round-half-up(x/scale), reconstruction MSE. Pure array HOFs, no
    Python, map-only; at 100 TB this is the pre-pass that shrinks the
    ANN index shuffle 4×. Half-up rounding is written as
    floor(x/scale + 0.5) so both engines round identically (bare
    round() differs on negative halves between dialects).

    The checked output is (n_dims, scale, max_code, min_code): this
    corpus puts some x/scale values within 1 ulp of a floor boundary,
    where Spark's and DuckDB's (both-correct) last-bit ratios round to
    different codes — per-element mse is therefore NOT exactly
    portable and is bounded in tests/test_quantize.py instead of
    hash-diffed."""
    emb = parallelize(load_table(spark, sf_dir, "embeddings"))
    v = F.col("embedding")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / 127.0
    base = emb.select("vec_id", v.alias("v"), scale.alias("scale"))
    sc = F.col("scale")
    codes = F.transform(F.col("v"), lambda x: F.floor(x.cast("double") / sc + 0.5).cast("int"))
    return base.select(
        "vec_id",
        F.size(F.col("v")).alias("n_dims"),
        F.round(sc, 8).alias("scale"),
        F.array_max(codes).alias("max_code"),
        F.array_min(codes).alias("min_code"),
    )


#: size-dispatch threshold for the full-depth per-query rank (VERDICT
#: r9 item 1): below this many TOTAL candidate rows the plain
#: ``Window.partitionBy(query_id)`` rank wins — one exchange, one
#: in-task sort of ≤ threshold rows — and the interleaved r10 A/B
#: measured the two-pass form costing 1.5-1.9× at sf0.1 (its extra
#: range-partition exchange + offsets broadcast + rebase join are pure
#: overhead at this size). Above it the window form is the 100×
#: scale-killer (one task sorts a corpus slice) and the grouped
#: two-pass rank takes over. The estimate is a construction-time
#: UPPER BOUND (N_QUERIES × corpus rows from parquet footer metadata —
#: no Spark job), so growth can only flip dispatch TOWARD the
#: scale-safe form. 2M rows ≈ tens of MB of (long,long,double) —
#: comfortably one task's sort on any executor profile.
RANK_WINDOW_MAX_CANDIDATES = 2_000_000


def _corpus_rows_hint(sf_dir: str, table: str = "embeddings") -> int | None:
    """Row count from the parquet FOOTER (driver-side metadata read, no
    Spark job — safe at plan-construction time). None if unreadable:
    callers must then choose the scale-safe form.

    Failure modes are DISTINGUISHED (r10 advice — a blanket swallow
    silently flipped every rank to the two-pass form and left the
    const_key_windows plan facts failing with no hint why):
    file-shaped absence (missing path, directory-style table) returns
    None quietly — expected layouts; an ImportError (no pyarrow) or
    any other surprise WARNS once so the dispatch degradation is
    visible in the log it changes."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        import pyarrow.parquet as pq
    except ImportError as e:  # pragma: no cover - env without pyarrow
        _warn_hint_unavailable(f"pyarrow unavailable ({e})")
        return None
    try:
        return pq.ParquetFile(path).metadata.num_rows
    except (FileNotFoundError, IsADirectoryError):
        return None  # absent or directory-style table: expected shapes
    except OSError as e:
        # pyarrow raises plain OSError for directory-style parquet;
        # only warn when the path is NOT a directory (a real surprise)
        if os.path.isdir(path):
            return None
        _warn_hint_unavailable(f"footer read failed for {path}: {e}")
        return None
    except Exception as e:  # pragma: no cover - defensive
        _warn_hint_unavailable(f"footer read failed for {path}: {e}")
        return None


_HINT_WARNED = False


def _warn_hint_unavailable(reason: str) -> None:
    global _HINT_WARNED
    if _HINT_WARNED:
        return
    _HINT_WARNED = True
    import warnings

    warnings.warn(
        f"parquet footer row hint unavailable ({reason}); full-depth "
        "ranks will use the scale-safe two-pass form everywhere and "
        "const-key-window plan facts will differ",
        RuntimeWarning,
        stacklevel=3,
    )


def _per_query_rank(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    scored: DataFrame,
    score_col: str,
    rank_name: str,
    n_hint: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rank) — per-query 1-based rank by
    (score DESC, neighbor_id), SIZE-DISPATCHED (VERDICT r9 item 1).

    RRF consumes every candidate's FULL rank (no top-k cut), so
    InferWindowGroupLimit cannot fire and a
    ``Window.partitionBy(query_id)`` sorts each query's whole
    candidate slice in ONE task — the 100× scale-killer VERDICT r8
    item 1 retired. But the r10 interleaved A/B showed the scale-safe
    replacement (grouped two-pass rank) costs 1.5-1.9× at sf0.1, where
    the slices are tiny. So: ``n_hint`` (a construction-time UPPER
    BOUND on total candidate rows, from parquet footer metadata) picks
    the form —

    - ``n_hint ≤ RANK_WINDOW_MAX_CANDIDATES``: the window form. The
      per-task sort is bounded by the hint, which bounds it by the
      threshold — a whitelisted const-key window
      (plans/budget.CONST_KEY_WINDOW_WHITELIST documents the bound).
    - otherwise (or no hint): the grouped two-pass rank
      (sampling.global_row_numbers — range partition on the total
      order (query_id, −score, neighbor_id), pid-local arithmetic row
      numbers, broadcast triangular offsets), rebased per query by
      subtracting the query's min global row number (an
      N_QUERIES-cell aggregate, broadcast back). Zero WindowExec
      nodes; no task ever sorts more than a stripe.

    The two forms are bit-identical (tests/test_rank_dispatch.py
    asserts equality on the same scored relation), so dispatch only
    moves the physical plan, never the result."""
    if n_hint is not None and n_hint <= RANK_WINDOW_MAX_CANDIDATES:
        w = Window.partitionBy("query_id").orderBy(
            F.desc(score_col), F.asc("neighbor_id")
        )
        return scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("int").alias(rank_name),
        )
    from .dedup import _memo_persist
    from .sampling import global_row_numbers

    rn = global_row_numbers(
        scored,
        ["query_id", F.desc(score_col), "neighbor_id"],
        memo=lambda build: _memo_persist(spark, sf_dir, tag, build),
    )
    base = rn.groupBy("query_id").agg(F.min("rn").alias("_base"))
    return rn.join(F.broadcast(base), "query_id").select(
        "query_id",
        "neighbor_id",
        (F.col("rn") - F.col("_base") + 1).cast("int").alias(rank_name),
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant

#: posting-list document-frequency cutoff for hybrid ANN candidate
#: generation: a shingle present in more than this many documents is a
#: stop-shingle — it carries no discriminative lexical signal and its
#: posting list is the join-skew hot spot (the MOSS df-cutoff idea,
#: operators/text.py winnow match).
HYBRID_DF_CUTOFF = 50


def _q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009): for each probe document, rank every other document BOTH
    lexically (shared-shingle count — sparse/BM25-family signal, over
    the memoized shingle relation) and semantically (embedding
    cosine), then fuse with RRF = 1/(K+r_lex) + 1/(K+r_vec) and keep
    the top-k. This is the modern RAG retrieval stack in one query;
    probe ids align across documents/embeddings (doc_id == vec_id by
    the generator's construction).

    Scale shape: both modality scorings broadcast the tiny probe set
    against their corpus relation (map-only scoring). Each modality's
    rank is consumed at FULL depth by RRF (no top-k cut), so ranking
    goes through the SIZE-DISPATCHED :func:`_per_query_rank` (r10):
    under RANK_WINDOW_MAX_CANDIDATES total candidates (every shipped
    sf tier) it plans the plain per-query window — two whitelisted
    const-key WindowExec nodes, the recorded dossier shape — and above
    the bound (or with no footer hint) it switches to the grouped
    two-pass rank so no task ever sorts a corpus slice (VERDICT r8
    item 1 / r9 item 1). The fusion join carries two rank columns per
    (probe, doc) — at 100 TB each modality would feed from its
    ANN/index variant through the same rank-join seam. RRF terms are
    1/(int+int) doubles added in a fixed order — bit-identical across
    engines."""
    from .dedup import _shingled_cached

    v = _prepared(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    vv = v.select(F.col("vec_id").alias("neighbor_id"), "e", "nrm")
    cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    scored_v = (
        F.broadcast(q)
        .crossJoin(vv)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .select("query_id", "neighbor_id", "cos")
    )
    emb_rows = _corpus_rows_hint(sf_dir, "embeddings")
    doc_rows = _corpus_rows_hint(sf_dir, "documents")
    vec_hint = N_QUERIES * emb_rows if emb_rows is not None else None
    lex_hint = N_QUERIES * doc_rows if doc_rows is not None else None
    vec_rank = _per_query_rank(
        spark, sf_dir, "hyb_vec_rn", scored_v, "cos", "vec_rank", n_hint=vec_hint
    )
    sh = _shingled_cached(spark, sf_dir)
    p = sh.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("sh").alias("psh")
    )
    scored_l = (
        F.broadcast(p)
        .crossJoin(sh.select(F.col("doc_id").alias("neighbor_id"), "sh"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("overlap", F.size(F.array_intersect("psh", "sh")))
        .select("query_id", "neighbor_id", "overlap")
    )
    lex_rank = _per_query_rank(
        spark, sf_dir, "hyb_lex_rn", scored_l, "overlap", "lex_rank", n_hint=lex_hint
    )
    rrf = 1.0 / (F.lit(RRF_K) + F.col("lex_rank")) + 1.0 / (
        F.lit(RRF_K) + F.col("vec_rank")
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        lex_rank.join(vec_rank, ["query_id", "neighbor_id"])
        .withColumn("rrf", rrf)
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "lex_rank",
            "vec_rank",
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


def _posting_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted lexical index — (doc_id, sgl) distinct shingle
    postings with stop-shingles (df > HYBRID_DF_CUTOFF) dropped; built
    once per session over the memoized shingle relation, probed by
    every hybrid query batch."""
    from .dedup import _memo_persist, _shingled_cached

    def build() -> DataFrame:
        sh = _shingled_cached(spark, sf_dir)
        post = sh.select("doc_id", F.explode(F.array_distinct("sh")).alias("sgl"))
        keep = (
            post.groupBy("sgl")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= HYBRID_DF_CUTOFF)
        )
        return post.join(keep.select("sgl"), "sgl")

    return _memo_persist(spark, sf_dir, "hybrid_postk", build)


def _q_hybrid_search_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval through the ANN/index seam (VERDICT r2 item 3):
    the same RRF rank-join as q_hybrid_search, but NEITHER modality
    ranks the full corpus. Vector candidates come from the hyperplane-
    LSH bucket equi-join (≈N/2^planes of the corpus per probe);
    lexical candidates come from the shingle posting-list equi-join
    with a document-frequency cutoff (stop-shingles dropped — the skew
    guard that bounds every posting list). Each modality ranks ONLY
    its candidate set, and fusion is a full-outer rank join where a
    modality that didn't propose a document simply contributes no RRF
    term — standard index-backed hybrid retrieval semantics.

    Scale shape vs the exact form: the exact q_hybrid_search is two
    broadcast-nested-loop scans of the corpus per probe batch (kept as
    the measurable-recall baseline); this form is two EQUALITY joins
    (bucket id, shingle hash) whose touched set is the candidates —
    at 100 TB that is the difference between index probes and full
    scans. Plan-asserted: no BroadcastNestedLoopJoin / CartesianProduct
    anywhere (tests/test_plans_r3.py); recall vs the exact top-10 is
    gated in tests/test_hybrid_recall.py."""
    from .dedup import _shingled_cached

    v = _prepared(spark, sf_dir)
    cand = lsh_candidates(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    n = v.select(F.col("vec_id").alias("neighbor_id"), "e", "nrm")
    cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    scored_v = (
        cand.join(n, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cos", cos)
        .select("query_id", "neighbor_id", "cos")
    )
    # candidate sets are SUBSETS of the exact form's (bucket/posting
    # equi-joins), so the exact form's upper bounds dispatch safely here
    emb_rows = _corpus_rows_hint(sf_dir, "embeddings")
    doc_rows = _corpus_rows_hint(sf_dir, "documents")
    vec_rank = _per_query_rank(
        spark, sf_dir, "hyban_vec_rn", scored_v, "cos", "vec_rank",
        n_hint=N_QUERIES * emb_rows if emb_rows is not None else None,
    )
    postk = _posting_index(spark, sf_dir)
    probes = postk.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "sgl"
    )
    scored_l = (
        F.broadcast(probes)
        .join(postk.select(F.col("doc_id").alias("neighbor_id"), "sgl"), "sgl")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    lex_rank = _per_query_rank(
        spark, sf_dir, "hyban_lex_rn", scored_l, "overlap", "lex_rank",
        n_hint=N_QUERIES * doc_rows if doc_rows is not None else None,
    )
    rrf = F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        lex_rank.join(vec_rank, ["query_id", "neighbor_id"], "full_outer")
        .withColumn("rrf", rrf)
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "lex_rank",
            "vec_rank",
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


SEM_CONTAM_THRESH = 0.38  # max-cosine cutoff (top ~5% tail at sf0.01)
SEM_BENCH_CAP = 25_000  # benchmark suites are FIXED-size: cap the suite
# at label-0 vectors below this id so the probe side stays O(suite) as
# the corpus grows (does not bind at the sf0.01 oracle gate or sf0.1
# bench; at sf1+ it models the real fixed eval set)


def _q_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination — the embedding-space
    companion to q_contamination's trigram sweep: corpus vectors whose
    nearest BENCHMARK vector (here: the label-0 suite, standing in for
    an eval set's embeddings) exceeds SEM_CONTAM_THRESH cosine are
    paraphrase-level contamination candidates that n-gram overlap
    misses entirely. Output: each flagged corpus vector with its best
    benchmark match and the cosine.

    Scale shape: benchmark suites are small (10³-10⁴ vectors), so the
    benchmark side BROADCASTS and the 100 TB corpus is scanned ONCE
    map-side; the only shuffle carries one (vec_id, best, cos) cell
    per corpus vector into the min(struct) argmax aggregation (a
    groupBy, so the combine happens map-side — a window would shuffle
    the full corpus×bench scored product). The
    LSH/IVF index variants (q_knn_lsh seam) slot in as the candidate
    generator when even |corpus|×|bench| dot products are too many —
    exact form kept as the oracle, same contract as q_hybrid_search."""
    v = _prepared(spark, sf_dir)
    bench = sem_bench_side(v)
    corpus = v.filter(F.col("label") != 0).select("vec_id", "e", "nrm")
    return sem_contam_flags(corpus, bench)


def sem_bench_side(v: DataFrame) -> DataFrame:
    """The fixed-size benchmark suite projection (label-0, id-capped)."""
    return v.filter(
        (F.col("label") == 0) & (F.col("vec_id") < SEM_BENCH_CAP)
    ).select(
        F.col("vec_id").alias("bench_id"), F.col("e").alias("be"), F.col("nrm").alias("bn")
    )


def sem_contam_flags(corpus: DataFrame, bench: DataFrame) -> DataFrame:
    """Shared scoring block for the batch sweep and its streaming twin
    (both pin the SAME oracle, so the math must live in one place).

    Argmax via min(struct(−cos, bench_id)) — a partial-aggregable
    groupBy, so the exchange carries ONE cell per corpus vector (a
    row_number window would shuffle the full |corpus|×|bench| scored
    product: windows have no map-side combine). Tie semantics equal
    the oracle's (cosine DESC, bench_id ASC) window."""
    cos = _dot(F.col("be"), F.col("e")) / (F.col("bn") * F.col("nrm"))
    return (
        corpus.crossJoin(F.broadcast(bench))
        .select("vec_id", F.col("bench_id"), cos.alias("cosine_raw"))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cosine_raw")).alias("nc"), F.col("bench_id").alias("b")
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.b").alias("bench_id"),
            (-F.col("m.nc")).alias("cosine_raw"),
        )
        .filter(F.col("cosine_raw") >= SEM_CONTAM_THRESH)
        .select("vec_id", "bench_id", F.round("cosine_raw", 6).alias("cosine"))
    )


HUB_EVERY = 10  # deterministic query sample: every HUB_EVERY-th vector
HUB_TOP_K = 20
HUB_MAX_QUERIES = 2_000  # audit sample size cap: a FIXED-budget sample
# estimates the k-occurrence distribution just as well — without it the
# query side grows linearly with the corpus and the audit cost goes
# O(N²/HUB_EVERY). Doesn't bind at the sf0.01 gate or sf0.1 bench.


def _q_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit (Radovanović et al. 2010): the k-occurrence
    distribution — how often each vector appears in other vectors'
    exact top-10 — over a deterministic 1-in-HUB_EVERY query sample.
    High-dimensional embedding spaces grow "hubs" (vectors near the
    data mean that show up in everyone's neighbor list); a fat
    k-occurrence tail degrades kNN search and dedup alike, and the
    fix (mean-centering — see q_emb_stats' anisotropy) is cheap. This
    is the measurement that says whether you need it.

    Scale shape: the sampled query side (N/HUB_EVERY rows) broadcasts
    against one corpus scan; per-query ranking is one window exchange
    over (query, candidate) cells and the k-occurrence count is one
    neighbor-keyed partial agg + TakeOrderedAndProject. The full-N
    version at 100 TB runs the same count over the ANN index's
    top-10s instead of brute force — identical downstream agg.

    Output: top-HUB_TOP_K (hub_rank, neighbor_id, n_hits)."""
    v = _prepared(spark, sf_dir)
    sample = v.filter(
        (F.col("vec_id") % HUB_EVERY == 0)
        & (F.col("vec_id") < HUB_EVERY * HUB_MAX_QUERIES)
    )
    hits = knn_brute(v, sample)
    return (
        hits.groupBy("neighbor_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy(F.desc("n_hits"), F.asc("neighbor_id"))
        .limit(HUB_TOP_K)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n_hits"), F.asc("neighbor_id")))
            .alias("hub_rank"),
            "neighbor_id",
            "n_hits",
        )
    )


MMR_K = 5  # diversified picks per query
MMR_LAMBDA = 0.7  # relevance weight (1-λ penalizes redundancy)


def _q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick MMR_K of each query's exact top-10 candidates
    maximizing λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) — the standard
    diversity re-rank between retrieval and a RAG context window
    (near-duplicate passages waste context; MMR spends it on coverage).
    Deterministic: ties break to the lower neighbor_id; the first pick
    scores λ·rel (empty-set max = 0).

    Scale shape: the greedy loop runs over PER-QUERY CANDIDATE SETS
    (top-k from the retrieval stage), never the corpus — each group
    is K rows, so the selection is one applyInPandas over Q bounded
    groups after the (cell-sized) candidate/vector join. The greedy
    recurrence is inherently sequential per query, which is exactly
    the declared grouped-map tier (SURVEY §2.8) — an unrolled
    declarative form was measured to compound the plan tree 3× per
    step (each step re-references the selected set three times) and
    OOMs the planner before any data moves; the kernel's per-group
    cost is K² numpy flops. Candidate generation upstream is the
    seam: swap knn_brute for the LSH/IVF variants unchanged.

    Engine parity: the kernel rounds pairwise cosines to 6 decimals
    (the oracle's round), scores with the same 0.7/0.3 literals, and
    breaks ties to the lower neighbor_id — numpy-vs-fold dot products
    agree to ulps, so divergence needs a cosine within ~1e-12 of a
    rounding boundary (the q_semdedup precedent).

    Output: (query_id, mmr_rank, neighbor_id, mmr_score)."""
    import numpy as np
    import pandas as pd

    v = _prepared(spark, sf_dir)
    # candidates with the RAW cosine (everything stays unrounded until
    # the single output round — re-rounding a 6-dp value lands on
    # decimal .5 boundaries systematically and the engines' round()
    # implementations disagree there)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    n_side = v.select(F.col("vec_id").alias("neighbor_id"), "e", "nrm")
    cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    ce = (
        F.broadcast(q)
        .crossJoin(n_side)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_raw", cos)
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine_raw", "e", "nrm")
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        e_mat = np.array(pdf["e"].tolist(), dtype=np.float64)
        nrm = pdf["nrm"].to_numpy()
        sims = (e_mat @ e_mat.T) / np.outer(nrm, nrm)
        rel = pdf["cosine_raw"].to_numpy()
        ids = pdf["neighbor_id"].to_numpy()
        qid = int(pdf["query_id"].iloc[0])
        n = len(pdf)
        first = int(np.lexsort((ids, -rel))[0])
        picked = [first]
        # raw scores out; the 6-dp rounding happens in Spark's F.round
        # below (HALF_UP like the oracle's round(); Python's round()
        # is half-EVEN and flips the last digit on .5 boundaries)
        out = [(qid, 1, int(ids[first]), MMR_LAMBDA * float(rel[first]))]
        for k in range(2, min(MMR_K, n) + 1):
            best, best_key = None, None
            for j in range(n):
                if j in picked:
                    continue
                ms = float(sims[j, picked].max())
                score = MMR_LAMBDA * float(rel[j]) - (1.0 - MMR_LAMBDA) * ms
                key = (-score, int(ids[j]))
                if best_key is None or key < best_key:
                    best, best_key = j, key
            picked.append(best)
            out.append((qid, k, int(ids[best]), -best_key[0]))
        return pd.DataFrame(
            out, columns=["query_id", "mmr_rank", "neighbor_id", "mmr_score"]
        )

    return ce.groupBy("query_id").applyInPandas(
        greedy, "query_id long, mmr_rank int, neighbor_id long, mmr_score double"
    ).select(
        "query_id", "mmr_rank", "neighbor_id", F.round("mmr_score", 6).alias("mmr_score")
    )


def _mmr_oracle() -> str:
    lam, om = repr(MMR_LAMBDA), repr(1.0 - MMR_LAMBDA)
    steps = []
    for k in range(2, MMR_K + 1):
        prev = f"s{k - 1}"
        steps.append(
            f"""m{k} AS (
  SELECT r.query_id, r.neighbor_id, r.cosine_raw, max(si.s) AS ms
  FROM c r
  JOIN sims si ON si.query_id = r.query_id AND si.a = r.neighbor_id
  JOIN {prev} sp ON sp.query_id = si.query_id AND sp.neighbor_id = si.b
  WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                    WHERE x.query_id = r.query_id AND x.neighbor_id = r.neighbor_id)
  GROUP BY r.query_id, r.neighbor_id, r.cosine_raw
),
p{k} AS (
  SELECT query_id, neighbor_id,
         round({lam} * cosine_raw - {om} * ms, 6) AS mmr_score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {lam} * cosine_raw - {om} * ms DESC,
                                     neighbor_id ASC) AS rn
  FROM m{k}
),
s{k} AS (
  SELECT * FROM {prev}
  UNION ALL
  SELECT query_id, CAST({k} AS INTEGER) AS mmr_rank, neighbor_id, mmr_score
  FROM p{k} WHERE rn = 1
)"""
        )
    body = ",\n".join(steps)
    return (
        _V_CTE
        + f"""
, scored0 AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         {_DOT} / (q.nrm * n.nrm) AS cosine_raw
  FROM v q JOIN v n ON q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id
), c AS (
  SELECT query_id, neighbor_id, rk, cosine_raw FROM (
    SELECT query_id, neighbor_id, cosine_raw,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_raw DESC, neighbor_id ASC) AS INTEGER) AS rk
    FROM scored0)
  WHERE rk <= {TOP_K}
), sims AS (
  SELECT ca.query_id, ca.neighbor_id AS a, cb.neighbor_id AS b,
         list_reduce(list_transform(range(1, 1 + len(va.e)),
                                    i -> va.e[i] * vb.e[i]),
                     (x, y) -> x + y) / (va.nrm * vb.nrm) AS s
  FROM c ca
  JOIN c cb ON ca.query_id = cb.query_id AND ca.neighbor_id <> cb.neighbor_id
  JOIN v va ON va.vec_id = ca.neighbor_id
  JOIN v vb ON vb.vec_id = cb.neighbor_id
), s1 AS (
  SELECT query_id, CAST(1 AS INTEGER) AS mmr_rank, neighbor_id,
         round({lam} * cosine_raw, 6) AS mmr_score
  FROM c WHERE rk = 1
),
{body}
SELECT query_id, mmr_rank, neighbor_id, mmr_score FROM s{MMR_K}
"""
    )


MV_SUBVECS = 4  # consecutive vec_ids folded into one multi-vector doc
MV_QUERY_DOCS = 4  # doc < 4 are the late-interaction probe docs
MV_TOP_K = 10


def _q_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction retrieval (Khattab & Zaharia 2020,
    ColBERT): each document is a BAG of subvectors (here MV_SUBVECS
    consecutive vec_ids folded into one doc — the synthetic stand-in
    for per-token/per-chunk embeddings) and the query-document score is
    MaxSim — for every query subvector, the best cosine against any
    document subvector, summed over the query's subvectors. The shape
    single-vector ANN cannot express: a doc matching two DIFFERENT
    query aspects with two different chunks outranks one chunk matching
    both weakly.

    Scale shape: the probe side (MV_QUERY_DOCS × MV_SUBVECS unit
    vectors) is a bounded driver-side constant embedded in one Arrow
    mapInPandas matmul kernel — the same vectorized-kernel pattern as
    the LSH index build (_lsh_sigs_long): the corpus is scanned once,
    each Arrow batch computes ALL query-subvec cosines as one
    E/‖E‖ · Qᵀ product (the interpreted per-pair aggregate/zip_with
    fold was the CPU bottleneck: ~2× slower at sf0.1), then map-side
    partial max collapses into ONE (doc) cell exchange and a stack()
    fans the per-query scores out of the cell columns. Cosines are
    emitted RAW and rounded to 6 engine-side before the max, and the
    per-query sum uses a fixed operand order, so both engines produce
    identical scores (the only cross-engine delta is the matmul's
    1-ulp summation-order noise, invisible at 1e-6 — the same
    contract the block-matrix embedding dedup relies on)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    v = _prepared(spark, sf_dir)
    sub = v.select(
        F.expr(f"vec_id DIV {MV_SUBVECS}").alias("doc"),
        (F.col("vec_id") % MV_SUBVECS).alias("sub"),
        "e",
        "nrm",
    )
    # bounded probe collect: MV_QUERY_DOCS×MV_SUBVECS rows off the
    # persisted corpus relation (the FPS-pacing exemption class — a
    # constant-size side input, never O(corpus))
    qrows = sorted(
        sub.filter(F.col("doc") < MV_QUERY_DOCS).collect(),
        key=lambda r: (r["doc"], r["sub"]),
    )
    qt = np.array([np.array(r["e"]) / r["nrm"] for r in qrows], dtype=np.float64).T
    qidx = [(int(r["doc"]), int(r["sub"])) for r in qrows]
    ncols = len(qidx)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            e_mat = np.array(pdf["e"].tolist(), dtype=np.float64)
            cos = (e_mat / pdf["nrm"].to_numpy()[:, None]) @ qt
            out = {"doc": pdf["doc"].to_numpy()}
            for j in range(ncols):
                out[f"c{j}"] = cos[:, j]
            yield pd.DataFrame(out)

    schema = "doc long, " + ", ".join(f"c{j} double" for j in range(ncols))
    scored = sub.select("doc", "e", "nrm").mapInPandas(gen, schema)
    cells = scored.groupBy("doc").agg(
        *[F.max(F.round(F.col(f"c{j}"), 6)).alias(f"m{j}") for j in range(ncols)]
    )
    per_q = ", ".join(
        f"CAST({qd} AS BIGINT), round("
        + " + ".join(f"m{j}" for j, (d, _) in enumerate(qidx) if d == qd)
        + ", 6)"
        for qd in sorted({d for d, _ in qidx})
    )
    nq = len({d for d, _ in qidx})
    long = cells.selectExpr(
        "doc", f"stack({nq}, {per_q}) AS (query_doc, maxsim)"
    ).filter(F.col("query_doc") != F.col("doc"))
    w = Window.partitionBy("query_doc").orderBy(F.desc("maxsim"), F.asc("doc"))
    return (
        long.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MV_TOP_K)
        .select("query_doc", "doc", "rk", "maxsim")
    )


def _maxsim_oracle() -> str:
    dotqd = (
        "list_reduce(list_transform(range(1, 1 + len(q.e)), "
        "i -> q.e[i] * d.e[i]), (a, x) -> a + x)"
    )
    maxes = ", ".join(
        f"max(CASE WHEN qs = {i} THEN cos END) AS m{i}" for i in range(MV_SUBVECS)
    )
    return (
        _V_CTE
        + f"""
, s AS (SELECT vec_id // {MV_SUBVECS} AS doc, vec_id % {MV_SUBVECS} AS sub, e, nrm FROM v),
p AS (
  SELECT q.doc AS query_doc, q.sub AS qs, d.doc AS doc,
         round({dotqd} / (q.nrm * d.nrm), 6) AS cos
  FROM s q JOIN s d ON q.doc < {MV_QUERY_DOCS} AND q.doc <> d.doc
),
cells AS (SELECT query_doc, doc, {maxes} FROM p GROUP BY query_doc, doc),
scored AS (SELECT query_doc, doc, round(m0 + m1 + m2 + m3, 6) AS maxsim FROM cells)
SELECT query_doc, doc, rk, maxsim FROM (
  SELECT query_doc, doc, maxsim,
         CAST(row_number() OVER (PARTITION BY query_doc
                                 ORDER BY maxsim DESC, doc ASC) AS INTEGER) AS rk
  FROM scored)
WHERE rk <= {MV_TOP_K}
"""
    )


HN_TOP_K = 10


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the in-batch-
    negatives upgrade every embedding-model recipe needs — DPR,
    Karpukhin et al. 2020 §4.2): for each probe, the top-k most-
    similar vectors with a DIFFERENT label — maximally confusable
    wrong answers. High-cosine wrong-label neighbors are exactly the
    gradient-rich pairs; random negatives are trivially separable.

    Scale shape: identical to q_knn_brute (broadcast probe side,
    two-phase top-k via the map-side Partial WindowGroupLimit) plus
    the label-mismatch predicate pushed before ranking — the
    candidate relation only shrinks. The ANN variants
    (LSH/IVF/PQ) drop in as the candidate generator at corpus scale
    the same way they do for q_knn_brute; the exact form is the
    recall yardstick."""
    v = _prepared(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    n = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        "e",
        "nrm",
    )
    cos = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .crossJoin(n)
        .filter(F.col("qlabel") != F.col("neighbor_label"))
        .withColumn("cosine_raw", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HN_TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            "rk",
            F.round("cosine_raw", 6).alias("cosine"),
        )
    )




#: Artetxe & Schwenk 2019 margin-based bitext mining knobs: candidate
#: depth / kNN-average depth (one k, the paper's `ratio` setting) and
#: the mined-pair margin cut. Sides are the label's parity — the
#: corpus's stand-in for the two languages of a parallel-corpus mine.
MARGIN_K = 4
MARGIN_T = 1.15
BITEXT_BLOCK = 1024


def _bitext_cell_topk(xs: DataFrame, ys: DataFrame, k: int, block: int) -> DataFrame:
    """Per-grid-cell top-k cosine rows for BOTH sides: the full X×Y
    rectangle decomposed into bounded (≤ block)² cells, each cell ONE
    numpy matmul that emits only each x's k best ys and each y's k
    best xs within the cell — O((|X|+|Y|)·k·cells) rows out, never the
    O(|X|·|Y|) score matrix. Global top-k per side is a rank over the
    unioned cell winners (a superset of the true top-k by
    decomposition). Ordering everywhere is (raw cos DESC, id ASC) —
    the q_hard_negatives raw-ordering parity precedent.

    Grid layout is the semdedup BLOCK-PAIR fan-out (FLAT rows tagged
    with side + cell coordinates, grouped by (ablk, bblk) into
    applyInPandas), NOT nested collect_list cells: the r11 first cut
    shipped each cell as two arrays-of-structs and paid a ~1024-item
    Python unpack loop per cell side (~200k struct→ndarray conversions
    at sf1 — 15-19 s); the flat shape vectorizes the same unpack as
    ONE np.vstack over the group's Arrow columns (measured ~3× faster
    end-to-end). Each side's rows replicate once per opposite-side
    block — the same O(B) fan-out every block-matrix operator here
    pays."""
    xb = xs.select(
        "vec_id", "embedding", F.floor(F.col("vec_id") / block).alias("ablk")
    )
    yb = ys.select(
        "vec_id", "embedding", F.floor(F.col("vec_id") / block).alias("bblk")
    )
    nxa = xb.select(F.col("ablk").alias("blk")).distinct()
    nyb = yb.select(F.col("bblk").alias("blk")).distinct()
    a_fan = xb.join(
        F.broadcast(nyb.select(F.col("blk").alias("bblk"))), F.lit(True)
    ).select("vec_id", "embedding", "ablk", "bblk", F.lit(0).alias("side"))
    b_fan = yb.join(
        F.broadcast(nxa.select(F.col("blk").alias("ablk"))), F.lit(True)
    ).select("vec_id", "embedding", "ablk", "bblk", F.lit(1).alias("side"))
    grid = a_fan.unionByName(b_fan)

    def kernel(pdf):
        import numpy as np  # self-contained: workers import nothing of ours
        import pandas as pd

        def unpack(rows):
            ids = rows["vec_id"].to_numpy()
            o = np.argsort(ids)  # id-ascending ⇒ stable sorts tie to smaller id
            mat = np.vstack(rows["embedding"].to_numpy()[o]).astype(np.float64)
            return ids[o], mat / np.linalg.norm(mat, axis=1, keepdims=True)

        a_rows = pdf[pdf["side"] == 0]
        b_rows = pdf[pdf["side"] == 1]
        if not len(a_rows) or not len(b_rows):
            return pd.DataFrame(
                {"x_id": [], "y_id": [], "cos": [], "kx": [], "ky": []}
            ).astype(
                {"x_id": "int64", "y_id": "int64", "cos": "float64",
                 "kx": "bool", "ky": "bool"}
            )
        xid, A = unpack(a_rows)
        yid, B = unpack(b_rows)
        sims = A @ B.T
        kk = min(k, sims.shape[1])
        kxi = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        kx = {(i, int(j)) for i in range(sims.shape[0]) for j in kxi[i]}
        kk = min(k, sims.shape[0])
        kyi = np.argsort(-sims, axis=0, kind="stable")[:kk, :]
        ky = {(int(i), j) for j in range(sims.shape[1]) for i in kyi[:, j]}
        both = sorted(kx | ky)
        return pd.DataFrame(
            {
                "x_id": [int(xid[i]) for i, _ in both],
                "y_id": [int(yid[j]) for _, j in both],
                "cos": [float(sims[i, j]) for i, j in both],
                "kx": [p in kx for p in both],
                "ky": [p in ky for p in both],
            }
        )

    return grid.groupBy("ablk", "bblk").applyInPandas(
        kernel, "x_id long, y_id long, cos double, kx boolean, ky boolean"
    )


def _q_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    Parallel Corpus Mining in Multilingual Sentence Embeddings"): the
    standard way to mine parallel/aligned pairs from two unaligned
    corpora — raw cosine over-fires on hubs (vectors close to
    everything), so each candidate pair is scored by its RATIO margin
    cos(x,y) / ((avgNN_k(x) + avgNN_k(y)) / 2) and a pair is mined only
    when its margin clears the cut, i.e. the pair is closer than each
    side's typical neighborhood. Sides here are the embedding label's
    parity (the synthetic stand-in for source/target language).

    Output per x: its best candidate y by margin (ties to smallest
    y_id), the cosine, the margin, and the mined verdict.

    Scale shape: the score stage is the rectangular block-matrix grid
    — bounded (≤ BITEXT_BLOCK)² matmul cells that emit only per-side
    cell top-k rows, so shuffle volume is O((|X|+|Y|)·k·cells), never
    the pair matrix; global top-k per side is a rank over cell winners
    (rank-filtered ⇒ map-side Partial WindowGroupLimit); kNN averages
    fold over the EXPLICITLY ORDERED top-k list (sort_array then a
    strict left fold — the cross-engine float-sum policy); margins and
    the final per-x argmax run on O(|X|·k) rows. At 100 TB the grid is
    replaced by the IVF/LSH shortlist exactly as for q_knn_brute — the
    margin/argmax stages are unchanged. All ordering uses RAW cosines
    (the q_hard_negatives parity precedent); cos/margin round to 6 dp
    only at publish.

    Reference connection: none in dhoard/orders-kafka-streams; SURVEY
    §2.9 extension surface (similarity / curation family)."""
    emb = parallelize(load_table(spark, sf_dir, "embeddings"))
    xs = emb.filter(F.col("label") % 2 == 0)
    ys = emb.filter(F.col("label") % 2 == 1)
    sc = _bitext_cell_topk(xs, ys, MARGIN_K, BITEXT_BLOCK)

    def side_avg(rows: DataFrame, key: str, other: str, out: str) -> DataFrame:
        w = Window.partitionBy(key).orderBy(F.desc("cos"), F.asc(other))
        topk = rows.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= MARGIN_K
        )
        arr = F.array_sort(
            F.collect_list(F.struct(F.negate(F.col("cos")).alias("nc"),
                                    F.col(other).alias("o"),
                                    F.col("cos").alias("c")))
        )
        fold = F.aggregate(arr, F.lit(0.0), lambda a, e: a + e["c"])
        return topk.groupBy(key).agg(
            (fold / F.count(F.lit(1))).alias(out)
        )

    xk = sc.filter("kx")
    ax = side_avg(xk, "x_id", "y_id", "ax")
    ay = side_avg(sc.filter("ky"), "y_id", "x_id", "ay")
    wx = Window.partitionBy("x_id").orderBy(F.desc("cos"), F.asc("y_id"))
    cand = xk.withColumn("rk", F.row_number().over(wx)).filter(
        F.col("rk") <= MARGIN_K
    )
    m = (
        cand.join(ax, "x_id")
        .join(ay, "y_id")
        .withColumn("margin_raw", F.col("cos") / ((F.col("ax") + F.col("ay")) / 2))
    )
    wbest = Window.partitionBy("x_id").orderBy(F.desc("margin_raw"), F.asc("y_id"))
    return (
        m.withColumn("brk", F.row_number().over(wbest))
        .filter(F.col("brk") == 1)
        .select(
            "x_id",
            "y_id",
            F.round("cos", 6).alias("cos"),
            F.round("margin_raw", 6).alias("margin"),
            (F.col("margin_raw") >= MARGIN_T).alias("mined"),
        )
    )



def _bitext_margin_oracle() -> str:
    """Brute-force mirror: every X×Y cosine via the strict fold (bit-
    identical to the kernel matmul — the q_hard_negatives precedent),
    top-k per side by (raw cos DESC, id ASC), kNN averages as ordered-
    list folds, ratio margin, per-x argmax by (margin DESC, y ASC)."""
    dot = "list_reduce(list_transform(range(1, 1 + len(q.e)), i -> q.e[i] * n.e[i]), (a2, x2) -> a2 + x2)"
    return (
        _V_CTE
        + f""",
xs AS (SELECT * FROM v WHERE label % 2 = 0),
ys AS (SELECT * FROM v WHERE label % 2 = 1),
s AS (
  SELECT q.vec_id AS x_id, n.vec_id AS y_id, {dot} / (q.nrm * n.nrm) AS c
  FROM xs q CROSS JOIN ys n
),
xr AS (SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY c DESC, y_id) AS rx FROM s),
yr AS (SELECT *, row_number() OVER (PARTITION BY y_id ORDER BY c DESC, x_id) AS ry FROM s),
ax AS (
  SELECT x_id, list_reduce(list(c ORDER BY rx), (a2, x2) -> a2 + x2) / count(*) AS ax
  FROM xr WHERE rx <= {MARGIN_K} GROUP BY x_id
),
ay AS (
  SELECT y_id, list_reduce(list(c ORDER BY ry), (a2, x2) -> a2 + x2) / count(*) AS ay
  FROM yr WHERE ry <= {MARGIN_K} GROUP BY y_id
),
m AS (
  SELECT xr.x_id, xr.y_id, xr.c, xr.c / ((ax.ax + ay.ay) / 2) AS margin_raw
  FROM xr JOIN ax USING (x_id) JOIN ay USING (y_id)
  WHERE xr.rx <= {MARGIN_K}
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY margin_raw DESC, y_id) AS brk
  FROM m
)
SELECT x_id, y_id, round(c, 6) AS cos, round(margin_raw, 6) AS margin,
       margin_raw >= {MARGIN_T} AS mined
FROM best WHERE brk = 1
"""
    )


QUERIES = {
    "q_bitext_margin": _q_bitext_margin,
    "q_maxsim": _q_maxsim,
    "q_hard_negatives": _q_hard_negatives,
    "q_semantic_contamination": _q_semantic_contamination,
    "q_hubness": _q_hubness,
    "q_mmr_rerank": _q_mmr_rerank,
    "q_emb_quantize": _q_emb_quantize,
    "q_knn_brute": _q_knn_brute,
    "q_knn_binary": _q_knn_binary,
    "q_matryoshka": _q_matryoshka,
    "q_knn_lsh": _q_knn_lsh,
    "q_knn_ivf": _q_knn_ivf,
    "q_knn_pq": _q_knn_pq,
    "q_knn_ivfpq": _q_knn_ivfpq,
    "q_ann_quality": _q_ann_quality,
    "q_ann_ndcg": _q_ann_ndcg,
    "q_emb_principal": _q_emb_principal,
    "q_emb_stats": _q_emb_stats,
    "q_emb_center": _q_emb_center,
    "q_ivf_balance": _q_ivf_balance,
    "q_emb_centroid": _q_emb_centroid,
    "q_hybrid_search": _q_hybrid_search,
    "q_hybrid_search_ann": _q_hybrid_search_ann,
}

def _matryoshka_oracle() -> str:
    """Per-truncation CTE blocks mirroring the Spark loop; truth is the
    full-dim exact ranking (the q_knn_brute contract: identical
    left-to-right fold → identical doubles → identical order)."""
    blocks, unions_r, unions_e = [], [], []
    for d in MATRYOSHKA_DIMS:
        blocks.append(
            f"""t{d} AS (
  SELECT vec_id, e[1:{d}] AS te,
         sqrt(list_reduce(list_transform(e[1:{d}], x -> x * x), (a, x) -> a + x)) AS tn
  FROM v
),
s{d} AS (
  SELECT {d} AS trunc_dim, q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, 1 + len(q.te)), i -> q.te[i] * n.te[i]),
                     (a, x) -> a + x) / (q.tn * n.tn) AS c
  FROM t{d} q JOIN t{d} n ON q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id
),
r{d} AS (
  SELECT trunc_dim, query_id, neighbor_id
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY c DESC, neighbor_id) AS rk FROM s{d})
  WHERE rk <= {TOP_K}
)"""
        )
        unions_r.append(f"SELECT * FROM r{d}")
        unions_e.append(
            f"SELECT {d} AS trunc_dim,"
            f" round(list_reduce(list_transform(e[1:{d}], x -> x * x), (a, x) -> a + x)"
            f" / list_reduce(list_transform(e, x -> x * x), (a, x) -> a + x), 6) AS energy"
            f" FROM v"
        )
    dims_list = ", ".join(str(d) for d in MATRYOSHKA_DIMS)
    return (
        _V_CTE
        + ",\n"
        + ",\n".join(blocks)
        + f""",
tscore AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_DOT} / (q.nrm * n.nrm) AS c
  FROM v q JOIN v n ON q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id
),
truth AS (
  SELECT query_id, neighbor_id
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY c DESC, neighbor_id) AS rk FROM tscore)
  WHERE rk <= {TOP_K}
),
allr AS ({" UNION ALL ".join(unions_r)}),
hits AS (
  SELECT a.trunc_dim, a.query_id, count(1) AS n_rel
  FROM allr a JOIN truth t ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
  GROUP BY 1, 2
),
probes AS (SELECT DISTINCT query_id FROM truth),
dims AS (SELECT unnest([{dims_list}]) AS trunc_dim),
grid AS (SELECT d.trunc_dim, p.query_id FROM probes p CROSS JOIN dims d),
rec AS (
  SELECT g.trunc_dim, CAST(count(1) AS BIGINT) AS n_queries,
         round(avg(coalesce(h.n_rel, 0) / {float(TOP_K)}), 4) AS mean_recall
  FROM grid g LEFT JOIN hits h ON g.trunc_dim = h.trunc_dim AND g.query_id = h.query_id
  GROUP BY g.trunc_dim
),
en AS (
  SELECT trunc_dim, round(avg(energy), 4) AS mean_energy
  FROM ({" UNION ALL ".join(unions_e)}) GROUP BY trunc_dim
)
SELECT CAST(r.trunc_dim AS INTEGER) AS trunc_dim, r.n_queries, r.mean_recall, e.mean_energy
FROM rec r JOIN en e USING (trunc_dim) ORDER BY trunc_dim
"""
    )


_V_CTE = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                          (a, x) -> a + x)) AS nrm
  FROM embeddings
)
"""

_DOT = (
    "list_reduce(list_transform(range(1, 1 + len(q.e)), i -> q.e[i] * n.e[i]), (a, x) -> a + x)"
)


def _binary_sig_sql(base: int) -> str:
    """One 32-bit sign-mask lane as an unrolled CASE sum — the DuckDB
    twin of ``_binary_sig_cols`` (1-based list access; e[i] for i past
    the dim count is NULL on both engines and contributes 0)."""
    return " + ".join(
        f"CASE WHEN e[{base + i + 1}] > 0 THEN {1 << i} ELSE 0 END" for i in range(32)
    )


def _hybrid_oracle() -> str:
    from .dedup import _SHINGLED_CTE

    return (
        _V_CTE.rstrip()
        + ",\n"
        + _SHINGLED_CTE.replace("WITH ", "", 1).strip()
        + f""",
vr AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         CAST(row_number() OVER (PARTITION BY q.vec_id
              ORDER BY {_DOT} / (q.nrm * n.nrm) DESC, n.vec_id ASC) AS INTEGER) AS vec_rank
  FROM v q JOIN v n ON q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id
),
lr AS (
  SELECT p.doc_id AS query_id, d.doc_id AS neighbor_id,
         CAST(row_number() OVER (PARTITION BY p.doc_id
              ORDER BY len(list_intersect(p.s, d.s)) DESC, d.doc_id ASC) AS INTEGER) AS lex_rank
  FROM sh p JOIN sh d ON p.doc_id < {N_QUERIES} AND p.doc_id <> d.doc_id
),
fused AS (
  SELECT l.query_id, l.neighbor_id, l.lex_rank, v2.vec_rank,
         1.0 / ({RRF_K} + l.lex_rank) + 1.0 / ({RRF_K} + v2.vec_rank) AS rrf
  FROM lr l JOIN vr v2
    ON l.query_id = v2.query_id AND l.neighbor_id = v2.neighbor_id
),
final AS (
  SELECT query_id, neighbor_id, lex_rank, vec_rank, rrf,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM fused
)
SELECT query_id, neighbor_id, rank, lex_rank, vec_rank, round(rrf, 6) AS rrf_score
FROM final WHERE rank <= {TOP_K}
"""
    )


def _hybrid_ann_oracle() -> str:
    from .dedup import _SHINGLED_CTE

    return (
        _V_CTE.rstrip()
        + ",\n"
        + _SHINGLED_CTE.replace("WITH ", "", 1).strip()
        + f""",
sigs AS (
{_lsh_sigs_cte()}
),
vcand AS (
  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
  FROM sigs q JOIN sigs n ON q.tbl = n.tbl AND q.sig = n.sig
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id
),
vr AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(row_number() OVER (PARTITION BY c.query_id
              ORDER BY {_DOT} / (q.nrm * n.nrm) DESC, n.vec_id ASC) AS INTEGER) AS vec_rank
  FROM vcand c
  JOIN v q ON q.vec_id = c.query_id
  JOIN v n ON n.vec_id = c.neighbor_id
),
post AS (SELECT doc_id, unnest(list_distinct(s)) AS sgl FROM sh),
keep AS (SELECT sgl FROM post GROUP BY sgl HAVING count(1) <= {HYBRID_DF_CUTOFF}),
postk AS (SELECT doc_id, sgl FROM post JOIN keep USING (sgl)),
ov AS (
  SELECT p.doc_id AS query_id, d.doc_id AS neighbor_id,
         CAST(count(1) AS BIGINT) AS overlap
  FROM postk p JOIN postk d ON p.sgl = d.sgl
  WHERE p.doc_id < {N_QUERIES} AND p.doc_id <> d.doc_id
  GROUP BY p.doc_id, d.doc_id
),
lr AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY overlap DESC, neighbor_id ASC) AS INTEGER) AS lex_rank
  FROM ov
),
fused AS (
  SELECT COALESCE(l.query_id, v2.query_id) AS query_id,
         COALESCE(l.neighbor_id, v2.neighbor_id) AS neighbor_id,
         l.lex_rank, v2.vec_rank,
         COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0.0)
           + COALESCE(1.0 / ({RRF_K} + v2.vec_rank), 0.0) AS rrf
  FROM lr l FULL OUTER JOIN vr v2
    ON l.query_id = v2.query_id AND l.neighbor_id = v2.neighbor_id
),
final AS (
  SELECT query_id, neighbor_id, lex_rank, vec_rank, rrf,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM fused
)
SELECT query_id, neighbor_id, rank, lex_rank, vec_rank, round(rrf, 6) AS rrf_score
FROM final WHERE rank <= {TOP_K}
"""
    )


_HARD_NEG_SQL = (
    _V_CTE
    + f"""
, scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.label AS neighbor_label,
         {_DOT} / (q.nrm * n.nrm) AS cosine_raw
  FROM v q JOIN v n ON q.vec_id < {N_QUERIES} AND q.label <> n.label
)
SELECT query_id, neighbor_id, neighbor_label, rk, round(cosine_raw, 6) AS cosine
FROM (
  SELECT query_id, neighbor_id, neighbor_label, cosine_raw,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_raw DESC, neighbor_id ASC) AS INTEGER) AS rk
  FROM scored)
WHERE rk <= {HN_TOP_K}
"""
)

ORACLE = {
    "q_maxsim": _maxsim_oracle(),
    "q_hard_negatives": _HARD_NEG_SQL,
    "q_mmr_rerank": _mmr_oracle(),
    "q_semantic_contamination": _V_CTE
    + f"""
, b AS (SELECT vec_id AS bench_id, e AS be, nrm AS bn FROM v
        WHERE label = 0 AND vec_id < {SEM_BENCH_CAP}),
c AS (SELECT vec_id, e, nrm FROM v WHERE label <> 0),
scored AS (
  SELECT c.vec_id, b.bench_id,
         list_reduce(list_transform(range(1, 1 + len(b.be)), i -> b.be[i] * c.e[i]),
                     (a, x) -> a + x) / (b.bn * c.nrm) AS cosine_raw
  FROM c CROSS JOIN b
), ranked AS (
  SELECT vec_id, bench_id, cosine_raw,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine_raw DESC, bench_id ASC) AS rk
  FROM scored
)
SELECT vec_id, bench_id, round(cosine_raw, 6) AS cosine
FROM ranked WHERE rk = 1 AND cosine_raw >= {SEM_CONTAM_THRESH}
""",
    "q_hubness": _V_CTE
    + f"""
, q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM v
        WHERE vec_id % {HUB_EVERY} = 0
          AND vec_id < {HUB_EVERY * HUB_MAX_QUERIES}),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, 1 + len(q.qe)), i -> q.qe[i] * n.e[i]),
                     (a, x) -> a + x) / (q.qn * n.nrm) AS cosine_raw
  FROM q JOIN v n ON q.query_id <> n.vec_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_raw DESC, neighbor_id ASC) AS rk
  FROM scored
), hits AS (
  SELECT neighbor_id, CAST(count(1) AS BIGINT) AS n_hits
  FROM ranked WHERE rk <= {TOP_K} GROUP BY neighbor_id
), top AS (
  SELECT neighbor_id, n_hits,
         CAST(row_number() OVER (ORDER BY n_hits DESC, neighbor_id ASC) AS INTEGER)
           AS hub_rank
  FROM hits
)
SELECT hub_rank, neighbor_id, n_hits FROM top WHERE hub_rank <= {HUB_TOP_K}
""",
    "q_emb_center": _V_CTE.rstrip()
    + """,
comp AS (SELECT generate_subscripts(e, 1) AS pos, unnest(e) AS x FROM v),
mean AS (SELECT pos, round(avg(x), 9) AS m FROM comp GROUP BY pos),
mvr AS (SELECT list(m ORDER BY pos) AS mv FROM mean)
SELECT v.vec_id AS vec_id, v.label AS label,
       round(v.nrm, 6) AS pre_norm,
       round(sqrt(list_reduce(
           list_transform(range(1, 1 + len(v.e)),
                          i -> (v.e[i] - mvr.mv[i]) * (v.e[i] - mvr.mv[i])),
           (a, x) -> a + x)), 6) AS post_norm,
       round(list_reduce(
           list_transform(range(1, 1 + len(v.e)), i -> v.e[i] * mvr.mv[i]),
           (a, x) -> a + x)
         / (v.nrm * sqrt(list_reduce(list_transform(mvr.mv, x -> x * x),
                                     (a, x) -> a + x))), 6) AS cos_to_mean
FROM v, mvr
""",
    "q_emb_stats": """
WITH comp AS (
  SELECT i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, 65) t(i)
),
per_dim AS (
  SELECT pos, avg(x) AS m, avg(x * x) - avg(x) * avg(x) AS v
  FROM comp GROUP BY pos
),
nv AS (SELECT CAST(count(1) AS BIGINT) AS n_vecs FROM embeddings)
SELECT n_vecs,
       CAST(count(1) AS BIGINT) AS n_dims,
       round(sqrt(sum(m * m)), 4) AS mean_norm,
       round(avg(v), 4) AS avg_var,
       round(max(v) / min(v), 2) AS anisotropy
FROM per_dim CROSS JOIN nv
GROUP BY n_vecs
""",
    "q_hybrid_search": _hybrid_oracle(),
    "q_hybrid_search_ann": _hybrid_ann_oracle(),
    "q_emb_quantize": """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
sc AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
  FROM v
),
q AS (
  SELECT vec_id, e, scale,
         list_transform(e, x -> CAST(floor(x / scale + 0.5) AS INTEGER)) AS codes
  FROM sc
)
SELECT vec_id,
       CAST(len(e) AS INTEGER) AS n_dims,
       round(scale, 8) AS scale,
       list_max(codes) AS max_code,
       list_min(codes) AS min_code
FROM q
""",
    "q_matryoshka": _matryoshka_oracle(),
    "q_knn_brute": _V_CTE
    + f"""
, scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         {_DOT} / (q.nrm * n.nrm) AS cosine_raw
  FROM v q JOIN v n ON q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_raw,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_raw DESC, neighbor_id ASC) AS INTEGER) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, rk, round(cosine_raw, 6) AS cosine
FROM ranked WHERE rk <= {TOP_K}
""",
    # binary quantization: the sign-mask sum is mirrored term-for-term
    # (integer CASE addends — exact on any engine); Hamming shortlist
    # and rerank reproduce the Spark windows' total orders
    "q_knn_binary": _V_CTE
    + f"""
, sigs AS (
  SELECT vec_id,
         {_binary_sig_sql(0)} AS lo,
         {_binary_sig_sql(32)} AS hi
  FROM v
), ham AS (
  SELECT p.vec_id AS query_id, s.vec_id AS neighbor_id,
         bit_count(xor(p.lo, s.lo)) + bit_count(xor(p.hi, s.hi)) AS hamming
  FROM sigs p JOIN sigs s ON p.vec_id < {N_QUERIES} AND p.vec_id <> s.vec_id
), short AS (
  SELECT query_id, neighbor_id, CAST(hamming AS INTEGER) AS hamming
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY hamming ASC, neighbor_id ASC) AS hr
        FROM ham)
  WHERE hr <= {BINARY_SHORTLIST}
), scored AS (
  SELECT query_id, neighbor_id, hamming, {_DOT} / (q.nrm * n.nrm) AS cosine_raw
  FROM short JOIN v q ON q.vec_id = query_id JOIN v n ON n.vec_id = neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, hamming, cosine_raw,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_raw DESC, neighbor_id ASC) AS INTEGER) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, rk, hamming, round(cosine_raw, 6) AS cosine
FROM ranked WHERE rk <= {TOP_K}
""",
    "q_knn_lsh": _V_CTE
    + f"""
, sigs AS (
{_lsh_sigs_cte()}
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
  FROM sigs q JOIN sigs n ON q.tbl = n.tbl AND q.sig = n.sig
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> n.vec_id
), scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_reduce(list_transform(range(1, 1 + len(q.e)), i -> q.e[i] * n.e[i]),
                     (a, x) -> a + x) / (q.nrm * n.nrm) AS cosine_raw
  FROM cand c
  JOIN v q ON q.vec_id = c.query_id
  JOIN v n ON n.vec_id = c.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_raw,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_raw DESC, neighbor_id ASC) AS INTEGER) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, rk, round(cosine_raw, 6) AS cosine
FROM ranked WHERE rk <= {TOP_K}
""",
    "q_ivf_balance": _V_CTE
    + f"""
, c AS (
  SELECT vec_id AS cid, e AS ce, nrm AS cn FROM v
  ORDER BY {hash60_sql('vec_id')}, vec_id LIMIT {K_CENTROIDS}
), assign AS (
  SELECT v.vec_id, c.cid,
         CAST(row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_reduce(list_transform(range(1, 1 + len(v.e)), i -> v.e[i] * c.ce[i]),
                                (a, x) -> a + x) / (v.nrm * c.cn) DESC,
                    c.cid ASC) AS INTEGER) AS crk
  FROM v CROSS JOIN c
), occ AS (
  SELECT cid, CAST(count(1) AS BIGINT) AS list_size FROM assign WHERE crk = 1 GROUP BY cid
), tot AS (
  SELECT CAST(count(1) AS BIGINT) AS n_lists, CAST(sum(list_size) AS BIGINT) AS n_vectors
  FROM occ
)
SELECT cid, list_size,
       round(CAST(list_size AS DOUBLE) / n_vectors, 6) AS share,
       round(CAST(list_size AS DOUBLE) * n_lists / n_vectors, 4) AS rel_to_mean
FROM occ, tot
""",
    "q_knn_ivf": _V_CTE
    + f"""
, c AS (
  SELECT vec_id AS cid, e AS ce, nrm AS cn FROM v
  ORDER BY {hash60_sql('vec_id')}, vec_id LIMIT {K_CENTROIDS}
), assign AS (
  SELECT v.vec_id, c.cid, v.e, v.nrm,
         CAST(row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_reduce(list_transform(range(1, 1 + len(v.e)), i -> v.e[i] * c.ce[i]),
                                (a, x) -> a + x) / (v.nrm * c.cn) DESC,
                    c.cid ASC) AS INTEGER) AS crk
  FROM v CROSS JOIN c
), lists AS (
  SELECT vec_id AS neighbor_id, cid, e, nrm FROM assign WHERE crk = 1
), probes AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qn, cid
  FROM assign WHERE vec_id < {N_QUERIES} AND crk <= {N_PROBE}
), scored AS (
  SELECT p.query_id, l.neighbor_id, p.cid,
         list_reduce(list_transform(range(1, 1 + len(p.qe)), i -> p.qe[i] * l.e[i]),
                     (a, x) -> a + x) / (p.qn * l.nrm) AS cosine_raw
  FROM probes p JOIN lists l ON p.cid = l.cid
  WHERE p.query_id <> l.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cid, cosine_raw,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_raw DESC, neighbor_id ASC) AS INTEGER) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cid, rk, round(cosine_raw, 6) AS cosine
FROM ranked WHERE rk <= 5
""",
    "q_knn_pq": _V_CTE
    + f"""
, h AS (SELECT vec_id, e, nrm, {hash60_sql('vec_id')} AS hkey FROM v),
samp AS (
  SELECT vec_id, e, row_number() OVER (ORDER BY hkey, vec_id) AS code_id
  FROM h ORDER BY hkey, vec_id LIMIT {PQ_K}
),
cb AS (
  SELECT code_id, t.s, e[t.s * {PQ_SUBDIM} + 1 : t.s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS csub
  FROM samp CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS s) t
),
subs AS (
  SELECT vec_id, t.s, e[t.s * {PQ_SUBDIM} + 1 : t.s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sub
  FROM v CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS s) t
),
dists AS (
  SELECT vec_id, s, code_id, csub,
         list_reduce(list_transform(range(1, {PQ_SUBDIM} + 1),
                                    i -> (sub[i] - csub[i]) * (sub[i] - csub[i])),
                     (a, x) -> a + x) AS l2
  FROM subs JOIN cb USING (s)
),
assign AS (
  SELECT vec_id, s, csub,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY l2 ASC, code_id ASC) AS ark
  FROM dists
),
rec AS (
  SELECT vec_id, flatten(list(csub ORDER BY s)) AS rec_e
  FROM assign WHERE ark = 1 GROUP BY vec_id
),
adc AS (
  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, 65), i -> q.e[i] * r.rec_e[i]),
                     (a, x) -> a + x) / (q.nrm * n.nrm) AS adc_raw
  FROM v q CROSS JOIN rec r JOIN v n ON n.vec_id = r.vec_id
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> r.vec_id
),
shortlist AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_raw DESC, neighbor_id ASC) AS srk
  FROM adc
),
rerank AS (
  SELECT s.query_id, s.neighbor_id,
         list_reduce(list_transform(range(1, 65), i -> q.e[i] * n.e[i]),
                     (a, x) -> a + x) / (q.nrm * n.nrm) AS cosine_raw
  FROM shortlist s
  JOIN v q ON q.vec_id = s.query_id
  JOIN v n ON n.vec_id = s.neighbor_id
  WHERE s.srk <= {PQ_RERANK}
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_raw,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_raw DESC, neighbor_id ASC) AS INTEGER) AS rk
  FROM rerank
)
SELECT query_id, neighbor_id, rk, round(cosine_raw, 6) AS cosine
FROM ranked WHERE rk <= {TOP_K}
""",
    "q_knn_ivfpq": _V_CTE
    + f"""
, c AS (
  SELECT vec_id AS cid, e AS ce, nrm AS cn FROM v
  ORDER BY {hash60_sql('vec_id')}, vec_id LIMIT {K_CENTROIDS}
), iassign AS (
  SELECT v.vec_id, c.cid, v.e, v.nrm,
         CAST(row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_reduce(list_transform(range(1, 1 + len(v.e)), i -> v.e[i] * c.ce[i]),
                                (a, x) -> a + x) / (v.nrm * c.cn) DESC,
                    c.cid ASC) AS INTEGER) AS crk
  FROM v CROSS JOIN c
), lists AS (
  SELECT vec_id AS neighbor_id, cid FROM iassign WHERE crk = 1
), probes AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qn, cid
  FROM iassign WHERE vec_id < {N_QUERIES} AND crk <= {N_PROBE}
), h AS (SELECT vec_id, e, nrm, {hash60_sql('vec_id')} AS hkey FROM v),
samp AS (
  SELECT vec_id, e, row_number() OVER (ORDER BY hkey, vec_id) AS code_id
  FROM h ORDER BY hkey, vec_id LIMIT {PQ_K}
),
cb AS (
  SELECT code_id, t.s, e[t.s * {PQ_SUBDIM} + 1 : t.s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS csub
  FROM samp CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS s) t
),
subs AS (
  SELECT vec_id, t.s, e[t.s * {PQ_SUBDIM} + 1 : t.s * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sub
  FROM v CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS s) t
),
dists AS (
  SELECT vec_id, s, code_id, csub,
         list_reduce(list_transform(range(1, {PQ_SUBDIM} + 1),
                                    i -> (sub[i] - csub[i]) * (sub[i] - csub[i])),
                     (a, x) -> a + x) AS l2
  FROM subs JOIN cb USING (s)
),
passign AS (
  SELECT vec_id, s, csub,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY l2 ASC, code_id ASC) AS ark
  FROM dists
),
rec AS (
  SELECT vec_id, flatten(list(csub ORDER BY s)) AS rec_e
  FROM passign WHERE ark = 1 GROUP BY vec_id
),
adc AS (
  SELECT p.query_id, l.neighbor_id, p.qe, p.qn,
         list_reduce(list_transform(range(1, 65), i -> p.qe[i] * r.rec_e[i]),
                     (a, x) -> a + x) / (p.qn * n.nrm) AS adc_raw
  FROM probes p
  JOIN lists l ON p.cid = l.cid AND p.query_id <> l.neighbor_id
  JOIN rec r ON r.vec_id = l.neighbor_id
  JOIN v n ON n.vec_id = l.neighbor_id
),
shortlist AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_raw DESC, neighbor_id ASC) AS srk
  FROM adc
),
rerank AS (
  SELECT s.query_id, s.neighbor_id,
         list_reduce(list_transform(range(1, 65), i -> q.e[i] * n.e[i]),
                     (a, x) -> a + x) / (q.nrm * n.nrm) AS cosine_raw
  FROM shortlist s
  JOIN v q ON q.vec_id = s.query_id
  JOIN v n ON n.vec_id = s.neighbor_id
  WHERE s.srk <= {IVFPQ_RERANK}
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_raw,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_raw DESC, neighbor_id ASC) AS INTEGER) AS rk
  FROM rerank
)
SELECT query_id, neighbor_id, rk, round(cosine_raw, 6) AS cosine
FROM ranked WHERE rk <= {TOP_K}
""",
    "q_emb_centroid": """
WITH comp AS (
  SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(1, 65) t(i)
), per_dim AS (
  SELECT label, pos, avg(x) AS cx FROM comp GROUP BY label, pos
)
SELECT label, CAST(count(1) AS BIGINT) AS dim,
       round(sqrt(sum(cx * cx)), 6) AS centroid_norm,
       round(sum(abs(cx)), 6) AS centroid_l1
FROM per_dim GROUP BY label
""",
}


def _ann_quality_oracle() -> str:
    """Composes the per-method oracle SQL verbatim as derived tables
    (DuckDB supports CTEs inside subqueries), so the audit's oracle can
    never drift from the methods it audits."""
    unions = "\n  UNION ALL\n".join(
        f"  SELECT '{m}' AS method, query_id, neighbor_id, rk FROM (\n{ORACLE[f'q_knn_{m}']}\n) sub_{m}"
        for m in ("lsh", "ivf", "pq", "ivfpq")
    )
    return f"""
WITH truth AS (
  SELECT query_id, neighbor_id FROM (
{ORACLE['q_knn_brute']}
  ) tb
),
m AS (
{unions}
),
rel AS (
  SELECT m.method, m.query_id, m.rk
  FROM m JOIN truth USING (query_id, neighbor_id)
),
probes AS (SELECT DISTINCT query_id FROM truth),
grid AS (
  SELECT g.method, p.query_id
  FROM probes p CROSS JOIN (VALUES ('lsh'), ('ivf'), ('pq'), ('ivfpq')) g(method)
),
hits AS (
  SELECT method, query_id, CAST(count(1) AS BIGINT) AS n_rel, min(rk) AS first_rel
  FROM rel GROUP BY method, query_id
)
SELECT method,
       CAST(count(1) AS BIGINT) AS n_queries,
       round(avg(COALESCE(n_rel, 0) / {float(TOP_K)}), 4) AS mean_recall,
       round(avg(COALESCE(1.0 / first_rel, 0.0)), 4) AS mean_mrr
FROM grid LEFT JOIN hits USING (method, query_id)
GROUP BY method
"""


ORACLE["q_bitext_margin"] = _bitext_margin_oracle()
ORACLE["q_ann_quality"] = _ann_quality_oracle()
ORACLE["q_ann_ndcg"] = _ann_ndcg_oracle()
ORACLE["q_emb_principal"] = _emb_principal_oracle()
