"""Privacy-preserving curation: pseudonymization and k-anonymity.

Training corpora routinely carry direct identifiers (names, account
ids) and quasi-identifiers (demographic combinations). The standard
pipeline treatment before data leaves the trust boundary:

- q_pseudonymize — row-level de-identification of the customer
  dimension: the direct identifier (c_name) is replaced by (a) a
  deterministic keyed token (join-stable pseudonym — downstream joins
  still work, but the raw name never leaves) and (b) a masked display
  form with every digit blanked. Deterministic tokenization is the
  industry default (HMAC-style) because it preserves referential
  integrity across the 100 TB lake without a lookup vault.
- q_k_anonymity — quasi-identifier audit: group sizes over the QI set
  (c_nationkey, c_mktsegment), per-group k, and whether the group
  meets K_ANON (groups below k are re-identification risks and get
  suppressed/generalized by the release step).

Scale notes: pseudonymization is map-only (hash + regexp per row —
whole-stage codegen, no shuffle); the k-anonymity audit is one
QI-keyed aggregation with map-side partials. Both are scan-bounded at
100 TB.

Token derivation uses the portable 60-bit md5 hash (functions/
portable.py) so the DuckDB oracle computes bit-identical tokens; a
production deployment would swap in a keyed MAC via the same seam.

Reference connection: no equivalent in dhoard/orders-kafka-streams;
SURVEY §2.9 extension surface (curation family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import hash60, hash60_sql
from ..sources.tables import load_table

#: minimum acceptable quasi-identifier group size
K_ANON = 10

#: salt namespacing the pseudonym domain (public constant here; a real
#: deployment injects a secret key through this same parameter)
TOKEN_SALT = "okss-pseud-v1"


def pseudonymize(cust: DataFrame, salt: str = TOKEN_SALT) -> DataFrame:
    """Deterministic pseudonym + digit-masked display name per customer."""
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        hash60(F.concat(F.lit(salt), F.lit("|"), F.col("c_name"))).alias("name_token"),
        F.regexp_replace("c_name", "[0-9]", "*").alias("masked_name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


def _q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pseudonymize(load_table(spark, sf_dir, "customer"))


def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(F.count(F.lit(1)).alias("k"))
        .select(
            "nationkey",
            "mktsegment",
            "k",
            (F.col("k") >= K_ANON).alias("meets_k"),
        )
    )


L_DIV = 3  # minimum distinct sensitive values per QI group


def _q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure companion to
    k-anonymity (Machanavajjhala et al. 2007): a QI group can satisfy
    k ≥ K yet still leak if (nearly) every member shares the same
    SENSITIVE value. Per (nationkey, mktsegment) quasi-identifier
    group over customers: distinct account-balance bands (the
    sensitive attribute, banded to make 'same value' meaningful for a
    continuous column) and whether the group meets l ≥ L_DIV.

    Scale shape: one partial-aggregated count-distinct per QI group —
    the same single-exchange audit as q_k_anonymity, cells not rows
    in the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    return (
        cust.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            band.alias("bal_band"),
        )
        .groupBy("nationkey", "mktsegment")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("bal_band").alias("l"),
        )
        .select(
            "nationkey",
            "mktsegment",
            "k",
            "l",
            (F.col("l") >= L_DIV).alias("meets_l"),
        )
    )


DP_EPSILON = 1.0  # per-cell privacy budget for the histogram release
DP_SALT = "okss-dp-v1"  # derivation namespace for the noise stream


def _q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private histogram release (Dwork et al. 2006):
    per (event_type, day) event counts with Laplace(1/ε) noise —
    the standard private-release mechanism for a partition-grid count
    query (sensitivity 1: one user event moves one cell by one).
    Cells are disjoint, so the grid enjoys parallel composition: the
    whole release costs ε, not ε·cells.

    The noise stream here is DERIVED (inverse-CDF of a hash-uniform:
    u = h/2⁶⁰ − ½, noise = −(1/ε)·sign(u)·ln(1−2|u|)) so the release
    is reproducible and the DuckDB oracle can recompute it bit-for-
    bit — the honest testing trade; a production release swaps ONE
    line to a real RNG and keeps every other property. True counts
    never appear in the output, and released counts clamp at 0.

    Scale shape: one partial-aggregated count per grid cell, then
    map-only noise arithmetic on the cell relation — cells (not
    events) in the shuffle; scan-bounded at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    return dp_release(cells)


#: clamp keeping u strictly above −0.5: hash60(cell) == 0 (prob 2⁻⁶⁰,
#: but PERMANENT for that cell string) would otherwise hit ln(0) and
#: the engines disagree catastrophically instead of failing together
DP_U_FLOOR = -0.5 + 1e-15


def dp_release(cells: DataFrame) -> DataFrame:
    """The shared noise-stamp block for the batch release and its
    streaming twin (both pin the same oracle semantics, so the
    derivation lives in ONE place): derived inverse-CDF Laplace(1/ε)
    noise on (event_type, day, c) cells, clamped non-negative.

    The output labels itself honestly: because the noise stream is
    DERIVED from the public cell key + a salt committed in this repo,
    anyone can recompute and subtract it — the release provides zero
    actual differential privacy. The budget column is therefore named
    ``epsilon_nominal`` (the ε a real-RNG swap of the one noise line
    would achieve) and a ``derived_noise=true`` flag travels with
    every row, so the artifact cannot be mistaken for a real DP
    release (round-3 advice, privacy.py:153)."""
    u = F.greatest(
        hash60(
            F.concat(F.lit(DP_SALT), F.lit("|"), F.col("event_type"), F.lit("|"), F.col("day"))
        )
        / F.lit(2.0**60)
        - F.lit(0.5),
        F.lit(DP_U_FLOOR),
    )
    noise = (
        -F.lit(1.0 / DP_EPSILON)
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    released = F.greatest(F.lit(0).cast("long"), F.col("c") + F.round(noise).cast("long"))
    return cells.select(
        "event_type",
        "day",
        released.alias("released_count"),
        F.lit(DP_EPSILON).alias("epsilon_nominal"),
        F.lit(True).alias("derived_noise"),
    )


#: PII pattern library — written in the Java-regex ∩ RE2 common
#: subset (character classes, \b, \d, bounded quantifiers) so Spark
#: and the DuckDB oracle compile the same automaton. Order is the
#: redaction order (applied identically in both engines).
PII_PATTERNS = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("govid", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_augmented_text() -> F.Column:
    """The synthetic corpus carries no real PII, so the scan would be
    a vacuous zero. Instead a deterministic PII *fixture stream* is
    derived from doc_id residues (≈14% of docs get an email, ≈9% a
    phone, ≈6% a gov-id, ≈8% an IPv4; residue classes overlap so some
    docs carry several kinds) and appended to the text. The SAME
    derivation is written into the DuckDB oracle, so what the gate
    actually verifies is the detection/redaction machinery itself:
    that both engines' regex automata count and excise identically.
    Swapping this column for the raw text column is the production
    deployment."""
    d = F.col("doc_id")
    s = d.cast("string")
    email = F.when(
        d % 7 == 0,
        F.concat(F.lit(" contact user"), s, F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 11 == 3,
        F.concat(
            F.lit(" call 555-"),
            (d % 900 + 100).cast("string"),
            F.lit("-"),
            (d % 9000 + 1000).cast("string"),
        ),
    ).otherwise(F.lit(""))
    govid = F.when(
        d % 17 == 2,
        F.concat(
            F.lit(" id "),
            (d % 900 + 100).cast("string"),
            F.lit("-"),
            (d % 90 + 10).cast("string"),
            F.lit("-"),
            (d % 9000 + 1000).cast("string"),
        ),
    ).otherwise(F.lit(""))
    ipv4 = F.when(
        d % 13 == 5,
        F.concat(
            F.lit(" host 10."),
            (d % 256).cast("string"),
            F.lit("."),
            (d % 250).cast("string"),
            F.lit("."),
            (d % 200).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, govid, ipv4)


def redaction_cols(text_col: str = "text"):
    """(redacted, n_matches) over ``text_col`` — THE redaction chain
    (fixed pattern order) and its match count (counted on the
    pre-redaction text, the scan's basis). Single definition shared by
    the scan audit, the apply artifact, the streaming gate, and the
    curation capstone (r9 review finding: the chain had been
    copy-pasted).

    n_matches is a SCAN count, not a replacements-performed count
    (ADVICE r9): because every pattern is counted on the ORIGINAL
    text, a match consumed by an earlier pattern's replacement (e.g.
    an ipv4-looking token inside an email already rewritten to
    <EMAIL>) is still counted even though it never appears redacted in
    the output. The generator's PII fields are token-disjoint so the
    two bases coincide on this corpus, and the DuckDB oracle uses the
    same pre-redaction basis — engine parity holds either way. A
    replacements-performed count would re-count pattern i on the text
    after patterns <i applied (one extra regexp pass per pattern in
    both engines); the scan basis is kept because the audit's consumer
    is the detector (q_pii_scan), whose denominator is raw text."""
    red = F.col(text_col)
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    n = sum(
        (F.regexp_count(text_col, F.lit(pat)) for _, pat, _ in PII_PATTERNS),
        F.lit(0),
    )
    return red, n


def pii_doc_scan(docs: DataFrame) -> DataFrame:
    """Per-document PII verdicts: (doc_id, source, per-kind match
    counts, redaction char delta). A doc's verdict depends only on
    that doc, so this relation is the shared block between the batch
    audit (q_pii_scan aggregates it) and the streaming ingest gate
    (q_stream_pii_gate emits it per micro-batch, batch-split
    invariant by construction). Map-only regex, no shuffle."""
    aug = docs.select("doc_id", "source", pii_augmented_text().alias("text"))
    red, _ = redaction_cols()
    return aug.select(
        "doc_id",
        "source",
        *[
            F.regexp_count("text", F.lit(pat)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
        (F.length(red) - F.length("text")).alias("delta"),
    )


def pii_scan(docs: DataFrame) -> DataFrame:
    """Pattern-based PII audit + redaction accounting per source — the
    scrub step every corpus runs before release (cf. the public
    BigCode/CCNet pipelines: regex families for emails, phone
    numbers, government ids, IP addresses; spans replaced with typed
    placeholder tokens).

    Per source: document count, documents carrying any PII, per-kind
    match counts, and the net character delta of replacing every span
    with its placeholder (negative when placeholders are shorter —
    the audit quantity a release report carries).

    Scale shape: the scan is map-only regex work inside whole-stage
    codegen (no Python), followed by ONE aggregation whose shuffle
    carries 5 source cells, not rows. At 100 TB this is scan-bounded
    — the same posture as q_text_quality.

    Reference connection: none in dhoard/orders-kafka-streams; SURVEY
    §2.9 extension surface (privacy/curation family)."""
    any_pii = sum(F.col(f"n_{name}") for name, _, _ in PII_PATTERNS) > 0
    return (
        pii_doc_scan(docs)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(any_pii.cast("long")).alias("docs_with_pii"),
            *[F.sum(f"n_{name}").alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
            F.sum("delta").alias("redaction_delta"),
        )
        .orderBy("source")
    )


def _q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_scan(load_table(spark, sf_dir, "documents"))


def apply_redaction_of(docs: DataFrame) -> DataFrame:
    """Materialize the REDACTED corpus — the artifact the release
    actually ships (q_pii_scan reports the accounting; this applies
    it): every PII span replaced by its typed placeholder, in the
    library's fixed pattern order, plus the per-doc audit columns
    (n_redactions counted on the pre-redaction text — the same basis
    as the scan — and the char delta).

    Scale shape: map-only regex inside whole-stage codegen, zero
    shuffles, zero Python — the redacted corpus streams straight from
    the scan stage to the sink. The detect → apply symmetry mirrors
    q_exact_substrings → q_apply_excision in the dedup family."""
    aug = docs.select("doc_id", "source", pii_augmented_text().alias("text"))
    red, n_red = redaction_cols()
    return aug.select(
        "doc_id",
        "source",
        red.alias("redacted_text"),
        n_red.cast("long").alias("n_redactions"),
        (F.length(red) - F.length("text")).cast("long").alias("delta"),
    )


def _q_apply_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The redacted-corpus artifact over the documents table (every
    doc appears; clean docs pass through with n_redactions = 0).

    Reference connection: none in dhoard/orders-kafka-streams; SURVEY
    §2.9 extension surface (privacy/curation family — completes
    detect → report → APPLY)."""
    return apply_redaction_of(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "q_pii_scan": _q_pii_scan,
    "q_apply_redaction": _q_apply_redaction,
    "q_pseudonymize": _q_pseudonymize,
    "q_k_anonymity": _q_k_anonymity,
    "q_l_diversity": _q_l_diversity,
    "q_dp_histogram": _q_dp_histogram,
}

_TOKEN = hash60_sql(f"'{TOKEN_SALT}' || '|' || c_name")

_DP_U = (
    "greatest("
    + hash60_sql(f"'{DP_SALT}' || '|' || event_type || '|' || day")
    + f" / 1152921504606846976.0 - 0.5, {DP_U_FLOOR!r})"
)

#: DuckDB mirror of pii_augmented_text (same injection arithmetic)
_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 3 THEN ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR)"
    " || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 17 = 2 THEN ' id ' || CAST(doc_id % 900 + 100 AS VARCHAR)"
    " || '-' || CAST(doc_id % 90 + 10 AS VARCHAR)"
    " || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 13 = 5 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST(doc_id % 250 AS VARCHAR)"
    " || '.' || CAST(doc_id % 200 AS VARCHAR) ELSE '' END"
)


def _red_sql() -> str:
    """The full redaction chain over the aug CTE's text column."""
    red = "text"
    for _, pat, rep in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    return red


def _pii_doc_cte() -> str:
    """The per-doc scan as a DuckDB CTE prefix (mirrors
    pii_augmented_text + pii_doc_scan: same injection arithmetic,
    same patterns, same redaction order; DuckDB's regexp_replace
    needs the explicit 'g' flag to match Spark's replace-all)."""
    aug = _AUG_SQL
    red = _red_sql()
    counts = ",\n         ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}" for name, pat, _ in PII_PATTERNS
    )
    return f"""
WITH aug AS (
  SELECT doc_id, source, {aug} AS text FROM documents
),
per_doc AS (
  SELECT doc_id, source,
         {counts},
         length({red}) - length(text) AS delta
  FROM aug
)
"""


def _pii_doc_oracle_sql() -> str:
    """Per-doc verdict relation (the q_stream_pii_gate oracle: the
    assembled stream output must equal the batch per-doc scan)."""
    cols = ", ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return _pii_doc_cte() + f"SELECT doc_id, source, {cols}, delta FROM per_doc"


def _pii_oracle_sql() -> str:
    """Per-source audit (the q_pii_scan oracle)."""
    any_pii = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    sums = ",\n       ".join(
        f"CAST(sum(n_{name}) AS BIGINT) AS n_{name}" for name, _, _ in PII_PATTERNS
    )
    return _pii_doc_cte() + f"""
SELECT source,
       CAST(count(1) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN {any_pii} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       {sums},
       CAST(sum(delta) AS BIGINT) AS redaction_delta
FROM per_doc
GROUP BY source
ORDER BY source
"""


def _apply_redaction_oracle_sql() -> str:
    """The redacted-corpus artifact (the q_apply_redaction oracle)."""
    n_red = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for _, pat, _ in PII_PATTERNS
    )
    return f"""
WITH aug AS (
  SELECT doc_id, source, {_AUG_SQL} AS text FROM documents
)
SELECT doc_id, source,
       {_red_sql()} AS redacted_text,
       CAST({n_red} AS BIGINT) AS n_redactions,
       CAST(length({_red_sql()}) - length(text) AS BIGINT) AS delta
FROM aug
"""


ORACLE = {
    "q_pii_scan": _pii_oracle_sql(),
    "q_apply_redaction": _apply_redaction_oracle_sql(),
    "q_dp_histogram": f"""
WITH cells AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(1) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
noised AS (
  SELECT event_type, day, c,
         -{1.0 / DP_EPSILON} * sign({_DP_U})
           * ln(1.0 - 2.0 * abs({_DP_U})) AS noise
  FROM cells
)
SELECT event_type, day,
       greatest(CAST(0 AS BIGINT), c + CAST(round(noise, 0) AS BIGINT)) AS released_count,
       CAST({DP_EPSILON} AS DOUBLE) AS epsilon_nominal,
       TRUE AS derived_noise
FROM noised
""",
    "q_l_diversity": """
        SELECT nationkey, mktsegment,
               CAST(count(1) AS BIGINT) AS k,
               CAST(count(DISTINCT bal_band) AS BIGINT) AS l,
               count(DISTINCT bal_band) >= 3 AS meets_l
        FROM (
          SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
          FROM customer
        )
        GROUP BY nationkey, mktsegment
    """,
    "q_pseudonymize": f"""
        SELECT c_custkey AS custkey,
               {_TOKEN} AS name_token,
               regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_name,
               c_nationkey AS nationkey,
               c_mktsegment AS mktsegment
        FROM customer
    """,
    "q_k_anonymity": f"""
        SELECT c_nationkey AS nationkey,
               c_mktsegment AS mktsegment,
               CAST(count(*) AS BIGINT) AS k,
               (count(*) >= {K_ANON}) AS meets_k
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
}
