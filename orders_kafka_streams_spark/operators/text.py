"""Text analysis over the ``documents`` table (SURVEY §2.9 / north-star
extension surface): token stats, quality scoring, language-ID
heuristic, term frequency, document fingerprinting.

Everything is Catalyst higher-order functions on the token array — a
single projection, no explode except where an inverted index is the
point (term frequency). At 100 TB each of these is an embarrassingly
parallel map over document partitions; the only shuffles are the
declared aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .presentation import cells_sorted

from ..functions.portable import hash60, hash60_sql
from ..functions.textfns import (
    STOPWORDS,
    shingle_seq,
    shingle_seq_sql,
    stopword_count,
    stopword_count_sql,
    tokens,
    tokens_sql,
)
from ..sources.tables import load_table, parallelize

_TOKS = tokens_sql("text")
_SEQ8 = shingle_seq_sql("t", 8)


def _tokenized(spark: SparkSession, sf_dir: str, *cols: str) -> DataFrame:
    """documents projected to (doc_id, *cols, t=tokens) and persisted.

    Queries that consume the token array k times (size, distinct-size,
    stopword count, length fold…) would otherwise evaluate the split/
    normalize tokenizer k× per doc — Catalyst's CollapseProject inlines
    the alias into every consumer (same trap as the MinHash signature
    build; measured 3.2 s → 1.05 s at sf0.1 for q_text_quality). One
    cached pass keeps the query map-only — no shuffle is introduced,
    which is the right trade at 100 TB where exploding tokens to dodge
    the recompute would shuffle the whole corpus instead.

    Memoized per (application, sf_dir, cols) via dedup's persist memo —
    one deliberate cache entry per projection instead of re-registering
    the persist on every query invocation."""
    from .dedup import _memo_persist

    def build() -> DataFrame:
        docs = parallelize(load_table(spark, sf_dir, "documents"))
        return docs.select("doc_id", *cols, tokens(F.col("text")).alias("t"))

    return _memo_persist(spark, sf_dir, f"tokenized:{','.join(cols)}", build)


def _q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish proxy (chars/4,
    the standard subword-count estimate) + distinct-token count."""
    base = _tokenized(spark, sf_dir, "text")
    t = F.col("t")
    return base.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.ceil(F.length("text") / 4).cast("long").alias("n_subwords_est"),
    )


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/uniqueness signals combined into
    a deterministic [0,1]-ish score (the shape of Gopher/C4-style rules)."""
    base = _tokenized(spark, sf_dir, "lang", "text")
    t = F.col("t")
    n = F.size(t)
    uniq = F.size(F.array_distinct(t))
    sw = stopword_count(t)
    # punctuation ratio over characters (C4/Gopher-style signal)
    n_punct = F.length("text") - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    punct_ratio = n_punct.cast("double") / F.length("text")
    mean_len = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("double")), F.lit(0.0), lambda a, x: a + x
    ) / n
    score = (
        0.4 * (uniq.cast("double") / n)
        + 0.3 * F.least(sw.cast("double") / n * 5, F.lit(1.0))
        + 0.3 * F.least(n.cast("double") / 100, F.lit(1.0))
    )
    return base.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        F.round(uniq.cast("double") / n, 6).alias("uniq_ratio"),
        F.round(sw.cast("double") / n, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality_score"),
    )


#: Ranked character-trigram profiles (Cavnar-Trenkle 1994, "N-Gram-Based
#: Text Categorization"): position = frequency rank in the language.
#: ASCII-only, space-padded — the hand-curated high-frequency trigrams of
#: each language's function words; real deployments train these from a
#: corpus, the METHOD (ranked out-of-place distance) is identical.
CT_PROFILES = {
    "en": (" th", "the", "he ", "ed ", " an", "nd ", "and", " of", "of ",
           "ing", "ng ", " in", "in ", " to", "to ", "er ", "at ", "on ",
           "en ", " co", "re ", "is ", "es ", " be"),
    "de": ("en ", "er ", " de", "der", "ie ", "die", "sch", "ein", "che",
           "ich", "nde", " di", "ch ", "den", "und", " un", "ne ", "ung",
           "das", " da", "ben", "ten", " ei", "ges"),
    "fr": (" de", "de ", "es ", "le ", " le", "ent", "nt ", "la ", " la",
           "que", " qu", "ue ", "re ", " co", "on ", "ne ", "les", "ais",
           "ur ", "ion", " pa", "tio", "e d", "eur"),
    "es": (" de", "de ", "os ", " la", "la ", "el ", " el", "en ", " en",
           "es ", "as ", " co", "ue ", "que", " qu", "ado", "ar ", " se",
           "ion", "cio", " po", "do ", "ent", "a d"),
}
CT_TOP_M = 20  # doc profile depth (top-M trigrams by count)
#: out-of-place penalty for a doc trigram absent from a language profile
CT_PENALTY = max(len(p) for p in CT_PROFILES.values())


def _q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cavnar-Trenkle ranked-trigram language ID, full method: build
    each document's TOP-M trigram profile (count desc, trigram asc),
    compare against 4 ranked language profiles by OUT-OF-PLACE distance
    (|doc_rank − lang_rank|, penalty CT_PENALTY when absent), argmin
    with deterministic language-name tie-break; output the per-language
    confusion counts + mean distance. Replaces the r1 en/unknown
    stopword heuristic (VERDICT r1 item 6).

    Scale shape: all shuffles key on doc_id (trigram count, rank
    window, distance sum, argmin window); the 4×24-row profile table
    and the language list are broadcast literals. Docs shorter than 3
    chars have no trigrams and are excluded on both engines (explode
    drops empty arrays — stated policy, not an accident).

    On the synthetic corpus the confusion matrix is ~chance BY
    CONSTRUCTION (all langs share one vocabulary, TESTDATA.md); the
    method's discriminative power on real text is asserted in
    tests/test_text_langid.py over hand-written sentences.

    The ranked doc profile (trigram count + rank window — measured
    ~1.7 of 2.0 s steady at sf0.1, the whole cost of this query) is a
    reusable index, the same artifact class as the memoized shingle and
    pair relations — persisted once per (application, sf_dir)."""
    from .dedup import _memo_persist

    docs = parallelize(load_table(spark, sf_dir, "documents"))
    docp = _memo_persist(
        spark, sf_dir, "ct_doc_profile", lambda: ct_doc_profile(docs)
    )
    return ct_langid_confusion(docs, docp=docp)


def ct_doc_profile(docs: DataFrame) -> DataFrame:
    """Top-CT_TOP_M ranked trigram profile per document:
    (doc_id, lang, g, c, dr)."""
    low = F.lower(F.col("text"))
    tri_arr = F.when(
        F.length(low) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(low) - 2), lambda i: low.substr(i, F.lit(3))
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = docs.select("doc_id", "lang", F.explode(tri_arr).alias("g"))
    cnt = tri.groupBy("doc_id", "lang", "g").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    return cnt.withColumn("dr", F.row_number().over(w)).filter(F.col("dr") <= CT_TOP_M)


def ct_langid(docs: DataFrame, docp: DataFrame | None = None) -> DataFrame:
    """Per-document Cavnar-Trenkle prediction over any (doc_id, lang,
    text) relation: returns (doc_id, lang, pred_lang, dist). Pass a
    (possibly persisted) ``docp`` to reuse a precomputed profile.

    r11 (guide §2.3, second pass): the 4 language profiles are tiny
    LITERALS, so each language's out-of-place distance is a map-literal
    lookup COLUMN summed in ONE (doc_id, lang)-keyed aggregation —
    the previous form fanned every profile row out ×|langs| through a
    crossJoin + broadcast join and paid a second aggregation for the
    argmin; the per-language sums are integer-exact either way, and
    ``least`` over (dist, plang) structs IS the (dist asc, plang asc)
    tie rule, evaluated map-only after the single exchange."""
    if docp is None:
        docp = ct_doc_profile(docs)
    per_lang = []
    for plang in sorted(CT_PROFILES):
        entries: list = []
        for i, g in enumerate(CT_PROFILES[plang]):
            entries += [F.lit(g), F.lit(i + 1)]
        lr = F.create_map(*entries)[F.col("g")]
        oop = F.coalesce(F.abs(F.col("dr") - lr), F.lit(CT_PENALTY))
        per_lang.append((plang, oop))
    agg = docp.groupBy("doc_id", "lang").agg(
        *[
            F.sum(oop).cast("long").alias(f"_d_{i}")
            for i, (_, oop) in enumerate(per_lang)
        ]
    )
    m = F.least(
        *[
            F.struct(
                F.col(f"_d_{i}").alias("dist"), F.lit(plang).alias("plang")
            )
            for i, (plang, _) in enumerate(per_lang)
        ]
    )
    return agg.select(
        "doc_id",
        "lang",
        m["plang"].alias("pred_lang"),
        m["dist"].alias("dist"),
    )


def ct_langid_confusion(docs: DataFrame, docp: DataFrame | None = None) -> DataFrame:
    return ct_langid(docs, docp=docp).groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("dist"), 4).alias("avg_oop"),
    )


def _q_text_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global term frequency, top 20 — explode → count → top-k.

    The explode is the inverted-index build; at scale the count is
    partial-agg'd map-side so the shuffle carries one row per distinct
    term per partition, not one per token."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(20)
    )


#: GPT-style pre-tokenizer classes: letter runs, digit runs, single
#: punctuation marks. Both engines' regex dialects (Java / RE2) agree
#: on this character-class-only pattern — no lookarounds, no \p classes.
_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _q_text_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style token counting with a BPE-ish pre-tokenizer regex
    (letter runs / digit runs / punctuation singles), the standard
    first stage of byte-pair tokenizers — alongside the whitespace
    count so the two tokenization levels are directly comparable.
    Map-only; the regex runs once per doc (single consumer)."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    pieces = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), F.lit(0))
    base = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_ws_tokens"), pieces.alias("p")
    ).persist()
    return base.select(
        "doc_id",
        "n_ws_tokens",
        F.size("p").alias("n_bpe_pieces"),
        F.size(F.array_distinct("p")).alias("n_distinct_pieces"),
    )



#: tiny per-language character-trigram profiles (top frequent trigrams
#: of each language's orthography). Real deployments swap in the full
#: ranked profiles (Cavnar-Trenkle out-of-place scoring); the operator
#: mechanics — trigram extraction, profile membership count, argmax —
#: are identical and that is what the oracle pins.
LANG_PROFILES = {
    "en": ("the", "he ", " th", "ing", "and", " an", "nd ", " of", "of ", "ed "),
    "fr": ("es ", " de", "de ", "le ", " le", "ent", "nt ", "que", " qu", "la "),
    "de": ("en ", "er ", "ch ", "der", " de", "ein", "ie ", "sch", "die", "und"),
}


def _q_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character n-gram language ID (Cavnar-Trenkle shape): lowercase,
    extract all char trigrams, count hits against each language's
    trigram profile, argmax with a deterministic en>fr>de tie order.
    Complements q_text_langid's stopword heuristic with the n-gram
    profile method. Map-only over the cached trigram array."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    low = F.lower(F.col("text"))
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(low) - 2, F.lit(0))),
        lambda i: low.substr(i, F.lit(3)),
    )
    base = docs.select("doc_id", "lang", tri.alias("tri")).persist()
    def member(prof):
        # closure factory (see dedup.minhash_signature): default-arg
        # capture would be misread as a 2-arg HOF lambda.
        return lambda x: x.isin(*prof)

    scores = {
        lang: F.size(F.filter(F.col("tri"), member(prof)))
        for lang, prof in LANG_PROFILES.items()
    }
    en, fr, de = scores["en"], scores["fr"], scores["de"]
    pred = (
        F.when((en >= fr) & (en >= de), "en")
        .when(fr >= de, "fr")
        .otherwise("de")
    )
    return base.select(
        "doc_id",
        "lang",
        en.alias("en_score"),
        fr.alias("fr_score"),
        de.alias("de_score"),
        pred.alias("pred_lang"),
    )


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    t = tokens(F.col("text"))
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(F.size(t)).alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )


def _q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-text portable hash + min-token-hash
    (the 1-perm MinHash special case — winnowing's building block)."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    t = tokens(F.col("text"))
    min_tok_hash = F.array_min(F.transform(t, lambda x: hash60(x)))
    return docs.select(
        "doc_id",
        hash60(F.col("text")).alias("text_hash"),
        min_tok_hash.alias("min_token_hash"),
    )


#: winnowing window: a fingerprint is selected from every run of
#: WINNOW_W consecutive k-gram hashes, guaranteeing any match of
#: WINNOW_W + k - 1 tokens shares a fingerprint (Schleimer et al.,
#: "Winnowing: Local Algorithms for Document Fingerprinting").
WINNOW_W = 4


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Per-doc winnowing selection over any (doc_id, text) relation,
    persisted: (doc_id, n_windows, fp = distinct window-min hashes).

    Layer 1 caches the hashed k-gram sequence (tokenize+shingle+md5 is
    the expensive chain); layer 2 caches the window-min selection.
    Without the second cache, CollapseProject re-inlines the whole
    zip_with chain into each downstream consumer. The sliding
    window-min is W-1 pairwise ``zip_with(least)`` merges over shifted
    ``slice``s — each lambda touches only its bound element vars, so
    the build is O(len·W) interpreted steps, never the O(len²)
    outer-array-reference trap. Map-only: no shuffle, no explode."""
    from ..functions.textfns import shingle_seq

    hashed = docs.select(
        "doc_id",
        F.transform(shingle_seq(tokens(F.col("text"))), hash60).alias("hs"),
    ).persist()
    n = F.size("hs")
    m = F.greatest(n - F.lit(WINNOW_W - 1), F.lit(0))
    shifted = [F.slice(F.col("hs"), j + 1, m) for j in range(WINNOW_W)]
    wmin = shifted[0]
    for s in shifted[1:]:
        wmin = F.zip_with(wmin, s, lambda x, y: F.least(x, y))
    return hashed.select(
        "doc_id", m.cast("int").alias("n_windows"), F.array_distinct(wmin).alias("fp")
    ).persist()


def _winnow_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    # memoized: q_text_winnow and q_winnow_match share one persisted
    # fingerprint relation per (application, sf_dir) instead of each
    # re-registering winnow_fingerprints' two persist layers.
    from .dedup import _memo_persist

    return _memo_persist(
        spark,
        sf_dir,
        "winnow_fp",
        lambda: winnow_fingerprints(parallelize(load_table(spark, sf_dir, "documents"))),
    )


def _q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash the POSITIONAL 3-gram sequence, take the min hash of every
    sliding window of 4 consecutive grams, and keep the distinct
    selected hashes as the doc's fingerprint set. Per-doc summary stats
    keep the oracle compact while pinning the exact fingerprint set
    (count + min + max + XOR checksum); see :func:`_winnow_selected`
    for the plan-shape discussion.
    """
    selected = _winnow_selected(spark, sf_dir)
    fp = F.col("fp")
    return selected.select(
        "doc_id",
        "n_windows",
        F.size(fp).alias("n_fingerprints"),
        F.array_min(fp).alias("min_fp"),
        F.array_max(fp).alias("max_fp"),
        # XOR fold, not sum: 60-bit hash sums overflow int64 (ANSI error)
        F.aggregate(fp, F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x)).alias("fp_xor"),
    )


#: MOSS-style commonality cutoff: a fingerprint appearing in more than
#: this many documents is boilerplate, not evidence of copying — and,
#: because winnowing selects MINIMUM hashes, globally small hash values
#: recur across docs, so these are exactly the hot join keys. Dropping
#: them is both the algorithm's published behavior and the skew guard.
WINNOW_MAX_DF = 50
WINNOW_MIN_SHARED = 3


def _q_winnow_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-pair match candidates by shared winnowing fingerprints
    (what MOSS reports): pairs sharing ≥ WINNOW_MIN_SHARED fingerprints
    after dropping fingerprints common to > WINNOW_MAX_DF docs.

    Scale shape mirrors the dedup family: explode the per-doc selection
    to postings, group them into per-fingerprint posting lists (bounded
    ≤ WINNOW_MAX_DF by the df filter — longer lists are boilerplate and
    dropped whole), then generate ordered pairs by a DOUBLE explode of
    each surviving list and hash-aggregate per candidate pair. The df
    cutoff bounds the fan-out at ≤ MAX_DF² per fingerprint regardless
    of corpus size.

    r11 (guide §2.4): the posting grouping replaces the old
    df-aggregate + broadcast-rare + postings self-join — ONE exchange
    of the postings instead of two plus a sort-merge self-join, with
    pair generation as two codegen Generate nodes (NOT the interpreted
    per-element transform/filter HOF form, which an earlier attempt
    measured 47% SLOWER than the self-join; nested explode stays in
    the codegen path). Singleton lists are dropped before the fan-out
    (a lone posting can never form a pair — lossless). Interleaved
    A/B: sf1 9.4-12.7 → 3.0-7.9 s, sf1skew 5.1-8.5 → 2.6-3.3 s,
    result sets identical on both corpora."""
    post = _winnow_selected(spark, sf_dir).select(
        "doc_id", F.explode("fp").alias("f")
    )
    groups = (
        post.groupBy("f")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter((F.size("ds") <= WINNOW_MAX_DF) & (F.size("ds") >= 2))
    )
    return (
        groups.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring: top-3 terms per document (doc_id < 100) with
    smoothed idf = ln((N+1)/(df+1)).

    Three aggregations, all narrow after the explode: per-(doc, term)
    tf, per-term df, corpus size N (1-row broadcast). At 100 TB the
    df table is the only global structure — millions of terms, not
    billions of rows — and broadcasts; the per-doc ranking is one
    window shuffle on doc_id.
    """
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df_n")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score_raw"), F.asc("term"))
    return (
        tf.filter(F.col("doc_id") < 100)
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score_raw",
            F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df_n") + 1)),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "rk", F.round("score_raw", 6).alias("tfidf"))
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
#: fixed demo queries — q3 pairs the corpus's one rare term ('dup',
#: df 26/500 at sf0.01) with a common one, so idf discrimination is
#: actually exercised, not just tf/length normalization.
BM25_QUERIES = {1: ("table", "scan"), 2: ("window", "agg"), 3: ("dup", "merge")}


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranking (Robertson & Walker 1994) of documents
    against a fixed query set — the retrieval-scoring stage of a
    dedup/decontamination pipeline (e.g. scoring training docs against
    benchmark queries) built entirely from corpus statistics:
    idf = ln((N − df + ½)/(df + ½) + 1), tf with k1/b length
    normalization against the corpus average doc length.

    Scale design: the corpus-wide scalars (N, Σdl) are a 1-row
    broadcast; df and tf are computed only for the ≤|Q| query terms
    (the token stream is semi-join-filtered by the broadcast term list
    BEFORE any aggregation, so the per-key work is bounded by the
    query vocabulary, not the corpus vocabulary); the only corpus-wide
    shuffle is the doc_id-keyed join of per-term hits to doc lengths.
    Per-(query, doc) scores sum ≤|terms| values and are rounded to 4
    before ranking; ties break on doc_id so top-k is engine-stable.
    Output: (query_id, doc_id, score, rank) top-BM25_TOPK per query."""
    base = _tokenized(spark, sf_dir)
    ex = base.select("doc_id", F.explode("t").alias("w"))
    dl = base.select("doc_id", F.size("t").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot")
    )
    qterms = spark.createDataFrame(
        [(qid, w) for qid, ws in sorted(BM25_QUERIES.items()) for w in ws],
        "query_id int, w string",
    )
    hits = ex.join(F.broadcast(qterms.select("w").distinct()), "w")
    dfq = hits.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    tf = (
        ex.join(F.broadcast(qterms), "w")
        .groupBy("query_id", "w", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B)
        + F.lit(BM25_B) * F.col("dl") / (F.col("tot") / F.col("n_docs"))
    )
    scored = (
        tf.join(F.broadcast(dfq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (idf * F.col("tf") * F.lit(BM25_K1 + 1.0) / denom).alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("s"), 4).alias("score"))
    )
    rk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.select(
        "query_id", "doc_id", "score", F.row_number().over(rk).alias("rank")
    ).filter(F.col("rank") <= BM25_TOPK)


def _bm25_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{w}')" for qid, ws in sorted(BM25_QUERIES.items()) for w in ws
    )
    # expression order mirrors the Spark column expressions exactly so
    # both engines evaluate the same IEEE operation sequence pre-round
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
ex AS (SELECT doc_id, unnest(t) AS w FROM toks),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (SELECT CAST(count(1) AS BIGINT) AS n_docs, CAST(sum(len(t)) AS BIGINT) AS tot FROM toks),
q(query_id, w) AS (VALUES {vals}),
dfq AS (
  SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM ex WHERE w IN (SELECT w FROM q) GROUP BY w
),
tf AS (
  SELECT q.query_id, e.w, e.doc_id, CAST(count(1) AS BIGINT) AS tf
  FROM ex e JOIN q ON e.w = q.w
  GROUP BY q.query_id, e.w, e.doc_id
),
s AS (
  SELECT tf.query_id, tf.doc_id,
         ln((s2.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * tf.tf * {BM25_K1 + 1.0}
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / (s2.tot / s2.n_docs))) AS sc
  FROM tf
  JOIN dfq d USING (w)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s2
),
agg AS (
  SELECT query_id, doc_id, round(sum(sc), 4) AS score
  FROM s GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, score, rank FROM (
  SELECT query_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
  FROM agg)
WHERE rank <= {BM25_TOPK}
"""


BPE_MERGES = 6  # unrolled merge steps (fixed K keeps both plans static)


def _word_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word histogram (w, wc) — one corpus pass, memo-persisted,
    shared by the BPE trainer and the unigram LM scorer."""
    from .dedup import _memo_persist

    def build() -> DataFrame:
        base = _tokenized(spark, sf_dir)
        return (
            base.select(F.explode("t").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("wc"))
        )

    return _memo_persist(spark, sf_dir, "word_hist", build)


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability — the perplexity-proxy
    quality score of a CCNet-style curation pipeline (docs whose tokens
    are improbable under the corpus LM are outliers: boilerplate,
    gibberish, wrong-language). The LM here is the corpus's own unigram
    distribution — the honest stand-in for an external reference LM
    (none ships in this container); the scoring plumbing is identical.

    Scale design: the LM is the word HISTOGRAM (one corpus pass, memo-
    persisted, shared with q_bpe_train), broadcast to the token stream
    — scoring is one broadcast hash join on the exploded corpus plus a
    partial-aggregated per-doc mean. The corpus never shuffles; only
    doc_id-keyed partials do. A vocabulary too big to broadcast (not
    the case for natural-language word counts) would fall back to a
    shuffle join on the token key — one-line change.

    Zero-token documents have no defined mean and are excluded by the
    inner join on both engines. Output: (doc_id, n_tokens, avg_logp).
    """
    words = _word_hist(spark, sf_dir)
    total = words.agg(F.sum("wc").alias("tot"))
    lp = (
        words.crossJoin(F.broadcast(total))
        .select("w", F.log(F.col("wc") / F.col("tot")).alias("lp"))
    )
    base = _tokenized(spark, sf_dir)
    return (
        base.select("doc_id", F.explode("t").alias("w"))
        .join(F.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("avg_logp"),
        )
    )


def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-rule TRAINING (Sennrich et al. 2016, "Neural Machine
    Translation of Rare Words with Subword Units"): learn BPE_MERGES
    merge rules from the corpus — each step counts adjacent symbol
    pairs weighted by word frequency, merges the most frequent pair
    (ties broken lexicographically), and rewrites the vocabulary.

    Scale design — the textbook trainer, distributed: training runs on
    the WORD HISTOGRAM (distinct word + count), never the raw corpus;
    one corpus pass builds the histogram (memo-persisted), after which
    every merge iteration touches |vocab| rows. Words are represented
    as '|'-delimited symbol strings so the merge rewrite is a literal
    string replace — left-to-right non-overlapping on both engines,
    which IS the BPE single-pass merge semantics (verified:
    '|a|a|a|' -> '|aa|a|' on both). The K-step loop runs as a
    single-partition Arrow kernel over the histogram (see _bpe_steps
    for why that is the honest 100 TB shape).
    Output: (step, sym_a, sym_b, merged, pair_count)."""
    rules, _ = _bpe_steps(spark, sf_dir)
    return rules


def _bpe_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'|'-delimited symbol strings over the word histogram, coalesced
    to ONE partition — the histogram is O(distinct words) by Heaps'
    law and the merge loop is inherently sequential, so a single
    Arrow batch is the right execution shape for the loop."""
    words = _word_hist(spark, sf_dir)
    wstr = F.concat(F.lit("|"), F.concat_ws("|", F.split(F.col("w"), "")), F.lit("|"))
    return words.select("w", wstr.alias("s"), "wc").coalesce(1)


def _bpe_merge_loop(rows_s: list, rows_wc: list, n_steps: int):
    """The sequential BPE merge loop (pure Python over the in-memory
    histogram): returns (rules, rewritten symbol strings). Pair counts
    include overlapping adjacent pairs (Sennrich's counting, identical
    to the previous unrolled slice/zip_with plan); the rewrite is
    left-to-right non-overlapping str.replace — the same single-pass
    semantics as Spark's replace() and DuckDB's replace() ('|a|a|a|'
    -> '|aa|a|' on all three), so the DuckDB oracle's unrolled SQL
    stays a bit-exact twin."""
    s, rules = list(rows_s), []
    for step in range(1, n_steps + 1):
        cnt: dict = {}
        for ss, c in zip(s, rows_wc):
            syms = [x for x in ss.split("|") if x]
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + c
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((step, a, b, a + b, c))
        pat, rep = f"|{a}|{b}|", f"|{a}{b}|"
        s = [ss.replace(pat, rep) for ss in s]
    return rules, s


def _bpe_steps(spark: SparkSession, sf_dir: str):
    """Shared BPE merge training: returns (rules DataFrame, final
    rewritten vocabulary carrying the source word). The trainer emits
    the rules; the encoder keeps the final vocabulary — one artifact
    build, two products, exactly like a real tokenizer pipeline.

    Scale split: the corpus pass (histogram build) is distributed and
    memo-persisted; the K-step merge LOOP runs as a single-partition
    Arrow kernel over the histogram. The loop is sequential by nature
    (step k+1's counts depend on step k's rewrite), so distributing it
    (the round-2 unrolled-plan form) bought nothing but ~20 tiny
    shuffle stages of scheduler overhead — measured 5.8 s at sf0.1
    where the kernel is sub-second. At 100 TB the histogram is still
    MBs (Heaps' law: ~vocab, not corpus), so the single-batch shape
    holds; only the corpus pass scales with data.

    The final vocabulary is memo-persisted: encode and corpus-tokenize
    both consume it — the same artifact-reuse policy as the
    shingle/pair relations."""
    import pandas as pd

    base = _bpe_base(spark, sf_dir)

    def train(batches):
        pdfs = [p for p in batches if not p.empty]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        rules, _ = _bpe_merge_loop(pdf["s"].tolist(), pdf["wc"].tolist(), BPE_MERGES)
        yield pd.DataFrame(
            rules, columns=["step", "sym_a", "sym_b", "merged", "pair_count"]
        )

    def vocab(batches):
        pdfs = [p for p in batches if not p.empty]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        _, s = _bpe_merge_loop(pdf["s"].tolist(), pdf["wc"].tolist(), BPE_MERGES)
        yield pd.DataFrame({"w": pdf["w"], "s": s, "wc": pdf["wc"]})

    rules_df = base.mapInPandas(
        train, "step int, sym_a string, sym_b string, merged string, pair_count bigint"
    )
    vocab_df = base.mapInPandas(vocab, "w string, s string, wc bigint")
    return rules_df, vocab_df


def _bpe_vocab_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _memo_persist

    return _memo_persist(
        spark, sf_dir, "bpe_vocab", lambda: _bpe_steps(spark, sf_dir)[1]
    )


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the learned merges: the final rewritten
    vocabulary from the shared merge unrolling IS the encoding — each
    word's piece sequence after all BPE_MERGES rewrites, plus its
    corpus frequency and piece count. Runs on the word HISTOGRAM
    (distinct words), never the raw corpus: at 100 TB you encode the
    vocabulary once and broadcast-join the piece map back onto
    documents — the rewrite cost is O(|vocab| · K), not O(corpus).
    Stays fully lazy (no driver-side merge collection): each rule is a
    1-row broadcast crossed into the next rewrite."""
    cur = _bpe_vocab_cached(spark, sf_dir)
    pieces = F.filter(F.split(F.col("s"), "\\|"), lambda x: x != "")
    return cur.select(
        "w",
        "wc",
        F.size(pieces).alias("n_pieces"),
        F.concat_ws(" ", pieces).alias("encoding"),
    )


def _q_doc_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization THROUGH the learned BPE vocabulary: the
    piece map from the shared merge unrolling (O(|vocab|) rows) is
    broadcast-joined onto the exploded token stream, then re-aggregated
    per document — (doc_id, source, n_words, n_subwords). This is the
    scale path q_bpe_encode's docstring promises: encode the vocabulary
    once, broadcast the piece map, and the 100 TB corpus pays one
    map-side join + one doc_id-keyed aggregation (no second corpus
    pass, no Python)."""
    cur = _bpe_vocab_cached(spark, sf_dir)
    np = F.size(F.filter(F.split("s", "\\|"), lambda x: x != ""))
    piece_map = cur.select("w", np.alias("np"))
    words = _tokenized(spark, sf_dir, "source").select(
        "doc_id", "source", F.explode("t").alias("w")
    )
    return (
        words.join(F.broadcast(piece_map), "w")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("np").alias("n_subwords"),
        )
    )


VOCAB_TOP_V = 40  # fixed vocabulary budget for the coverage audit


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV audit: with a top-V frequency vocab
    (deterministic count-desc, word-asc cut), what fraction of each
    source's TOKEN MASS is covered, and how many distinct types fall
    out-of-vocabulary? This is the go/no-go number for a fixed-vocab
    tokenizer before training it — run per candidate V. The vocab is
    a broadcast of V rows against the exploded token stream; one
    map-side join + one source-keyed aggregation."""
    hist = _word_hist(spark, sf_dir)
    # top-V as orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps + one V-row reduce), not a single-partition rank window
    # over the histogram; same deterministic (count desc, word asc) cut
    vocab = (
        hist.orderBy(F.desc("wc"), F.asc("w"))
        .limit(VOCAB_TOP_V)
        .select("w", F.lit(1).alias("in_v"))
    )
    toks = _tokenized(spark, sf_dir, "source").select(
        "source", F.explode("t").alias("w")
    )
    j = toks.join(F.broadcast(vocab), "w", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce("in_v", F.lit(0))).alias("n_covered"),
        F.countDistinct(F.when(F.col("in_v").isNull(), F.col("w"))).alias("n_oov_types"),
        F.round(
            F.sum(F.coalesce("in_v", F.lit(0))).cast("double") / F.count(F.lit(1)), 6
        ).alias("coverage"),
    )


def _q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-mass estimate over the word population: the
    probability the NEXT token is a never-seen type ≈ f1/N (singleton
    count over token mass) — the smoothing mass a unigram LM must
    reserve (companion to q_unigram_logprob) and, like Chao1, a
    sample-to-full-corpus extrapolation tool. One pass over the word
    histogram."""
    hist = _word_hist(spark, sf_dir)
    return hist.agg(
        F.sum("wc").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("wc") == 1, 1).otherwise(0)).alias("f1"),
    ).select(
        "n_tokens",
        "n_types",
        "f1",
        F.round(F.col("f1").cast("double") / F.col("n_tokens"), 6).alias("p_unseen"),
    )


def _q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the word histogram: least-squares slope of
    ln(freq) on ln(rank) (natural corpora sit near −1; synthetic or
    boilerplate-heavy corpora deviate — a one-number corpus-health
    diagnostic). Ranks are assigned over the |vocab| HISTOGRAM, never
    the corpus — and via the two-pass range-partition form
    (sampling.global_row_numbers), so even a 100 TB corpus's
    multi-million-type histogram never funnels through one
    Sort+Window task; the closed-form slope is one aggregate."""
    from .dedup import _memo_persist
    from .sampling import global_row_numbers

    hist = _word_hist(spark, sf_dir)
    # float note: the slope's four double sums now merge 32 range-
    # partition partials in fetch order instead of one partition's row
    # order — same kind of last-ulp exposure the cross-engine rounding
    # contract already carries (sums of ~|V| ln-terms ⇒ abs error
    # ~1e-7 on 1e5-magnitude sums, vs the 5e-5 round(4) boundary)
    ranked = global_row_numbers(
        hist,
        [F.desc("wc"), F.asc("w")],
        memo=lambda build: _memo_persist(spark, sf_dir, "zipf_ranked:hist", build),
    ).withColumnRenamed("rn", "r")
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("wc").cast("double"))
    pts = ranked.select(x.alias("x"), y.alias("y"))
    return pts.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        "n_types",
        F.round(
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n_types"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_types")),
            4,
        ).alias("zipf_slope"),
    )


def _bpe_oracle(final: str | None = None) -> str:
    """Unrolled BPE CTE chain; ``final`` overrides the trailing select
    (default: the trainer's merge-rule union). The encode oracle reads
    the last rewritten vocabulary s{BPE_MERGES} instead."""
    steps = []
    prev = "s0"
    for i in range(1, BPE_MERGES + 1):
        steps.append(f"""
sy{i} AS (SELECT list_filter(string_split(s, '|'), x -> x <> '') AS syms, wc FROM {prev}),
p{i} AS (
  SELECT syms[CAST(u AS INTEGER)] AS a, syms[CAST(u AS INTEGER) + 1] AS b, wc
  FROM sy{i}, unnest(range(1, len(syms))) AS t(u)
),
rule{i} AS (
  SELECT a, b, CAST(sum(wc) AS BIGINT) AS cnt
  FROM p{i} GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
),
s{i} AS (
  SELECT w, replace(s, '|' || r.a || '|' || r.b || '|', '|' || r.a || r.b || '|') AS s, wc
  FROM {prev} CROSS JOIN rule{i} r
)""")
        prev = f"s{i}"
    union = final or "\nUNION ALL\n".join(
        f"SELECT {i} AS step, a AS sym_a, b AS sym_b, a || b AS merged, cnt AS pair_count FROM rule{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return (
        f"""
WITH toks AS (SELECT {_TOKS} AS w FROM documents),
words AS (
  SELECT w2 AS w, count(1) AS wc
  FROM (SELECT unnest(w) AS w2 FROM toks) GROUP BY w2
),
s0 AS (
  SELECT w,
         '|' || array_to_string(list_transform(range(1, length(w) + 1), i -> w[i:i]), '|') || '|' AS s,
         wc
  FROM words
),"""
        + ",".join(steps)
        + "\n"
        + union
    )


def _bpe_encode_oracle() -> str:
    return _bpe_oracle(
        f"""
SELECT w, wc,
       CAST(len(list_filter(string_split(s, '|'), x -> x <> '')) AS INTEGER) AS n_pieces,
       array_to_string(list_filter(string_split(s, '|'), x -> x <> ''), ' ') AS encoding
FROM s{BPE_MERGES}"""
    )


def _doc_tokenize_oracle() -> str:
    return _bpe_oracle(
        f"""
SELECT d.doc_id, d.source,
       CAST(count(1) AS BIGINT) AS n_words,
       CAST(sum(m.np) AS BIGINT) AS n_subwords
FROM (SELECT doc_id, source, unnest({_TOKS}) AS w FROM documents) d
JOIN (SELECT w, len(list_filter(string_split(s, '|'), x -> x <> '')) AS np
      FROM s{BPE_MERGES}) m USING (w)
GROUP BY d.doc_id, d.source"""
    )


PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def _q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining (Church & Hanks
    1990): the corpus's most-associated adjacent word pairs —
    PMI = ln(P(a,b) / (P(a)·P(b))) over bigram positions vs unigram
    occurrences, with the classic min-count cutoff that kills the
    low-frequency PMI explosion. The corpus-analysis face of phrase
    detection / tokenizer-merge candidates.

    Scale shape: three partial-aggregated counts (bigram, unigram,
    totals), the unigram relation broadcast twice onto the bigram
    relation (vocab ≪ corpus), one top-k TakeOrdered. The corpus
    shuffles nothing; only count cells move."""
    from ..functions.textfns import shingle_seq

    base = _tokenized(spark, sf_dir)
    uni = base.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cw")
    )
    bi = (
        base.select(F.explode(shingle_seq(F.col("t"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= PMI_MIN_COUNT)
        .withColumn("a", F.split("bg", " ").getItem(0))
        .withColumn("b", F.split("bg", " ").getItem(1))
    )
    tot = base.select(
        F.sum(F.size("t")).alias("n_uni"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).alias("n_bi"),
    )
    ua = uni.select(F.col("w").alias("a"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("cw").alias("cb"))
    pmi = F.log(
        (F.col("cab") / F.col("n_bi"))
        / ((F.col("ca") / F.col("n_uni")) * (F.col("cb") / F.col("n_uni")))
    )
    return (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select("a", "b", "cab", F.round(pmi, 4).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
        .limit(PMI_TOP_K)
    )


MEM_NGRAM = 8  # span length for the memorization probe
MEM_TOP_K = 20


def _q_memorization_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk audit (the Carlini et al. extraction-attack
    setup inverted into curation): the corpus's most-REPEATED long
    n-grams — spans repeated many times across documents are the ones
    a model most reliably memorizes verbatim, so they are the first
    candidates for the dedup/suppression pass. Output: top MEM_TOP_K
    8-gram hashes with total occurrences and distinct-document reach.

    Scale shape: positional 8-grams hashed at the scan (the winnowing
    k-gram chain's cost model), one partial-aggregated count per gram,
    top-k via TakeOrderedAndProject — inverted-index cost; only
    (gram-hash, count) cells shuffle."""
    from ..functions.textfns import shingle_seq

    base = _tokenized(spark, sf_dir)
    ex = base.select(
        "doc_id", F.explode(F.transform(shingle_seq(F.col("t"), MEM_NGRAM), hash60)).alias("g")
    )
    return (
        ex.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.desc("n_occurrences"), F.desc("n_docs"), F.asc("g"))
        .limit(MEM_TOP_K)
        .select(F.col("g").alias("gram_hash"), "n_occurrences", "n_docs")
    )


def _q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy — the
    tokenizer-independent gibberish/boilerplate signal (random noise
    scores near the alphabet's max entropy, repeated templates score
    far below the corpus mode; both tails are curation candidates).
    Complements the token-level gates: it needs no vocabulary, so it
    catches junk the word-based scores can't see.

    Scale shape: one char-explode pass partial-aggregated to
    (doc, char) cells (≤ alphabet-size per doc after map-side
    combine), then a doc-keyed entropy fold — cells in the shuffle,
    not characters. Output: (doc_id, n_chars, n_distinct, entropy)."""
    docs = parallelize(load_table(spark, sf_dir, "documents"))
    cells = (
        # length guard: Spark's split('', '') yields [''] (a phantom
        # char row) where the oracle's range-transform yields [] —
        # empty docs are excluded as stated policy on both engines
        docs.filter(F.length("text") > 0)
        .select("doc_id", F.explode(F.split(F.lower("text"), "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cells.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    ent = (
        cells.join(tot, "doc_id")
        .select(
            "doc_id",
            "n",
            "n_distinct",
            (-(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n"))).alias("t"),
        )
        .groupBy("doc_id", "n", "n_distinct")
        .agg(F.round(F.sum("t"), 4).alias("entropy"))
    )
    return ent.select(
        "doc_id", F.col("n").alias("n_chars"), "n_distinct", "entropy"
    )


HELDOUT_BACKOFF = 0.4  # stupid-backoff discount (Brants et al. 2007)
#: LM-cell cap for broadcasting the memoized score relations into the
#: position-stream probes (~40 B/cell → ~80 MB built); past it the
#: probes stay plain equi-joins and AQE dispatches. Probed over the
#: persisted memo at construction (one cached-scan count job).
_HELDOUT_LM_BROADCAST_MAX = 2_000_000


def _q_heldout_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram-LM scoring with stupid backoff (Brants et al.
    2007, "Large Language Models in Machine Translation"): the LM
    trains on HALF the corpus (doc_id % 2 = 0) and scores EVERY
    document, so held-out docs genuinely exercise the backoff path —
    score = ln(c(w₁w₂)/c(w₁)) when the bigram was seen in training,
    else ln(0.4·(c(w₂)+1)/(N+V)) (backoff to a Laplace-smoothed
    unigram). This is the methodologically-honest upgrade over
    q_unigram_logprob's self-trained LM: a doc can't inflate its own
    score, which is exactly what a quality gate wants.

    Scale shape (r11, guide §2.3/§5 — score with the MODEL, not the
    raw counts): the trained LM is memoized as ONE cell-sized score
    relation holding per train-BIGRAM lp = ln(cb/cu₁) rows and per
    train-UNIGRAM backoff lp = ln(0.4·(cu+1)/(N+V)) rows (the 1-row
    scalar folded in at build), so scoring probes the position
    stream with TWO broadcast hash joins (bigram hit, else w₂
    backoff, else the unseen-word constant). The previous form
    probed the stream THREE times (cb, cu₁, cu₂) plus a
    BroadcastNestedLoopJoin scalar attach, and re-aggregated the
    train half for all four build sides on every execution; the LM
    is the index here — train once, serve many — and the memo is
    bounded by train vocab, never corpus size. The ln() now
    evaluates once per LM cell, not once per position. The
    unseen-word constant embeds (N+V) as an integer literal probed
    from the memoized scalar row at construction (the
    consensus-dispatch pattern); the expression shape is unchanged
    so the double arithmetic is bit-identical on both engines. The
    bigram stream is built as (w1, w2) STRUCT pairs straight from
    the token array (earlier r11: no string concat + re-split per
    position). One doc-keyed agg ends it.

    Output: (doc_id, n_bigrams, avg_logp, in_train)."""
    from .dedup import _memo_persist

    base = _tokenized(spark, sf_dir)

    def bigram_pairs(t):
        m = F.size(t) - 1
        grams = F.zip_with(
            F.slice(t, 1, m),
            F.slice(t, 2, m),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        )
        return F.when(F.size(t) >= 2, grams).otherwise(
            F.array().cast("array<struct<w1:string,w2:string>>")
        )

    def build_lm() -> DataFrame:
        # one persisted relation, three row kinds: 'b' = bigram lp,
        # 'u' = unigram backoff lp, 's' = the (N+V) scalar — a single
        # bounded memo entry instead of three
        train = base.filter(F.col("doc_id") % 2 == 0)
        tuni = (
            train.select(F.explode("t").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cu"))
        )
        tbi = (
            train.select(F.explode(bigram_pairs(F.col("t"))).alias("p"))
            .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        scal = tuni.agg(
            F.sum("cu").alias("n_train"), F.count(F.lit(1)).alias("v_train")
        )
        null_w = F.lit(None).cast("string")
        bi = tbi.join(
            F.broadcast(tuni.select(F.col("w").alias("w1"), F.col("cu").alias("cu1"))),
            "w1",
        ).select(
            F.lit("b").alias("kind"),
            "w1",
            "w2",
            F.log(F.col("cb") / F.col("cu1")).alias("lp"),
        )
        bo = tuni.crossJoin(F.broadcast(scal)).select(
            F.lit("u").alias("kind"),
            null_w.alias("w1"),
            F.col("w").alias("w2"),
            F.log(
                F.lit(HELDOUT_BACKOFF)
                * (F.col("cu") + F.lit(1))
                / (F.col("n_train") + F.col("v_train"))
            ).alias("lp"),
        )
        nv = scal.select(
            F.lit("s").alias("kind"),
            null_w.alias("w1"),
            null_w.alias("w2"),
            (F.col("n_train") + F.col("v_train")).cast("double").alias("lp"),
        )
        return bi.unionByName(bo).unionByName(nv)

    lm = _memo_persist(spark, sf_dir, "heldout_lm", build_lm)
    n_plus_v = int(lm.filter(F.col("kind") == "s").first()["lp"])
    # size-dispatched broadcast (the _CONSENSUS_BROADCAST_MAX
    # pattern): the probe is a cached-scan count at construction; a
    # web-scale train vocab past the cap keeps the plain equi-join
    # and AQE's own strategy choice
    # STALENESS CONTRACT (ADVICE r11): size-dispatch probes the
    # materialized LM memo once at construction — static-corpus
    # contract; re-construct after any source mutation.
    bcast = F.broadcast if lm.count() <= _HELDOUT_LM_BROADCAST_MAX else (lambda d: d)
    bi_lm = lm.filter(F.col("kind") == "b").select(
        "w1", "w2", F.col("lp").alias("lp_b")
    )
    bo_lm = lm.filter(F.col("kind") == "u").select("w2", F.col("lp").alias("lp_bo"))
    pos = (
        base.select("doc_id", F.explode(bigram_pairs(F.col("t"))).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # identical expression shape to the backoff row build: 0.4 * long
    # / long in doubles, cu = 0 for a word absent from training
    unseen = F.log(
        F.lit(HELDOUT_BACKOFF) * (F.lit(0) + F.lit(1)) / F.lit(n_plus_v)
    )
    lp = F.coalesce(F.col("lp_b"), F.col("lp_bo"), unseen)
    return (
        pos.join(bcast(bi_lm), ["w1", "w2"], "left")
        .join(bcast(bo_lm), "w2", "left")
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("avg_logp"),
        )
        .withColumn("in_train", F.col("doc_id") % 2 == 0)
    )


CCNET_BUCKETS = 3  # head / middle / tail perplexity bands


def _doc_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_tokens, avg_logp) — the per-document unigram-LM
    quality score of q_unigram_logprob carried with the language
    column, shared by the CCNet bucketing below. Same shape: broadcast
    the word-histogram LM onto the exploded token stream, one
    doc-keyed partial aggregation; the corpus never shuffles."""
    words = _word_hist(spark, sf_dir)
    total = words.agg(F.sum("wc").alias("tot"))
    lp = words.crossJoin(F.broadcast(total)).select(
        "w", F.log(F.col("wc") / F.col("tot")).alias("lp")
    )
    base = _tokenized(spark, sf_dir, "lang")
    return (
        base.select("doc_id", "lang", F.explode("t").alias("w"))
        .join(F.broadcast(lp), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logp"),
        )
    )


def _q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank
    every document by its LM quality score WITHIN its language, cut
    each language into CCNET_BUCKETS equal bands (head = most
    probable under the LM, tail = least), and report each band's
    volume — the standard curation move that keeps the head, samples
    the middle, and drops/inspects the tail, per language so
    low-resource languages aren't graded on the English LM's curve.

    Scale shape: per-doc scores are one broadcast join + doc-keyed
    agg (shared with q_unigram_logprob via the memoized histogram and
    token projections). r7: the per-language ntile is computed as
    EXPLICIT ntile arithmetic over two-pass distributed row numbers
    (sampling.global_prefix_sums part=lang — the old per-lang ntile
    window ranked O(docs/|langs|) raw score rows in one task per
    language, the single-task-sort class the r6 verdict retired): with
    n docs in a language, q = n DIV B and r = n MOD B, ntile gives the
    first r buckets q+1 rows — bucket(rn) = ⌈rn/(q+1)⌉ in the large
    region, r + ⌈(rn − r(q+1))/q⌉ after — pure integer DIV, and the
    oracle keeps the engine's own ntile() so the hash PROVES the
    arithmetic reproduces it. Ranks order by the ROUNDED score with
    doc_id tiebreak so band edges are engine-stable.

    Output: (lang, bucket, n_docs, n_tokens, avg_logp)."""
    from .sampling import global_prefix_sums

    scored = _doc_lm_scores(spark, sf_dir)
    # r12 (VERDICT r11 item 5 pattern): per-language doc count rides
    # the rank machinery's own per-partition totals (group_totals)
    # instead of a SECOND aggregation pass over the scored relation +
    # its broadcast join — same n (sum of partial counts, exact longs)
    j = global_prefix_sums(
        scored.withColumn("one", F.lit(1)),
        [F.desc("avg_logp"), F.asc("doc_id")],
        {"rn0": "one"},
        part=("lang",),
        group_totals={"n": "rn0"},
    ).select("lang", "n_tokens", "avg_logp", (F.col("rn0") + 1).alias("rn"), "n")
    B = CCNET_BUCKETS
    bucket = F.expr(
        f"CAST(CASE WHEN rn <= (n % {B}) * (n DIV {B} + 1) "
        f"THEN (rn - 1) DIV (n DIV {B} + 1) + 1 "
        f"ELSE (n % {B}) + (rn - 1 - (n % {B}) * (n DIV {B} + 1)) DIV (n DIV {B}) + 1 "
        f"END AS INT)"
    )
    return (
        j.withColumn("bucket", bucket)
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("avg_logp"), 4).alias("avg_logp"),
        )
    )


KL_ALPHA = 0.5  # Laplace smoothing mass for the source LM


def _src_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (source, n_tokens, v_observed, kl) relation session-memoized
    (same lifecycle as the dedup shingle cache): q_source_divergence
    returns it directly and q_doremi_step references it THREE times
    (base shares, normalizer, final join) — without the persist each
    reference re-evaluates the whole KL subtree (measured 4.2 s →
    0.1 s steady at sf0.1 for the doremi step)."""
    from .dedup import _memo_persist

    return _memo_persist(
        spark, sf_dir, "src_divergence", lambda: _src_divergence_build(spark, sf_dir)
    )


def _q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _src_divergence(spark, sf_dir)


def _src_divergence_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram LM — the
    source-distinctiveness measurement behind mixture reweighting: a
    source whose token distribution sits far from the pool (high KL)
    contributes novel text (or noise — pair with the quality gates);
    near-zero KL means the source is redundant with the pool. The
    source LM is Laplace-smoothed over the CORPUS vocabulary so KL is
    finite: p_s(w) = (c_sw + α) / (n_s + α·V).

    Scale shape: the smoothed sum over the FULL vocabulary is split
    into an observed part (one (source, word)-cell aggregation joined
    to the corpus histogram on the word key — count cells in the
    shuffle, never documents) and a closed-form unobserved remainder:
    Σ_unobs p0·(ln p0 − ln p_c(w)) = p0·((V−V_s)·ln p0 − (L_tot −
    L_obs_s)) where L_tot = Σ_V ln p_c(w) is ONE corpus scalar and
    L_obs_s re-uses the per-source join — no V×S matrix is ever
    materialized, which is what keeps a Heaps-law vocabulary at
    100 TB out of the plan.

    Output: (source, n_tokens, v_observed, kl)."""
    words = _word_hist(spark, sf_dir)
    tot = words.agg(
        F.sum("wc").alias("tot"),
        F.count(F.lit(1)).alias("v"),
    )
    pc = (
        words.crossJoin(F.broadcast(tot))
        .select("w", F.log(F.col("wc") / F.col("tot")).alias("ln_pc"))
    )
    ltot = pc.agg(F.sum("ln_pc").alias("l_tot"))
    sw = (
        _tokenized(spark, sf_dir, "source")
        .select("source", F.explode("t").alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(pc, "w")
    )
    alpha = F.lit(KL_ALPHA)
    per_src = sw.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("v_observed"),
        F.sum(F.col("ln_pc")).alias("l_obs"),
    )
    scal = F.broadcast(tot.crossJoin(ltot))
    d_s = F.col("n_tokens") + alpha * F.col("v")
    ln_p0 = F.log(alpha / d_s)
    obs = (
        sw.select(
            "source",
            "c",
            "ln_pc",
            ((F.col("c") + alpha)).alias("ca"),
        )
        .join(per_src.select("source", "n_tokens"), "source")
        .crossJoin(scal.select("v"))
        .select(
            "source",
            (
                (F.col("ca") / (F.col("n_tokens") + alpha * F.col("v")))
                * (
                    F.log(F.col("ca") / (F.col("n_tokens") + alpha * F.col("v")))
                    - F.col("ln_pc")
                )
            ).alias("term"),
        )
        .groupBy("source")
        .agg(F.sum("term").alias("kl_obs"))
    )
    return (
        per_src.crossJoin(scal)
        .join(obs, "source")
        .select(
            "source",
            "n_tokens",
            "v_observed",
            F.round(
                F.col("kl_obs")
                + (alpha / d_s)
                * (
                    (F.col("v") - F.col("v_observed")) * ln_p0
                    - (F.col("l_tot") - F.col("l_obs"))
                ),
                4,
            ).alias("kl"),
        )
    )


def _q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit per source through the learned BPE
    vocabulary: subword pieces per word (fertility) and characters
    per piece — the tokenizer-efficiency numbers that decide whether
    a vocabulary fits a corpus (a source with fertility ≫ corpus mean
    is paying more sequence length per word, i.e. the vocabulary
    under-serves it — the multilingual-tokenizer-tax measurement).

    Scale shape: identical to q_doc_tokenize's — the piece map is
    O(|vocab|) rows broadcast onto the exploded token stream, then
    ONE source-keyed aggregation; character counts ride the same
    pass. Output: (source, n_words, n_subwords, fertility,
    chars_per_piece)."""
    cur = _bpe_vocab_cached(spark, sf_dir)
    np_ = F.size(F.filter(F.split("s", "\\|"), lambda x: x != ""))
    piece_map = cur.select("w", np_.alias("np"))
    words = _tokenized(spark, sf_dir, "source").select(
        "source", F.explode("t").alias("w")
    )
    return (
        words.join(F.broadcast(piece_map), "w")
        .withColumn("chars", F.length("w"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("np").alias("n_subwords"),
            F.round(F.sum("np") / F.count(F.lit(1)), 4).alias("fertility"),
            F.round(F.sum("chars") / F.sum("np"), 4).alias("chars_per_piece"),
        )
    )


def _q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity audit per source: distinct-n (Li et al. 2016
    "A Diversity-Promoting Objective Function for Neural Conversation
    Models") for n ∈ {1,2,3} — distinct n-grams over total n-gram
    positions. The degeneration detector for generated/boilerplate
    text: template farms and model-generated spam have distinct-2/3
    far below organic prose, so a source whose ratio collapses is the
    first candidate for the dedup/quality gates upstream of training.

    Scale shape: ONE explode pass partially aggregated to
    (source, n, gram-hash) count cells — inverted-index cost, the
    corpus itself never shuffles, and grams travel as 60-bit hashes
    (the dedup.py shingle economy: 8 bytes per cell key instead of a
    raw trigram string) — then a tiny (source, n) rollup where
    distinct = cell count and total = Σcount. r11 (guide §2.3): the
    three n-gram streams are concatenated as (n, g) structs IN-ROW
    and exploded by one Generate — the old per-n union scanned the
    cached token projection three times for the same generated rows.
    Output long-form:
    (source, n, distinct_ngrams, total_ngrams, distinct_ratio)."""
    from ..functions.textfns import shingle_seq

    base = _tokenized(spark, sf_dir, "source")

    def tagged(n: int):
        seq = F.col("t") if n == 1 else shingle_seq(F.col("t"), n)
        return F.transform(
            seq,
            lambda x: F.struct(
                F.lit(n).alias("n"), hash60(x).alias("g")
            ),
        )

    ex = base.select(
        "source",
        F.explode(F.concat(tagged(1), tagged(2), tagged(3))).alias("p"),
    ).select("source", F.col("p.n").alias("n"), F.col("p.g").alias("g"))
    cells = ex.groupBy("source", "n", "g").agg(F.count(F.lit(1)).alias("c"))
    return cells.groupBy("source", "n").agg(
        F.count(F.lit(1)).alias("distinct_ngrams"),
        F.sum("c").alias("total_ngrams"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("distinct_ratio"),
    )


DOREMI_ETA = 0.5  # exponentiated-gradient step size


def _q_doremi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style mixture-reweighting step (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining" — the exponentiated-gradient domain-weight update,
    instantiated with the unigram excess loss): starting from each
    source's token share as the base mixture, up-weight sources whose
    text the pooled model represents worst — here the per-source KL
    from the corpus unigram LM (q_source_divergence), the unigram
    form of DoReMi's proxy-vs-reference excess loss —
    w_s ∝ base_s · exp(η · excess_s), renormalized. Sources redundant
    with the pool (KL ≈ 0) keep their base share; distinctive sources
    gain mass. Iterating this to convergence is the full algorithm;
    ONE step is the auditable, oracle-checkable unit.

    Scale shape: everything rides q_source_divergence's count-cell
    plan (the corpus never shuffles); the |sources|-row excess-loss
    relation is session-memoized (the update references it THREE
    times — base shares, normalizer, final join — and without the
    persist each reference re-evaluates the whole KL subtree:
    measured 4.2 s → 0.1 s steady at sf0.1). r11 (guide §1.2 job
    orchestration): the token total and the normalizer Z are GLOBAL
    WINDOW sums over the |sources|-row cached relation instead of two
    scalar aggregate + broadcast attachments — the old form ran three
    sequential driver jobs (build tot, build z, final) per execution
    and the whole query is launch-bound at that size; the window form
    is ONE job over one SinglePartition exchange of ≤|sources| rows
    (whitelisted: the input is the memoized per-source relation,
    never the corpus). A/B steady at sf0.1: 0.69-0.81 → 0.24-0.25 s,
    results identical. Excess losses enter the update ROUNDED (both
    engines see identical inputs, so the exp/normalize chain agrees
    to well under the output rounding).

    Output: (source, base_share, excess_loss, weight)."""
    from pyspark.sql import Window

    kl = _src_divergence(spark, sf_dir)
    w = Window.partitionBy()
    upd = kl.select(
        "source",
        F.col("kl").alias("excess_loss"),
        (F.col("n_tokens") / F.sum("n_tokens").over(w)).alias("bs"),
        (
            (F.col("n_tokens") / F.sum("n_tokens").over(w))
            * F.exp(F.lit(DOREMI_ETA) * F.col("kl"))
        ).alias("unnorm"),
    )
    return upd.select(
        "source",
        F.round("bs", 6).alias("base_share"),
        "excess_loss",
        F.round(F.col("unnorm") / F.sum("unnorm").over(w), 6).alias("weight"),
    )


PHRASE = ("table", "scan")  # the exact-adjacency phrase under query


def _q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-posting-list phrase query — the inverted-index
    primitive behind exact-phrase search ("table scan", adjacency
    required): tokenize, keep only the two query terms' postings
    (doc_id, position), and verify adjacency with an equi-join on
    (doc_id, next_position). Per source: documents containing the
    phrase and total occurrences. Bigrams of two DISTINCT words
    cannot overlap, so join-counted occurrences equal a non-
    overlapping regex scan — the oracle-independence check.

    Scale shape: the posexplode is map-side and the term filter
    collapses it IMMEDIATELY — only the two terms' posting rows
    (corpus frequency of 'table' + 'scan', a vanishing fraction of
    token volume) survive to the one (doc_id, pos)-keyed shuffle; the
    source rollup then moves per-source cells. This is exactly how a
    search engine executes phrases over a positional index at scale —
    intersect the shortest posting lists, never rescan documents. A
    pre-materialized postings table (the q_text_tf family) would make
    repeated phrase queries index-only.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (text-analysis / retrieval
    family)."""
    w1, w2 = PHRASE
    ex = (
        _tokenized(spark, sf_dir, "source")
        .select("doc_id", "source", F.posexplode("t").alias("pos", "w"))
        .filter(F.col("w").isin(w1, w2))
    )
    p1 = ex.filter(F.col("w") == w1).select("doc_id", "source", "pos")
    p2 = ex.filter(F.col("w") == w2).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        p1.join(p2, ["doc_id", "pos"])
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .transform(cells_sorted, "source")  # <= |sources| rows
    )


def phrase_doc_counts(docs: DataFrame) -> DataFrame:
    """Map-only per-document occurrence counts of PHRASE — the scan
    form of the phrase query (count adjacent bigram hits inside each
    doc's token array; no index, no shuffle), vs q_phrase_search's
    index form (posting-list join). The two are the classic
    scan-vs-index duality: the streaming ingest gate rides the
    arriving batch's scan, the batch query demonstrates the
    posting-list intersection an indexed corpus would use. A doc's
    count depends only on that doc, so the relation is batch-split
    invariant by construction. Docs without the phrase are dropped
    (the gate emits hits only)."""
    w1, w2 = PHRASE
    target = F.lit(f"{w1} {w2}")
    base = docs.select("doc_id", "source", tokens(F.col("text")).alias("t"))
    n = F.size(F.filter(shingle_seq(F.col("t"), 2), lambda g: g == target))
    return base.select("doc_id", "source", n.alias("n_occurrences")).filter(
        F.col("n_occurrences") > 0
    )


TEXTRANK_ITERS = 4
TEXTRANK_D = 0.85
TEXTRANK_TOPK = 15


def _q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank over the word co-occurrence graph — an edge per ADJACENT
    word pair (both directions, weight = corpus bigram count,
    self-loops dropped), TEXTRANK_ITERS power steps at damping
    TEXTRANK_D, top-TEXTRANK_TOPK words by final rank. Complements
    the frequency/lift keyword surfaces (TF-IDF, cluster topics):
    TextRank scores a word by the rank of its NEIGHBORS, surfacing
    connective vocabulary frequency alone under-ranks.

    Scale shape: the graph collapses to (word, word) weight cells in
    one partial-agg exchange (corpus never re-shuffles); each
    iteration is one edge-keyed join + one dst-keyed agg over
    O(vocab) cells with per-iteration 9-dp rounding (the
    q_dedup_pagerank float contract) and a localCheckpoint lineage
    cut; the top-k is TakeOrdered on (pr DESC, word) — no global
    window, no rank column needed (the driver compares row SETS).

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (text-analysis family)."""
    from .dedup import _memo_persist

    t = F.col("t")
    m = F.size(t) - 1
    pairs = (
        _tokenized(spark, sf_dir, "source")
        .filter(F.size("t") >= 2)
        .select(
            F.explode(F.arrays_zip(F.slice(t, 1, m), F.slice(t, 2, m))).alias("bg")
        )
        .select(F.col("bg.0").alias("a"), F.col("bg.1").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    edges = _memo_persist(
        spark,
        sf_dir,
        "textrank_edges",
        lambda: pairs.unionByName(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("wt")),
    )
    outw = _memo_persist(
        spark,
        sf_dir,
        "textrank_outw",
        lambda: edges.groupBy("a").agg(F.sum("wt").alias("ow")),
    )
    n_rel = outw.agg(F.count(F.lit(1)).alias("n"))
    r = outw.crossJoin(F.broadcast(n_rel)).select(
        "a", (F.lit(1.0) / F.col("n")).alias("pr"), "ow", "n"
    )
    for _ in range(TEXTRANK_ITERS):
        contrib = (
            edges.join(
                r.select("a", (F.col("pr") / F.col("ow")).alias("c")), "a"
            )
            .groupBy("b")
            .agg(F.round(F.sum(F.col("wt") * F.col("c")), 9).alias("s"))
            .withColumnRenamed("b", "a")
            .coalesce(1)  # O(vocab) cells: stay single-partition
        )
        r = (
            outw.join(contrib, "a", "left")
            .crossJoin(F.broadcast(n_rel))
            .select(
                "a",
                (
                    F.lit(1.0 - TEXTRANK_D) / F.col("n")
                    + F.lit(TEXTRANK_D) * F.coalesce("s", F.lit(0.0))
                ).alias("pr"),
                "ow",
                "n",
            )
            .localCheckpoint()
        )
    return (
        r.select(
            F.col("a").alias("word"),
            F.col("ow").alias("out_weight"),
            F.round("pr", 6).alias("textrank"),
        )
        .orderBy(F.desc("textrank"), F.asc("word"))
        .limit(TEXTRANK_TOPK)
    )


PROX_TERMS = ("window", "sort")  # the within-k proximity pair under query
PROX_WINDOW = 5  # max |pos1 - pos2| — 169/500 docs qualify at sf0.01


def _q_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity query over the positional posting lists — the IR
    operator between exact phrase (adjacency) and bag-of-words (BM25):
    docs where PROX_TERMS co-occur within PROX_WINDOW token positions,
    in either order. Per qualifying doc: pair count and the minimum
    distance (the standard proximity-boost feature a ranker consumes).

    Scale shape: same skeleton as q_phrase_search — the posexplode
    collapses AT the two-term filter, so only the terms' posting rows
    survive to the one doc_id-keyed join; the distance predicate is a
    filter over per-doc posting pairs, which are bounded by document
    length² (a document-local bound, not a corpus bound — exactly why
    search engines evaluate proximity on the intersected postings,
    never by rescanning text). Position base differs across engines
    (posexplode 0-based, generate_subscripts 1-based) and cancels in
    the |p1−p2| difference.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (text-analysis / retrieval
    family)."""
    w1, w2 = PROX_TERMS
    ex = (
        _tokenized(spark, sf_dir, "source")
        .select("doc_id", "source", F.posexplode("t").alias("pos", "w"))
        .filter(F.col("w").isin(w1, w2))
    )
    p1 = ex.filter(F.col("w") == w1).select("doc_id", "source", F.col("pos").alias("pa"))
    p2 = ex.filter(F.col("w") == w2).select("doc_id", F.col("pos").alias("pb"))
    d = F.abs(F.col("pa") - F.col("pb"))
    return (
        p1.join(p2, "doc_id")
        .filter(d <= PROX_WINDOW)
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(d).alias("min_dist"),
        )
    )


#: Gopher-style repetition gates (Rae et al. 2021 "Scaling Language
#: Models", Table A1), token-basis adaptation: the published rules cut
#: on the character fraction inside (a) occurrences of the single most
#: frequent 2-gram and (b) duplicated n-grams; this corpus has no
#: newlines (line/paragraph rules are vacuous here) and whitespace
#: tokenization is the engine's portable unit, so both rules measure
#: TOKEN-POSITION coverage — the union of [p, p+n) over the qualifying
#: occurrences, never double-counting overlaps. Thresholds tuned so
#: both rules fire on the fixture (18 + 4 drops at sf0.01).
REP_TOP2_MAX = 0.18
REP_DUP3_MAX = 0.10


def _q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc intra-document repetition gates — the Gopher rule family
    that catches boilerplate/loop spam n-gram dedup can't (it compares
    ACROSS documents; these fire WITHIN one):

    * ``top2_frac`` — fraction of token positions covered by
      occurrences of the doc's most frequent 2-gram (ties broken to
      the lexicographically smallest gram — deterministic cross-engine
      on the ASCII token alphabet);
    * ``dup3_frac`` — fraction of token positions covered by any
      3-gram occurring at least twice in the doc;
    * ``keep`` = both under their thresholds.

    Coverage is the UNION of the occurrence spans (distinct positions),
    not a sum — overlapping repeats don't double-count, so both
    fractions are exact in [0, 1] and the int/int divisions are
    bit-identical across engines.

    Complements q_quality_repetition (curation.py), the SOURCE-level
    monitoring profile built on cheaper proxies (token dominance,
    1 − distinct/total bigrams): this is the DOC-level keep/drop gate
    on positional occurrence coverage — the quantity the published
    rules actually cut on, which the distinct-ratio proxy under-counts
    whenever a repeated gram clusters (aaa b aaa has the same distinct
    ratio as a a b a a but twice the covered span).

    Scale shape: two posexplodes over the positional gram sequence
    (the posting shape every dedup variant already pays); shuffles
    carry (doc_id, gram) cells, text never re-shuffles; coverage
    re-aggregates per doc_id. The 100×-length skew doc contributes
    O(length) gram rows — the same bound as the shingle pass.

    Reference connection: none in dhoard/orders-kafka-streams;
    SURVEY §2.9 extension surface (text-analysis / quality family)."""
    base = (
        _tokenized(spark, sf_dir)
        .select("doc_id", "t", F.size("t").alias("n"))
        .filter(F.col("n") >= 3)
    )
    return repetition_metrics(base)


def repetition_metrics(base: DataFrame) -> DataFrame:
    """The repetition gates over any (doc_id, t, n>=3) relation —
    shared by the batch query and the streaming ingest twin (which
    tokenizes arriving micro-batches with the same expressions; the
    metrics are per-doc functions, so batch and stream verdicts are
    identical by construction)."""
    bi = base.select(
        "doc_id", "n", F.posexplode(shingle_seq(F.col("t"), 2)).alias("p", "g")
    )
    bic = bi.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    topc = bic.groupBy("doc_id").agg(F.max("c").alias("mc"))
    topg = (
        bic.join(topc, "doc_id")
        .filter(F.col("c") == F.col("mc"))
        .groupBy("doc_id")
        .agg(F.min("g").alias("g"), F.max("c").alias("top_count"))
    )
    # the rule measures REPETITION: a top bigram occurring once covers
    # 2/n of any doc (0.2 of a 10-token one — the fixture's minimum)
    # without any repeat, so coverage only counts when top_count >= 2
    tcov = (
        bi.join(topg.filter(F.col("top_count") >= 2), ["doc_id", "g"])
        .select("doc_id", F.explode(F.array(F.col("p"), F.col("p") + 1)).alias("u"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tcov"))
    )
    g3 = base.select(
        "doc_id", F.posexplode(shingle_seq(F.col("t"), 3)).alias("p", "g")
    )
    dup = g3.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") >= 2
    )
    dcov = (
        g3.join(dup.select("doc_id", "g"), ["doc_id", "g"], "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.array(F.col("p"), F.col("p") + 1, F.col("p") + 2)
            ).alias("u"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dcov"))
    )
    top2 = F.round(F.coalesce(F.col("tcov"), F.lit(0)) / F.col("n"), 6)
    dup3 = F.round(F.coalesce(F.col("dcov"), F.lit(0)) / F.col("n"), 6)
    return (
        base.select("doc_id", "n")
        .join(topg.select("doc_id", F.col("g").alias("top_bigram"), "top_count"), "doc_id")
        .join(tcov, "doc_id", "left")
        .join(dcov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "top_bigram",
            "top_count",
            top2.alias("top2_frac"),
            dup3.alias("dup3_frac"),
            ((top2 < REP_TOP2_MAX) & (dup3 < REP_DUP3_MAX)).alias("keep"),
        )
    )


QUERIES = {
    "q_phrase_search": _q_phrase_search,
    "q_proximity_search": _q_proximity_search,
    "q_textrank_keywords": _q_textrank_keywords,
    "q_distinct_ngrams": _q_distinct_ngrams,
    "q_doremi_step": _q_doremi_step,
    "q_pmi_bigrams": _q_pmi_bigrams,
    "q_memorization_ngrams": _q_memorization_ngrams,
    "q_bm25": _q_bm25,
    "q_unigram_logprob": _q_unigram_logprob,
    "q_bpe_train": _q_bpe_train,
    "q_bpe_encode": _q_bpe_encode,
    "q_doc_tokenize": _q_doc_tokenize,
    "q_vocab_coverage": _q_vocab_coverage,
    "q_good_turing": _q_good_turing,
    "q_zipf_fit": _q_zipf_fit,
    "q_text_tokens": _q_text_tokens,
    "q_tfidf": _q_tfidf,
    "q_text_quality": _q_text_quality,
    "q_text_langid": _q_text_langid,
    "q_text_tf": _q_text_tf,
    "q_doc_stats": _q_doc_stats,
    "q_text_fingerprint": _q_text_fingerprint,
    "q_text_winnow": _q_text_winnow,
    "q_winnow_match": _q_winnow_match,
    "q_text_bpe": _q_text_bpe,
    "q_langid_ngram": _q_langid_ngram,
    "q_ccnet_buckets": _q_ccnet_buckets,
    "q_source_divergence": _q_source_divergence,
    "q_tokenizer_fertility": _q_tokenizer_fertility,
    "q_heldout_bigram": _q_heldout_bigram,
    "q_char_entropy": _q_char_entropy,
    "q_repetition_filter": _q_repetition_filter,
}

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)

#: the source-divergence relation factored into composable CTE +
#: final-select parts so q_doremi_step's oracle consumes the SAME kl
#: definition instead of duplicating it
_SRC_DIV_CTES = f"""toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
hist AS (SELECT w, count(1) AS wc FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
scal AS (SELECT CAST(sum(wc) AS BIGINT) AS tot, CAST(count(1) AS BIGINT) AS v FROM hist),
pc AS (SELECT w, ln(wc / (SELECT tot FROM scal)) AS ln_pc FROM hist),
lt AS (SELECT sum(ln_pc) AS l_tot FROM pc),
sw AS (
  SELECT source, w, count(1) AS c
  FROM (SELECT source, unnest(t) AS w FROM toks) GROUP BY source, w
),
swp AS (SELECT s.source, s.c, p.ln_pc FROM sw s JOIN pc p USING (w)),
per_src AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(1) AS BIGINT) AS v_observed, sum(ln_pc) AS l_obs
  FROM swp GROUP BY source
),
obs AS (
  SELECT sp.source,
         sum(((sp.c + {KL_ALPHA}) / (ps.n_tokens + {KL_ALPHA} * (SELECT v FROM scal)))
             * (ln((sp.c + {KL_ALPHA}) / (ps.n_tokens + {KL_ALPHA} * (SELECT v FROM scal)))
                - sp.ln_pc)) AS kl_obs
  FROM swp sp JOIN per_src ps USING (source)
  GROUP BY sp.source
)"""

_SRC_DIV_SELECT = f"""SELECT ps.source, ps.n_tokens, ps.v_observed,
       round(o.kl_obs
             + ({KL_ALPHA} / (ps.n_tokens + {KL_ALPHA} * sc.v))
               * ((sc.v - ps.v_observed) * ln({KL_ALPHA} / (ps.n_tokens + {KL_ALPHA} * sc.v))
                  - (lt.l_tot - ps.l_obs)), 4) AS kl
FROM per_src ps CROSS JOIN scal sc CROSS JOIN lt lt JOIN obs o USING (source)"""


def _phrase_search_oracle() -> str:
    """Regex formulation over the raw text — a genuinely DIFFERENT
    algorithm (no tokenization, no join) that must agree with the
    positional-index join because the corpus is single-space
    separated and the phrase's two words differ (so non-overlapping
    regex matches = all adjacency pairs)."""
    w1, w2 = PHRASE
    rx = rf"\b{w1} {w2}\b"
    return f"""
SELECT source,
       CAST(count(DISTINCT CASE WHEN n > 0 THEN doc_id END) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_occurrences
FROM (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '{rx}')) AS n
  FROM documents
)
GROUP BY source HAVING sum(n) > 0
ORDER BY source
"""


def _textrank_oracle() -> str:
    """Unrolled weighted power iteration mirroring the Spark loop
    (per-iteration 9-dp rounding — the q_dedup_pagerank contract);
    the final ORDER BY uses the ROUNDED rank so the top-k boundary is
    the order both engines actually computed."""
    steps = []
    prev = "r0"
    for it in range(1, TEXTRANK_ITERS + 1):
        steps.append(
            f"""c{it} AS (
  SELECT e.b AS a, round(sum(e.wt * (r.pr / r.ow)), 9) AS s
  FROM edges e JOIN {prev} r ON e.a = r.a GROUP BY e.b
),
r{it} AS (
  SELECT d.a, (1 - CAST({TEXTRANK_D} AS DOUBLE)) / nr.n
         + CAST({TEXTRANK_D} AS DOUBLE) * coalesce(c.s, CAST(0 AS DOUBLE)) AS pr,
         d.ow
  FROM outw d CROSS JOIN nr LEFT JOIN c{it} c ON d.a = c.a
)"""
        )
        prev = f"r{it}"
    body = ",\n".join(steps)
    return f"""
WITH toks AS (SELECT {_TOKS} AS w FROM documents),
bg AS (
  SELECT unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS z
  FROM toks WHERE len(w) >= 2
),
p AS (SELECT z[1] AS a, z[2] AS b FROM bg WHERE z[1] <> z[2]),
edges AS (
  SELECT a, b, CAST(count(1) AS BIGINT) AS wt
  FROM (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p)
  GROUP BY a, b
),
outw AS (SELECT a, CAST(sum(wt) AS BIGINT) AS ow FROM edges GROUP BY a),
nr AS (SELECT CAST(count(1) AS BIGINT) AS n FROM outw),
r0 AS (SELECT d.a, CAST(1.0 AS DOUBLE) / nr.n AS pr, d.ow FROM outw d CROSS JOIN nr),
{body}
SELECT a AS word, ow AS out_weight, round(pr, 6) AS textrank
FROM r{TEXTRANK_ITERS}
ORDER BY round(pr, 6) DESC, a LIMIT {TEXTRANK_TOPK}
"""


ORACLE = {
    "q_phrase_search": _phrase_search_oracle(),
    "q_textrank_keywords": _textrank_oracle(),
    # position bases differ (0- vs 1-based) and cancel in |pa - pb|
    "q_proximity_search": f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
px AS (SELECT doc_id, source, unnest(t) AS w, generate_subscripts(t, 1) AS pos FROM toks),
p1 AS (SELECT doc_id, source, pos AS pa FROM px WHERE w = '{PROX_TERMS[0]}'),
p2 AS (SELECT doc_id, pos AS pb FROM px WHERE w = '{PROX_TERMS[1]}'),
pairs AS (
  SELECT p1.doc_id, p1.source, abs(pa - pb) AS d
  FROM p1 JOIN p2 USING (doc_id)
  WHERE abs(pa - pb) <= {PROX_WINDOW}
)
SELECT doc_id, source, CAST(count(1) AS BIGINT) AS n_pairs,
       CAST(min(d) AS INTEGER) AS min_dist
FROM pairs GROUP BY doc_id, source
""",
    "q_distinct_ngrams": f"""
WITH toks AS (SELECT source, {_TOKS} AS w FROM documents),
ex AS (
  SELECT source, CAST(1 AS INTEGER) AS n,
         unnest(list_transform(w, s -> {hash60_sql('s')})) AS g FROM toks
  UNION ALL
  SELECT source, CAST(2 AS INTEGER) AS n,
         unnest(list_transform({shingle_seq_sql('w', 2)}, s -> {hash60_sql('s')})) AS g FROM toks
  UNION ALL
  SELECT source, CAST(3 AS INTEGER) AS n,
         unnest(list_transform({shingle_seq_sql('w', 3)}, s -> {hash60_sql('s')})) AS g FROM toks
),
cells AS (SELECT source, n, g, count(1) AS c FROM ex GROUP BY source, n, g)
SELECT source, n, CAST(count(1) AS BIGINT) AS distinct_ngrams,
       CAST(sum(c) AS BIGINT) AS total_ngrams,
       round(count(1) / CAST(sum(c) AS DOUBLE), 6) AS distinct_ratio
FROM cells GROUP BY source, n
""",
    "q_memorization_ngrams": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
ex AS (
  SELECT doc_id, {hash60_sql('g')} AS g FROM (
    SELECT doc_id, unnest({_SEQ8}) AS g FROM toks
  )
)
SELECT g AS gram_hash,
       CAST(count(1) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM ex GROUP BY g HAVING count(1) > 1
ORDER BY n_occurrences DESC, n_docs DESC, gram_hash ASC
LIMIT {MEM_TOP_K}
""",
    "q_pmi_bigrams": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
uni AS (
  SELECT w, CAST(count(1) AS BIGINT) AS cw
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
),
bi AS (
  SELECT bg, CAST(count(1) AS BIGINT) AS cab
  FROM (SELECT unnest({shingle_seq_sql('t', 2)}) AS bg FROM toks)
  GROUP BY bg HAVING count(1) >= {PMI_MIN_COUNT}
),
bis AS (
  SELECT string_split(bg, ' ')[1] AS a, string_split(bg, ' ')[2] AS b, cab FROM bi
),
tot AS (
  SELECT CAST(sum(len(t)) AS BIGINT) AS n_uni,
         CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS n_bi
  FROM toks
)
SELECT a, b, cab,
       round(ln((cab / CAST(n_bi AS DOUBLE))
                / ((ca / CAST(n_uni AS DOUBLE)) * (cb / CAST(n_uni AS DOUBLE)))), 4) AS pmi
FROM bis
JOIN (SELECT w AS a, cw AS ca FROM uni) USING (a)
JOIN (SELECT w AS b, cw AS cb FROM uni) USING (b)
CROSS JOIN tot
ORDER BY pmi DESC, a ASC, b ASC
LIMIT {PMI_TOP_K}
""",
    "q_bm25": _bm25_oracle(),
    "q_unigram_logprob": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
ex AS (SELECT doc_id, unnest(w) AS w FROM toks),
hist AS (SELECT w, count(1) AS wc FROM ex GROUP BY w),
tot AS (SELECT CAST(sum(wc) AS BIGINT) AS tot FROM hist),
lp AS (SELECT w, ln(wc / (SELECT tot FROM tot)) AS lp FROM hist)
SELECT e.doc_id,
       CAST(count(1) AS BIGINT) AS n_tokens,
       round(avg(l.lp), 4) AS avg_logp
FROM ex e JOIN lp l USING (w)
GROUP BY e.doc_id
""",
    "q_bpe_train": _bpe_oracle(),
    "q_bpe_encode": _bpe_encode_oracle(),
    "q_doc_tokenize": _doc_tokenize_oracle(),
    "q_vocab_coverage": f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
ex AS (SELECT source, unnest(t) AS w FROM toks),
hist AS (SELECT w, count(1) AS wc FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
vocab AS (
  SELECT w, 1 AS in_v
  FROM (SELECT w, row_number() OVER (ORDER BY wc DESC, w) AS r FROM hist)
  WHERE r <= {VOCAB_TOP_V}
)
SELECT source,
       CAST(count(1) AS BIGINT) AS n_tokens,
       CAST(sum(coalesce(in_v, 0)) AS BIGINT) AS n_covered,
       CAST(count(DISTINCT CASE WHEN in_v IS NULL THEN ex.w END) AS BIGINT) AS n_oov_types,
       round(CAST(sum(coalesce(in_v, 0)) AS DOUBLE) / count(1), 6) AS coverage
FROM ex LEFT JOIN vocab ON ex.w = vocab.w
GROUP BY source
""",
    "q_char_entropy": """
WITH chars AS (
  SELECT doc_id, unnest(list_transform(range(1, 1 + length(lower(text))),
                                       i -> lower(text)[i:i])) AS ch
  FROM documents
),
cells AS (SELECT doc_id, ch, count(1) AS c FROM chars GROUP BY doc_id, ch),
tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, CAST(count(1) AS BIGINT) AS n_distinct
  FROM cells GROUP BY doc_id
)
SELECT t.doc_id, t.n AS n_chars, t.n_distinct,
       round(sum(-(ce.c / t.n) * ln(ce.c / t.n)), 4) AS entropy
FROM cells ce JOIN tot t USING (doc_id)
GROUP BY t.doc_id, t.n, t.n_distinct
""",
    "q_heldout_bigram": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
tr AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
tuni AS (SELECT w, count(1) AS cu FROM (SELECT unnest(t) AS w FROM tr) GROUP BY w),
tbi AS (SELECT bg, count(1) AS cb
        FROM (SELECT unnest({shingle_seq_sql('t', 2)}) AS bg FROM tr) GROUP BY bg),
scal AS (SELECT CAST(sum(cu) AS BIGINT) AS n_train,
                CAST(count(1) AS BIGINT) AS v_train FROM tuni),
pos AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
  FROM (SELECT doc_id, unnest({shingle_seq_sql('t', 2)}) AS bg FROM toks)
),
sc AS (
  SELECT p.doc_id,
         CASE WHEN tb.cb IS NOT NULL THEN ln(tb.cb / u1.cu)
              ELSE ln({HELDOUT_BACKOFF} * (coalesce(u2.cu, 0) + 1)
                      / (s.n_train + s.v_train))
         END AS lp
  FROM pos p
  LEFT JOIN tbi tb USING (bg)
  LEFT JOIN tuni u1 ON p.w1 = u1.w
  LEFT JOIN tuni u2 ON p.w2 = u2.w
  CROSS JOIN scal s
)
SELECT doc_id, CAST(count(1) AS BIGINT) AS n_bigrams,
       round(avg(lp), 4) AS avg_logp,
       (doc_id % 2 = 0) AS in_train
FROM sc GROUP BY doc_id
""",
    "q_ccnet_buckets": f"""
WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
ex AS (SELECT doc_id, lang, unnest(t) AS w FROM toks),
hist AS (SELECT w, count(1) AS wc FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
tot AS (SELECT CAST(sum(wc) AS BIGINT) AS tot FROM hist),
lp AS (SELECT w, ln(wc / (SELECT tot FROM tot)) AS lp FROM hist),
scored AS (
  SELECT e.doc_id, e.lang, CAST(count(1) AS BIGINT) AS n_tokens,
         round(avg(l.lp), 6) AS avg_logp
  FROM ex e JOIN lp l USING (w) GROUP BY e.doc_id, e.lang
),
b AS (
  SELECT lang, n_tokens, avg_logp,
         CAST(ntile({CCNET_BUCKETS}) OVER (
           PARTITION BY lang ORDER BY avg_logp DESC, doc_id ASC) AS INTEGER) AS bucket
  FROM scored
)
SELECT lang, bucket, CAST(count(1) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(avg(avg_logp), 4) AS avg_logp
FROM b GROUP BY lang, bucket
""",
    "q_source_divergence": f"WITH {_SRC_DIV_CTES}\n{_SRC_DIV_SELECT}",
    "q_doremi_step": f"""WITH {_SRC_DIV_CTES},
kl AS ({_SRC_DIV_SELECT}),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens FROM kl),
u AS (
  SELECT source, kl AS excess_loss,
         n_tokens / CAST(corpus_tokens AS DOUBLE) AS bs,
         (n_tokens / CAST(corpus_tokens AS DOUBLE)) * exp({DOREMI_ETA} * kl) AS unnorm
  FROM kl CROSS JOIN tot
),
z AS (SELECT sum(unnorm) AS z FROM u)
SELECT source, round(bs, 6) AS base_share, excess_loss,
       round(unnorm / z, 6) AS weight
FROM u CROSS JOIN z
""",
    "q_tokenizer_fertility": _bpe_oracle(
        f"""
SELECT d.source,
       CAST(count(1) AS BIGINT) AS n_words,
       CAST(sum(m.np) AS BIGINT) AS n_subwords,
       round(sum(m.np) / CAST(count(1) AS DOUBLE), 4) AS fertility,
       round(sum(m.chars) / CAST(sum(m.np) AS DOUBLE), 4) AS chars_per_piece
FROM (SELECT source, unnest({_TOKS}) AS w FROM documents) d
JOIN (SELECT w, len(list_filter(string_split(s, '|'), x -> x <> '')) AS np,
             length(w) AS chars
      FROM s{BPE_MERGES}) m USING (w)
GROUP BY d.source"""
    ),
    "q_zipf_fit": f"""
WITH toks AS (SELECT {_TOKS} AS t FROM documents),
hist AS (SELECT w, count(1) AS wc FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY wc DESC, w) AS DOUBLE)) AS x,
         ln(CAST(wc AS DOUBLE)) AS y
  FROM hist
),
agg AS (
  SELECT CAST(count(1) AS BIGINT) AS n_types, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM ranked
)
SELECT n_types,
       round((sxy - sx * sy / n_types) / (sxx - sx * sx / n_types), 4) AS zipf_slope
FROM agg
""",
    "q_good_turing": f"""
WITH toks AS (SELECT {_TOKS} AS t FROM documents),
hist AS (SELECT w, count(1) AS wc FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w)
SELECT CAST(sum(wc) AS BIGINT) AS n_tokens,
       CAST(count(1) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN wc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       round(CAST(sum(CASE WHEN wc = 1 THEN 1 ELSE 0 END) AS DOUBLE) / sum(wc), 6) AS p_unseen
FROM hist
""",
    "q_tfidf": f"""
WITH terms AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(1) AS tf FROM terms GROUP BY doc_id, term
), df AS (
  SELECT term, count(1) AS df_n FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term
), n AS (SELECT count(1) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ln((n.n_docs + 1.0) / (df.df_n + 1.0)) AS score_raw
  FROM tf JOIN df USING (term) CROSS JOIN n
  WHERE tf.doc_id < 100
), ranked AS (
  SELECT doc_id, term, tf, score_raw,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score_raw DESC, term ASC) AS INTEGER) AS rk
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, rk, round(score_raw, 6) AS tfidf
FROM ranked WHERE rk <= 3
""",
    "q_text_tokens": f"""
WITH d AS (SELECT doc_id, text, {_TOKS} AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est
FROM d
""",
    "q_text_quality": f"""
WITH d AS (SELECT doc_id, lang, text, {_TOKS} AS w FROM documents)
SELECT doc_id, lang,
       CAST(len(w) AS INTEGER) AS n_tokens,
       round(len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 6) AS uniq_ratio,
       round({stopword_count_sql('w')} / CAST(len(w) AS DOUBLE), 6) AS stopword_ratio,
       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
       round(list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)),
                         (a, x) -> a + x) / len(w), 6) AS mean_token_len,
       round(0.4 * (len(list_distinct(w)) / CAST(len(w) AS DOUBLE))
           + 0.3 * least({stopword_count_sql('w')} / CAST(len(w) AS DOUBLE) * 5, 1.0)
           + 0.3 * least(len(w) / 100.0, 1.0), 6) AS quality_score
FROM d
""",
    # profile VALUES are generated from the same CT_PROFILES constant the
    # Spark side broadcasts — one source of truth for the ranked lists.
    "q_text_langid": f"""
WITH tri AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, greatest(length(lower(text)) - 2, 0) + 1),
                               i -> (lower(text))[i:i+2])) AS g
  FROM documents WHERE length(text) >= 3
),
cnt AS (SELECT doc_id, lang, g, count(1) AS c FROM tri GROUP BY 1, 2, 3),
ranked AS (
  SELECT doc_id, lang, g, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS dr
  FROM cnt
),
docp AS (SELECT doc_id, lang, g, dr FROM ranked WHERE dr <= {CT_TOP_M}),
prof AS (
  SELECT * FROM (VALUES {", ".join(f"('{lang}', '{g}', {i + 1})" for lang, p in CT_PROFILES.items() for i, g in enumerate(p))}) p(plang, g, lr)
),
langs AS (SELECT DISTINCT plang FROM prof),
j AS (
  SELECT d.doc_id, d.lang, l.plang,
         coalesce(abs(d.dr - p.lr), {CT_PENALTY}) AS oop
  FROM docp d CROSS JOIN langs l
  LEFT JOIN prof p ON p.plang = l.plang AND p.g = d.g
),
dist AS (
  SELECT doc_id, lang, plang, CAST(sum(oop) AS BIGINT) AS dist
  FROM j GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, lang, plang, dist,
         row_number() OVER (PARTITION BY doc_id ORDER BY dist ASC, plang ASC) AS rk
  FROM dist
)
SELECT lang, plang AS pred_lang, CAST(count(1) AS BIGINT) AS n,
       round(avg(dist), 4) AS avg_oop
FROM best WHERE rk = 1 GROUP BY 1, 2
""",
    "q_text_tf": f"""
WITH terms AS (SELECT unnest({_TOKS}) AS term FROM documents)
SELECT term, CAST(count(1) AS BIGINT) AS tf
FROM terms GROUP BY term ORDER BY tf DESC, term ASC LIMIT 20
""",
    "q_doc_stats": f"""
SELECT source, lang, CAST(count(1) AS BIGINT) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars,
       CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
       min(doc_id) AS min_doc_id
FROM documents GROUP BY source, lang
""",
    "q_text_winnow": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
seq AS (SELECT doc_id, {shingle_seq_sql('w')} AS ss FROM toks),
hs AS (SELECT doc_id, list_transform(ss, s -> {hash60_sql('s')}) AS h, len(ss) AS n FROM seq),
win AS (
  SELECT doc_id, greatest(n - {WINNOW_W - 1}, 0) AS n_windows,
         list_distinct(list_transform(range(1, greatest(n - {WINNOW_W - 1}, 0) + 1),
                                      i -> list_min(h[i:i+{WINNOW_W - 1}]))) AS fp
  FROM hs
)
SELECT doc_id, CAST(n_windows AS INTEGER) AS n_windows,
       CAST(len(fp) AS INTEGER) AS n_fingerprints,
       list_min(fp) AS min_fp, list_max(fp) AS max_fp,
       CASE WHEN len(fp) = 0 THEN 0
            ELSE list_reduce(fp, (a, x) -> xor(a, x)) END AS fp_xor
FROM win
""",
    "q_winnow_match": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
seq AS (SELECT doc_id, {shingle_seq_sql('w')} AS ss FROM toks),
hs AS (SELECT doc_id, list_transform(ss, s -> {hash60_sql('s')}) AS h, len(ss) AS n FROM seq),
sel AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(n - {WINNOW_W - 1}, 0) + 1),
                                      i -> list_min(h[i:i+{WINNOW_W - 1}]))) AS fp
  FROM hs
),
post AS (SELECT doc_id, unnest(fp) AS f FROM sel),
rare AS (SELECT f FROM post GROUP BY f HAVING count(1) <= {WINNOW_MAX_DF}),
kept AS (SELECT doc_id, f FROM post JOIN rare USING (f))
SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(1) AS BIGINT) AS n_shared
FROM kept x JOIN kept y ON x.f = y.f AND x.doc_id < y.doc_id
GROUP BY 1, 2
HAVING count(1) >= {WINNOW_MIN_SHARED}
""",
    "q_text_bpe": f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS w,
         regexp_extract_all(text, '{_BPE_PAT}') AS p
  FROM documents
)
SELECT doc_id,
       CAST(len(w) AS INTEGER) AS n_ws_tokens,
       CAST(len(p) AS INTEGER) AS n_bpe_pieces,
       CAST(len(list_distinct(p)) AS INTEGER) AS n_distinct_pieces
FROM d
""",
    "q_langid_ngram": """
WITH d AS (
  SELECT doc_id, lang,
         list_transform(range(1, greatest(length(lower(text)) - 2, 0) + 1),
                        i -> (lower(text))[i:i+2]) AS tri
  FROM documents
),
sc AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(tri, x -> list_contains(['the', 'he ', ' th', 'ing', 'and', ' an', 'nd ', ' of', 'of ', 'ed '], x))) AS INTEGER) AS en_score,
         CAST(len(list_filter(tri, x -> list_contains(['es ', ' de', 'de ', 'le ', ' le', 'ent', 'nt ', 'que', ' qu', 'la '], x))) AS INTEGER) AS fr_score,
         CAST(len(list_filter(tri, x -> list_contains(['en ', 'er ', 'ch ', 'der', ' de', 'ein', 'ie ', 'sch', 'die', 'und'], x))) AS INTEGER) AS de_score
  FROM d
)
SELECT doc_id, lang, en_score, fr_score, de_score,
       CASE WHEN en_score >= fr_score AND en_score >= de_score THEN 'en'
            WHEN fr_score >= de_score THEN 'fr' ELSE 'de' END AS pred_lang
FROM sc
""",
    "q_text_fingerprint": f"""
WITH d AS (SELECT doc_id, text, {_TOKS} AS w FROM documents)
SELECT doc_id,
       {hash60_sql('text')} AS text_hash,
       list_min(list_transform(w, x -> {hash60_sql('x')})) AS min_token_hash
FROM d
""",
    # repetition gates: token-position union coverage; position base
    # (0- vs 1-based) cancels in the distinct-count fractions
    "q_repetition_filter": f"""
WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
base AS (SELECT doc_id, t, len(t) AS n FROM d WHERE len(t) >= 3),
bi AS (SELECT doc_id, u AS p, t[CAST(u AS INT)] || ' ' || t[CAST(u AS INT)+1] AS g
       FROM base, unnest(range(1, CAST(n AS INT))) AS r(u)),
bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g),
topc AS (SELECT doc_id, max(c) AS mc FROM bic GROUP BY doc_id),
topg AS (SELECT bic.doc_id, min(g) AS g, max(c) AS top_count
         FROM bic JOIN topc ON bic.doc_id = topc.doc_id AND bic.c = topc.mc
         GROUP BY bic.doc_id),
tcov AS (SELECT bi.doc_id, count(DISTINCT bi.p + off) AS tcov
         FROM bi JOIN topg ON bi.doc_id = topg.doc_id AND bi.g = topg.g,
              unnest(range(0, 2)) AS r2(off)
         WHERE topg.top_count >= 2
         GROUP BY bi.doc_id),
g3 AS (SELECT doc_id, u AS p,
              t[CAST(u AS INT)] || ' ' || t[CAST(u AS INT)+1] || ' ' || t[CAST(u AS INT)+2] AS g
       FROM base, unnest(range(1, CAST(n AS INT) - 1)) AS r(u)),
dup AS (SELECT doc_id, g FROM g3 GROUP BY doc_id, g HAVING count(*) >= 2),
dcov AS (SELECT g3.doc_id, count(DISTINCT g3.p + off) AS dcov
         FROM g3 JOIN dup ON g3.doc_id = dup.doc_id AND g3.g = dup.g,
              unnest(range(0, 3)) AS r2(off)
         GROUP BY g3.doc_id)
SELECT base.doc_id, base.n AS n_tokens, topg.g AS top_bigram,
       CAST(topg.top_count AS BIGINT) AS top_count,
       round(coalesce(CAST(tcov.tcov AS DOUBLE), 0) / base.n, 6) AS top2_frac,
       round(coalesce(CAST(dcov.dcov AS DOUBLE), 0) / base.n, 6) AS dup3_frac,
       (round(coalesce(CAST(tcov.tcov AS DOUBLE), 0) / base.n, 6) < {REP_TOP2_MAX}
        AND round(coalesce(CAST(dcov.dcov AS DOUBLE), 0) / base.n, 6) < {REP_DUP3_MAX})
         AS keep
FROM base
JOIN topg ON base.doc_id = topg.doc_id
LEFT JOIN tcov ON base.doc_id = tcov.doc_id
LEFT JOIN dcov ON base.doc_id = dcov.doc_id
""",
}
