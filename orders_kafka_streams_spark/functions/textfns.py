"""Text primitives shared by the text / dedup operators.

Tokenization must be engine-portable (the oracle re-tokenizes in SQL):
split on single spaces, drop empties, lowercase. All pure Catalyst
higher-order functions — no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: function words used by the quality / language heuristics (present in
#: the synthetic corpus vocabulary; swap for a real list in production).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens with empties removed."""
    return F.filter(F.split(F.lower(text), " "), lambda x: x != "")


def tokens_sql(expr: str) -> str:
    """DuckDB mirror of :func:`tokens`."""
    return f"list_filter(string_split(lower({expr}), ' '), x -> x <> '')"


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of a token array.

    Built as ``zip_with`` over n shifted ``slice``s of the token array.
    The lambdas reference ONLY their bound element variables — never
    ``toks`` itself. That matters: higher-order lambdas are interpreted,
    and an expression like ``element_at(toks, i)`` inside a lambda
    re-evaluates the whole tokenization PER ELEMENT (measured: O(len²)
    per doc, ~9 s for 5k docs at sf0.1; this form is linear).
    Empty array for docs shorter than ``n`` tokens.
    """
    m = F.size(toks) - (n - 1)  # shingle count when size >= n
    grams = F.slice(toks, 1, m)
    for k in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, k + 1, m), lambda x, y: F.concat_ws(" ", x, y))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(toks_expr: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`shingles`; 1-indexed list access."""
    parts = " || ' ' || ".join(f"({toks_expr})[i+{k}]" for k in range(n))
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({toks_expr}) - {n - 2}), i -> {parts})) "
        f"ELSE [] END"
    )


def shingle_seq(toks: Column, n: int = 3) -> Column:
    """POSITIONAL word n-gram sequence (duplicates kept, document order).

    :func:`shingles` dedupes for set-based measures (Jaccard, MinHash);
    order-sensitive algorithms — winnowing fingerprints pick a minimum
    per *sliding window of consecutive* k-grams — need the raw sequence.
    (Dedup order also isn't portable: DuckDB's ``list_distinct`` does
    not preserve first-occurrence order, Spark's ``array_distinct``
    does, so any order-sensitive consumer of :func:`shingles` would be
    engine-dependent.) Same shifted-slice ``zip_with`` build, O(len·n).
    """
    m = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, m)
    for k in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, k + 1, m), lambda x, y: F.concat_ws(" ", x, y))
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingle_seq_sql(toks_expr: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`shingle_seq`."""
    parts = " || ' ' || ".join(f"({toks_expr})[i+{k}]" for k in range(n))
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_transform(range(1, len({toks_expr}) - {n - 2}), i -> {parts}) "
        f"ELSE [] END"
    )


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))


def stopword_count_sql(toks_expr: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"len(list_filter({toks_expr}, x -> x IN ({inlist})))"
