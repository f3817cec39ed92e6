"""JSON edge codecs: parse once at the boundary, emit once at the sink.

Replaces the reference's Gson serdes
(JsonObjectSerializer.java:37-59, JsonObjectDeserializer.java:39-48)
and its poison-pill policy (``LogAndContinueExceptionHandler``,
Main.java:88): ``from_json`` in PERMISSIVE mode yields a
``_corrupt_record`` column instead of crashing; :func:`decode_json`
splits good rows from corrupt ones so the caller can route the latter
to a dead-letter sink (the reference only logs and drops).

All of this is Catalyst-native (no Python in the hot path): from_json /
to_json are JVM expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def json_decode_col(value: Column, schema: T.StructType) -> Column:
    """``from_json`` in PERMISSIVE mode with a corrupt-record capture column."""
    return F.from_json(
        value.cast("string"),
        _schema_with_corrupt(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )


def decode_json(
    df: DataFrame, schema: T.StructType, value_col: str = "value", keep_cols: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """Decode a JSON-bytes/string column into typed columns.

    Returns ``(good, corrupt)``: good rows with the schema's columns
    (plus ``keep_cols`` passed through), and the corrupt raw records.
    """
    parsed = df.withColumn("_parsed", json_decode_col(F.col(value_col), schema))
    # from_json yields a null struct for unparseable input and a non-null
    # _corrupt_record for partially-parseable input. Treat both as poison.
    is_corrupt = F.col("_parsed").isNull() | F.col(f"_parsed.{CORRUPT_COL}").isNotNull()
    good = (
        parsed.filter(~is_corrupt)
        .select(*keep_cols, *[f"_parsed.{f.name}" for f in schema.fields if f.name != CORRUPT_COL])
    )
    corrupt = parsed.filter(is_corrupt).select(*keep_cols, F.col(value_col).cast("string").alias("raw"))
    return good, corrupt


def json_encode(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Encode all columns to a JSON ``value`` (+ optional ``key``) for a Kafka sink.

    Mirrors the reference's serializer (JsonObjectSerializer.java:42)
    as a single Catalyst expression.
    """
    cols = [c for c in df.columns if c != key_col]
    out = df.select(
        *([F.col(key_col).cast("string").alias("key")] if key_col else []),
        F.to_json(F.struct(*cols)).alias("value"),
    )
    return out
