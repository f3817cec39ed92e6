"""Engine-portable primitives shared by Spark queries and their SQL oracles.

The correctness harness diffs every query against DuckDB, so anything
hash- or time-based must compute *bit-identical* values in both
engines. Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` are
different functions — instead we derive a 60-bit integer from ``md5``
(identical everywhere): first 15 hex chars → bigint. 60 bits keeps all
downstream arithmetic (mod-prime affine transforms for MinHash) inside
int64 without overflow in either engine.

Performance note: md5 is a JVM intrinsic inside whole-stage codegen —
slower than xxhash64 but still vectorized and shuffle-free; at 100 TB
you would switch both sides to xxhash64 only if the oracle moved to an
engine that shares it. The *operator* code takes the hash function as
a parameter so the swap is one line.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus for MinHash affine transforms: Mersenne prime 2^31-1.
#: (a*h+b) with a,b,h < 2^31 stays < 2^62 — safe in int64 in both engines.
MERSENNE31 = 2_147_483_647


def hash60(col: Column) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """Portable 60-bit hash (DuckDB oracle side). Must mirror :func:`hash60`."""
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15) AS BIGINT)"


def hash31(col: Column) -> Column:
    """Portable hash reduced mod 2^31-1 (MinHash base hash, Spark side)."""
    return hash60(col) % MERSENNE31


def hash31_sql(expr: str) -> str:
    return f"({hash60_sql(expr)} % {MERSENNE31})"


def epoch_ms(col: Column) -> Column:
    """Epoch milliseconds of a timestamp (== DuckDB ``epoch_ms``).

    Parquet written without ``isAdjustedToUTC`` loads as TIMESTAMP_NTZ,
    which ``unix_millis`` rejects; the session timezone is pinned to UTC
    (session.py), so casting NTZ wall-clock → TIMESTAMP yields the same
    instant DuckDB's ``epoch_ms`` computes on the naive value. The cast
    is a no-op for already-TZ columns and stays inside codegen.
    """
    return F.unix_millis(col.cast("timestamp"))
