"""Local replica of the driver's DuckDB-oracle differential check.

Runs a Spark query and its ANSI-SQL oracle side-by-side, then compares
row count + order-insensitive canonicalized values (columns sorted by
name, rows sorted by canonical form) — mirroring the driver's
row-count/schema/value-hash gate so failures surface locally first.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(v):
    """Canonical comparable form of a cell value (engine-agnostic)."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_query: str, sf_dir: str, limit: int = 2_000_000):
    """Return (ok, message). Compares column names, row counts, values."""
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    con = duck_con(sf_dir)
    cur = con.execute(oracle_query)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    if sorted(scols) != sorted(ocols):
        return False, f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count differs: spark={len(srows)} oracle={len(orows)}"
    sc, oc = _canon_rows(scols, srows), _canon_rows(ocols, orows)
    if sc != oc:
        diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        only_s = [r for r in sc[:50] if r not in oc[:50]][:2]
        return False, f"values differ; first sorted mismatches: {diff} spark-only sample: {only_s}"
    return True, f"ok ({len(srows)} rows)"
