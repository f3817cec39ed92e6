"""Command-line entry point — the operational face of the engine.

The reference is a runnable app (``java -jar`` starts the topology,
Main.java:131); the equivalent here:

    python -m orders_kafka_streams_spark list [pattern]
    python -m orders_kafka_streams_spark run <query> [--sf-dir DIR] [-n N]
    python -m orders_kafka_streams_spark explain <query> [--sf-dir DIR]
    python -m orders_kafka_streams_spark oracle <query>

``run`` executes any registered query and prints N rows; ``explain``
prints the formatted physical plan (the artifact to eyeball before a
100 TB run); ``oracle`` prints the query's DuckDB cross-check SQL.
Exit code 2 for an unknown query, listing close names.
"""

from __future__ import annotations

import argparse
import fnmatch
import sys


def _registry():
    from .operators import all_oracles, all_queries

    return all_queries(), all_oracles()


def _resolve(name: str, queries) -> str:
    if name in queries:
        return name
    if not name.startswith("q_") and f"q_{name}" in queries:
        return f"q_{name}"
    close = [q for q in queries if name in q]
    hint = f"; close matches: {', '.join(sorted(close)[:8])}" if close else ""
    print(f"unknown query {name!r}{hint}", file=sys.stderr)
    raise SystemExit(2)


_TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _verify(df, name: str, oracles, sf_dir: str) -> tuple[bool, str]:
    """One-query replica of the round driver's oracle diff (row count +
    column set + order-insensitive canonical value multiset). Rows-only
    queries get a run/stability check."""
    import datetime
    import math
    import os

    import duckdb

    srows = [tuple(r) for r in df.collect()]
    if name not in oracles:
        return True, f"rows-only: {len(srows)} rows (no SQL oracle)"
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    cur = con.execute(oracles[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    def canon(v):
        # mirrors tests/oracle_harness.canon — incl. the ±0.0 and bool
        # normalizations (dropping them makes -0.0 vs 0.0 a false red)
        if v is None:
            return "~"
        if isinstance(v, bool):
            return "1" if v else "0"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == 0:
                return "0"
            return f"{v:.9g}"
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    scols = list(df.columns)
    if sorted(scols) != sorted(ocols):
        return False, f"COLUMNS differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"ROW COUNT differs: spark={len(srows)} oracle={len(orows)}"
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    s = sorted(tuple(canon(r[i]) for i in so) for r in srows)
    o = sorted(tuple(canon(r[i]) for i in oo) for r in orows)
    if s != o:
        diff = [(a, b) for a, b in zip(s, o) if a != b][:2]
        return False, f"VALUES differ; first sorted mismatches: {diff}"
    return True, f"OK ({len(srows)} rows match the oracle)"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="orders_kafka_streams_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("pattern", nargs="?", default="*", help="glob, e.g. 'q_dedup_*'")

    for cmd, desc in (("run", "execute a query"), ("explain", "print the physical plan")):
        sp = sub.add_parser(cmd, help=desc)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default=None, help="table directory (default $SPARK_GRAFT_SF_DIR)")
        if cmd == "run":
            sp.add_argument("-n", type=int, default=20, help="rows to show")

    p_or = sub.add_parser("oracle", help="print the DuckDB cross-check SQL")
    p_or.add_argument("query")

    p_v = sub.add_parser("verify", help="run the DuckDB oracle diff for a query")
    p_v.add_argument("query")
    p_v.add_argument("--sf-dir", default=None, help="table directory (default $SPARK_GRAFT_SF_DIR)")

    args = p.parse_args(argv)
    queries, oracles = _registry()

    if args.cmd == "list":
        names = sorted(fnmatch.filter(queries, args.pattern))
        for n in names:
            print(f"{n}{'' if n in oracles else '  (rows-only)'}")
        print(f"{len(names)} queries", file=sys.stderr)
        return 0

    name = _resolve(args.query, queries)

    if args.cmd == "oracle":
        if name not in oracles:
            print(f"{name} is rows-only (no SQL oracle)", file=sys.stderr)
            return 1
        print(oracles[name].strip())
        return 0

    from .session import get_spark
    from .sources.tables import sf_dir_default

    sf_dir = args.sf_dir or sf_dir_default()
    spark = get_spark("okss-cli")
    df = queries[name](spark, sf_dir)
    if args.cmd == "verify":
        ok, msg = _verify(df, name, oracles, sf_dir)
        print(f"{name}: {msg}")
        return 0 if ok else 1
    if args.cmd == "explain":
        from .plans.explain import explain_str

        print(explain_str(df, mode="formatted"))
    else:
        df.show(args.n, truncate=False)
        print(f"({df.count()} rows total)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
