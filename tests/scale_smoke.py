"""Spark-only scale smoke: run EVERY registered query at a given SF
(default sf0.1 — 10× the correctness gate) and report per-query wall
time + row count, slowest first. No DuckDB — the point is surfacing
Spark-side scale regressions (quadratic blowups, skew, plan
de-optimization) on the full registry, not just the bench headline.

    python tests/scale_smoke.py [sf_dir] [budget_s]

Exit 1 if any query errors or exceeds the per-query budget.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from orders_kafka_streams_spark.session import get_spark

    spark = get_spark("okss-scale-smoke")
    queries = entry.queries()
    times: dict[str, float] = {}
    errors: list[tuple[str, str]] = []
    slow: list[str] = []
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            n = queries[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            times[name] = dt
            flag = " SLOW" if dt > budget else ""
            if flag:
                slow.append(name)
            print(f"{name}: {dt:.2f}s {n} rows{flag}", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            errors.append((name, repr(e)[:200]))
            print(f"{name}: ERROR {e!r}", flush=True)
    print(f"\nTOTAL {len(times)}/{len(queries)} ok, wall {sum(times.values()):.1f}s")
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {name}: {dt:.2f}s")
    if errors:
        print(f"ERRORS: {errors}")
    if slow:
        print(f"OVER BUDGET ({budget}s): {slow}")
    return 1 if errors or slow else 0


if __name__ == "__main__":
    raise SystemExit(main())
