#!/usr/bin/env python
"""Snapshot every registered query's physical-plan budget into
tests/plan_budgets.json (VERDICT r3 item 1).

    python tools/gen_plan_budgets.py [sf_dir]

Run after adding a query or intentionally changing a plan shape; the
resulting diff is the review surface (an exchange count going UP, a
new bnlj/cartesian flag, or a new python node should be a conscious,
explained change). tests/test_plan_budget.py enforces the table.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "tests", "plan_budgets.json")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from orders_kafka_streams_spark.plans.budget import analyze_registry
    from orders_kafka_streams_spark.session import get_spark

    spark = get_spark("okss-plan-budgets", cpus=8, shuffle_partitions=8)
    table = analyze_registry(spark, sf_dir)
    with open(OUT, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
        fh.write("\n")

    flagged = {
        n: m
        for n, m in table.items()
        if m.get("cartesian") or m.get("bnlj") or m.get("python")
    }
    print(f"{len(table)} queries recorded to {OUT}")
    print(f"{sum(1 for m in table.values() if m.get('gate') == 'streaming')} streaming-gated")
    print(f"{len(flagged)} flagged (cartesian/bnlj/python) — review each:")
    for n, m in sorted(flagged.items()):
        tags = [t for t in ("cartesian", "bnlj") if m.get(t)] + m.get("python", [])
        print(f"  {n}: {','.join(tags)} exchanges={m['exchanges']}")

    from orders_kafka_streams_spark.plans.budget import GLOBAL_WINDOW_WHITELIST

    gw = {n: m["global_windows"] for n, m in table.items() if m.get("global_windows")}
    over = {
        n: c
        for n, c in gw.items()
        if c > GLOBAL_WINDOW_WHITELIST.get(n, (0,))[0]
    }
    print(f"{len(gw)} with unpartitioned windows (whitelist gate):")
    for n, c in sorted(gw.items()):
        mark = " OVER-WHITELIST" if n in over else ""
        print(f"  {n}: global_windows={c}{mark}")
    if over:
        raise SystemExit(f"unwhitelisted global windows: {sorted(over)}")

    from orders_kafka_streams_spark.plans.budget import CONST_KEY_WINDOW_WHITELIST

    ck = {n: m["const_key_windows"] for n, m in table.items() if m.get("const_key_windows")}
    over_ck = {
        n: c
        for n, c in ck.items()
        if c > CONST_KEY_WINDOW_WHITELIST.get(n, (0,))[0]
    }
    print(f"{len(ck)} with const-cardinality-key windows lacking Partial WGL pushdown:")
    for n, c in sorted(ck.items()):
        mark = " OVER-WHITELIST" if n in over_ck else ""
        print(f"  {n}: const_key_windows={c}{mark}")
    if over_ck:
        raise SystemExit(f"unwhitelisted const-key windows: {sorted(over_ck)}")


if __name__ == "__main__":
    main()
