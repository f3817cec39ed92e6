#!/usr/bin/env python
"""Round-11 optimization measurement harness (guide §1).

Times individual registry queries exactly the way bench.py does
(construction excluded from steady, noop sink so the computation is
what's timed, min-of-N steady runs) and captures
``explain("formatted")`` for each, so before/after plan evidence can
be committed under plans/r11/.

Run: python tools/opt_measure.py [--sf DIR] [--runs N] [--tag before|after]
         [--no-plan] name [name ...]

Writes plans/r11/<name>_<tag>.txt and prints one line per query:
``<name> cold=<s> steady=<s> runs=[...]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default=None, help="write plans/r11/<name>_<tag>.txt")
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    from orders_kafka_streams_spark.operators import all_queries
    from orders_kafka_streams_spark.session import get_spark

    spark = get_spark("okss-opt-measure")
    queries = all_queries()
    plan_dir = os.path.join(REPO, "plans", "r11")
    os.makedirs(plan_dir, exist_ok=True)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # JVM/codegen/file-listing warm-up, same as bench.py
    spark.sparkContext.setJobDescription("warmup q_tpch_q6")
    noop(queries["q_tpch_q6"](spark, args.sf))

    for name in args.names:
        spark.sparkContext.setJobDescription(f"opt_measure {name} cold")
        t0 = time.perf_counter()
        df = queries[name](spark, args.sf)
        noop(df)
        cold = time.perf_counter() - t0
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt_measure {name} steady {i}")
            df = queries[name](spark, args.sf)
            t0 = time.perf_counter()
            noop(df)
            runs.append(time.perf_counter() - t0)
        if args.tag and not args.no_plan:
            df = queries[name](spark, args.sf)
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        print(
            f"{name} cold={cold:.3f} steady={min(runs):.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
