"""Interleaved A/B benchmark runner (VERDICT r9 item 1).

Times a fixed query list against ONE checkout of this repo (given by
--repo) using bench.py's steady protocol: warm the JVM on q_tpch_q6,
build each query's plan untimed, then time execution only (noop sink).
One invocation = one PASS producing one sample per query; the driver
shell interleaves passes across two checkouts (A1 B1 A2 B2 ...) so an
ambient load wave cannot sit on only one side's samples. Per-side
steady = min over that side's passes, computed by --merge.

Usage:
  python tools/ab_bench.py --repo /root/repo --out A1.json q_x q_y ...
  python tools/ab_bench.py --merge A1.json A2.json --out A.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def run_pass(repo: str, names: list[str], sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, repo)
    os.chdir(repo)
    from orders_kafka_streams_spark.operators import all_queries
    from orders_kafka_streams_spark.session import get_spark

    spark = get_spark("okss-ab")
    queries = all_queries()

    def run_once(name: str) -> float:
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    run_once("q_tpch_q6")  # JVM/codegen/file-listing warm-up
    out: dict[str, float] = {}
    for name in names:
        if name not in queries:
            out[name] = -1.0  # absent in this checkout (query added later)
            continue
        run_once(name)  # memo-persist / first-touch warm, untimed
        out[name] = round(run_once(name), 4)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo")
    ap.add_argument("--out", required=True)
    ap.add_argument("--merge", nargs="*", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.merge is not None:
        if not args.merge:
            ap.error("--merge requires at least one pass file")
        passes = [json.load(open(p)) for p in args.merge]
        merged = {
            n: round(min(p[n] for p in passes), 4)
            for n in passes[0]
            if all(p.get(n, -1) >= 0 for p in passes)
        }
        json.dump(merged, open(args.out, "w"), indent=1)
        print(json.dumps({"merged": len(merged), "out": args.out}))
        return

    if not args.repo:
        ap.error("--repo is required when running a pass (omit only with --merge)")
    timings = run_pass(args.repo, args.names, args.sf_dir)
    json.dump(timings, open(args.out, "w"), indent=1)
    print(json.dumps({"pass_sum": round(sum(t for t in timings.values() if t > 0), 2)}))


if __name__ == "__main__":
    main()
