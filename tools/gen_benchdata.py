"""Generate a PERF-ONLY sf1 corpus by scaling the driver's sf0.1
tables 10× (VERDICT r2 item 10): per-query timings at sf0.1 drown in
JVM/stage noise as the headline grows, so the heaviest operators are
additionally benched at sf1, where regressions are measured above the
noise floor.

This is a BENCH corpus, not a correctness corpus — the oracle gate
stays at the driver's sf0.01. Scaling preserves workload shape:

- fixed dims (region, nation) are copied;
- every fact/entity table is replicated REPLICAS× with key domains
  shifted per replica, so join fan-outs, per-key cardinalities, and
  group counts scale like real growth (10× users, not 10× rows per
  user);
- documents get a per-replica token suffix so cross-replica docs are
  NOT near-duplicates (otherwise every doc becomes a 10-clique and
  dedup verify cost explodes quadratically instead of scaling
  linearly with real corpus growth);
- embeddings are circularly rolled by replica so cross-replica
  vectors decorrelate while norms/distributions are preserved.

Run: python tools/gen_benchdata.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> .benchdata/sf1 (gitignored).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPLICAS = 10

KEY_SHIFTS = {
    # table -> [(column, key-domain)] ; every column in one domain
    # shifts by the same per-replica offset so joins stay consistent
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [("l_orderkey", "order"), ("l_partkey", "part"), ("l_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "doc")],  # doc_id == vec_id alignment kept
}

COPY = ("region", "nation")


def _domain_sizes(spark: SparkSession, src: str) -> dict[str, int]:
    out: dict[str, int] = {}

    def dom(table: str, col: str, name: str) -> None:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        hi = df.agg(F.max(col)).collect()[0][0]
        out[name] = max(out.get(name, 0), int(hi) + 1)

    dom("customer", "c_custkey", "cust")
    dom("supplier", "s_suppkey", "supp")
    dom("part", "p_partkey", "part")
    dom("orders", "o_orderkey", "order")
    dom("events", "event_id", "event")
    dom("events", "user_id", "user")
    dom("documents", "doc_id", "doc")
    dom("embeddings", "vec_id", "doc")
    return out


def scale_table(df: DataFrame, table: str, domains: dict[str, int]) -> DataFrame:
    reps = df.sparkSession.range(REPLICAS).select(F.col("id").cast("int").alias("rep"))
    out = df.crossJoin(F.broadcast(reps))
    for col, dom in KEY_SHIFTS.get(table, []):
        out = out.withColumn(col, (F.col(col) + F.col("rep").cast("long") * domains[dom]).cast(dict(df.dtypes)[col]))
    if table == "documents":
        # suffix every token with the replica id for rep>0: within-replica
        # similarity structure is preserved exactly, cross-replica
        # near-duplication is destroyed (see module docstring)
        out = out.withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1r"), F.col("rep").cast("string")),
                )
            ),
        )
    if table == "embeddings":
        # circular roll by replica: slice+concat keeps float32 element type
        n = F.size("embedding")
        r = F.col("rep") % n
        out = out.withColumn(
            "embedding",
            F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
                F.concat(F.slice("embedding", r + 1, n - r), F.slice("embedding", 1, r))
            ),
        )
    return out.drop("rep")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".benchdata", "sf1")
    os.makedirs(dst, exist_ok=True)

    from orders_kafka_streams_spark.session import get_spark

    spark = get_spark("okss-gen-sf1")
    domains = _domain_sizes(spark, src)
    for table in COPY:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
    for table in KEY_SHIFTS:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        scale_table(df, table, domains).write.mode("overwrite").parquet(
            os.path.join(dst, f"{table}.parquet")
        )
    # completeness marker written LAST: consumers (bench.py) must treat a
    # corpus without it as absent — an interrupted generation otherwise
    # looks complete because early tables exist
    with open(os.path.join(dst, "_COMPLETE"), "w") as f:
        f.write(f"{REPLICAS}x {src}\n")
    print(f"wrote {dst} ({REPLICAS}x {src})")


if __name__ == "__main__":
    main()
