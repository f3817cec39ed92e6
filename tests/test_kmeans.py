"""Deterministic k-means vs an independent pure-Python reference.

The sf0.01 DuckDB oracle cross-checks the two ENGINES on the real
table; this test checks the ALGORITHM on synthetic gaussian blobs
against a reference that mirrors the spec exactly: seed = the K
lowest-id vectors, assignment = argmin of the 6dp-rounded strict
left-fold squared L2 (ties to the lower cid), update = 6dp-rounded
per-dimension mean. Python's sequential float fold is IEEE-identical
to Spark's ``F.aggregate`` left fold, and the 6dp rounding at every
iteration boundary is what makes the cross-engine (and cross-sum-
order) assignments deterministic — exactly the property under test.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.clustering import (
    _centroid_row,
    assign_clusters,
    update_centroids,
)

N, D, K, ITERS = 60, 8, 4, 3


def _ref_kmeans(X: np.ndarray) -> dict[int, int]:
    cents: dict[int, list[float]] = {cid: [float(x) for x in X[cid]] for cid in range(K)}

    def d2(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return round(acc, 6)

    assign: dict[int, int] = {}
    for it in range(ITERS + 1):
        assign = {
            i: min((d2(X[i], v), cid) for cid, v in cents.items())[1]
            for i in range(len(X))
        }
        if it == ITERS:
            break
        cents = {
            cid: [
                round(
                    sum(float(X[i][d]) for i in sorted(assign) if assign[i] == cid)
                    / sum(1 for i in assign if assign[i] == cid),
                    6,
                )
                for d in range(D)
            ]
            for cid in sorted(set(assign.values()))
        }
    return assign


def test_kmeans_matches_reference(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(scale=5.0, size=(K, D))
    X = np.vstack([centers[i % K] + rng.normal(size=D) for i in range(N)])

    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, v array<double>",
    )
    cur = (
        emb.orderBy("vec_id")
        .limit(K)
        .select((F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cid"), "v")
    )
    for _ in range(ITERS):
        cur = update_centroids(assign_clusters(emb, _centroid_row(cur)))
    out = assign_clusters(emb, _centroid_row(cur))

    got = {r.vec_id: r.cluster for r in out.collect()}
    assert got == _ref_kmeans(X)
    # planted blobs: clustering must be non-degenerate
    assert len(set(got.values())) == K
