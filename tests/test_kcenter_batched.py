"""Tournament (batched) FPS at the K ≫ 8 regime the exact per-step
loop can't reach (VERDICT r5 item 4): K=256 over a 20k-vector fixture
must finish in two Arrow-kernel jobs — no driver-paced per-step
argmax — inside a hard wall-clock budget, and the picked set must
satisfy k-center structural invariants (coverage monotone, no
duplicates, 2(1+ε) radius sanity vs exact FPS on the same data).
"""

from __future__ import annotations

import time

import numpy as np
import pytest
from pyspark.sql import types as T

from orders_kafka_streams_spark.operators.clustering import (
    fps_pandas_picks,
    kcenter_batched,
)

N, DIM = 20_000, 16
K, P = 256, 8
BUDGET_SEC = 60.0  # generous local[32] wall bound; typical run ≪ this

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("v", T.ArrayType(T.DoubleType())),
    ]
)


@pytest.fixture(scope="module")
def fixture_emb(spark):
    rng = np.random.default_rng(7)
    V = rng.normal(size=(N, DIM))
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(N)]
    return spark.createDataFrame(rows, EMB_SCHEMA), V


def test_k256_under_budget_and_structurally_sound(spark, fixture_emb):
    emb, V = fixture_emb
    t0 = time.time()
    rows = kcenter_batched(emb, P, K).collect()
    wall = time.time() - t0
    assert wall < BUDGET_SEC, f"K={K} tournament took {wall:.1f}s"
    assert len(rows) == K
    assert [r.sel_rank for r in rows] == list(range(1, K + 1))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == K, "duplicate picks"
    # coverage radius is non-increasing down the ranks (the k-center
    # objective's monotone certificate) — within the winner pool
    d = [r.min_d2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(d, d[1:]))


def test_tournament_radius_within_factor_of_exact(fixture_emb):
    """2(1+ε) sanity on a subsample: the tournament's achieved
    coverage radius over the FULL point set must be within 4x the
    exact FPS radius (theory: 2x approx of optimal on each side)."""
    _, V = fixture_emb
    sub = V[:2_000]
    ids = np.arange(len(sub))
    exact_picks, exact_vecs = fps_pandas_picks(sub, ids, 64)

    # tournament: local FPS per (id % 4), then FPS over the winners
    pool_ids, pool_vecs = [], []
    for p in range(4):
        m = ids % 4 == p
        pk, vs = fps_pandas_picks(sub[m], ids[m], 64)
        pool_ids.extend(i for _, i, _ in pk)
        pool_vecs.extend(vs)
    fin, fin_vecs = fps_pandas_picks(
        np.stack(pool_vecs), np.array(pool_ids), 64
    )

    def radius(centers):
        C = np.stack(centers)
        d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return float(d2.min(axis=1).max())

    r_exact = radius(exact_vecs)
    r_tour = radius(fin_vecs)
    assert r_tour <= 4.0 * r_exact, (r_tour, r_exact)


def test_partition_smaller_than_k_exhausts_cleanly(spark):
    """n < K: every point is picked exactly once, ranks stay dense."""
    rng = np.random.default_rng(3)
    rows = [(int(i), [float(x) for x in rng.normal(size=4)]) for i in range(10)]
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    got = kcenter_batched(emb, 3, 50).collect()
    assert sorted(r.vec_id for r in got) == list(range(10))
    assert [r.sel_rank for r in got] == list(range(1, 11))
