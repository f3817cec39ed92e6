"""Multi-block correctness of the block-matrix embedding cosine join.

The driver's sf0.01 oracle corpus (500 vectors) fits in ONE block of
EMB_BLOCK=1024, so the grid cells with ablk < bblk — the replicate +
equi-join machinery — are never exercised by the correctness gate.
This test forces several blocks with a small block size and checks the
full pair set against a direct numpy reference, including block-border
pairs."""

from __future__ import annotations

import numpy as np

from orders_kafka_streams_spark.operators.dedup import embedding_cosine_pairs

N, D, BLOCK, THRESH = 300, 8, 64, 0.5  # 300/64 -> 5 blocks, 15 grid cells


def test_multi_block_matches_numpy(spark):
    rng = np.random.default_rng(42)
    X = rng.normal(size=(N, D))
    # plant some near-duplicate pairs ACROSS block borders
    for a, b in [(0, 299), (63, 64), (127, 128), (10, 200)]:
        X[b] = X[a] + rng.normal(scale=0.01, size=D)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.a, r.b): r.cosine
        for r in embedding_cosine_pairs(emb, THRESH, block=BLOCK).collect()
    }

    # numpy reference ON THE FLOAT32 values the DataFrame actually holds
    Xf = X.astype(np.float32).astype(np.float64)
    Xn = Xf / np.linalg.norm(Xf, axis=1, keepdims=True)
    sims = Xn @ Xn.T
    want = {
        (a, b): round(float(sims[a, b]), 6)
        for a in range(N)
        for b in range(a + 1, N)
        if sims[a, b] >= THRESH
    }
    assert set(got) == set(want), (
        f"missing={sorted(set(want) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(want))[:5]}"
    )
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)
    # the planted cross-border pairs must all be found
    for pair in [(0, 299), (63, 64), (127, 128), (10, 200)]:
        assert pair in got
