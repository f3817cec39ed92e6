"""The r11 shared-winners memo for the kcenter pair: ONE stage-1
local-FPS relation at kmax = max(KCENTER_K, KC_BATCH_K) serves both
declared queries through an lrank prefix filter. Validity rests on
FPS prefix-determinism — the first j picks of a k-deep greedy run ARE
the j-deep run — so the memo-dispatched results must equal the direct
(un-memoized) tournament bit-for-bit at every family depth.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orders_kafka_streams_spark.operators.clustering import (
    KC_BATCH_K,
    KC_BATCH_P,
    KCENTER_K,
    KCENTER_P,
    fps_pandas_picks,
    kcenter_batched,
    kcenter_final,
    kcenter_local_winners,
)

N, DIM = 3_000, 8

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("v", T.ArrayType(T.DoubleType())),
    ]
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(31)
    V = rng.normal(size=(N, DIM))
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(N)]
    return spark.createDataFrame(rows, EMB_SCHEMA)


def test_fps_prefix_property_kernel():
    """The kernel invariant the memo share rests on: a k-deep pick
    list embeds every shallower list as its prefix."""
    rng = np.random.default_rng(5)
    V = rng.normal(size=(500, DIM))
    ids = np.arange(500, dtype=np.int64)
    deep, _ = fps_pandas_picks(V, ids, 16)
    shallow, _ = fps_pandas_picks(V, ids, 8)
    assert deep[:8] == shallow


def test_winners_prefix_filter_equals_direct_tournament(emb):
    """kmax-deep winners + lrank filter == the direct tournament at
    each family depth (the exact dispatch the declared queries run)."""
    assert KCENTER_P == KC_BATCH_P
    kmax = max(KCENTER_K, KC_BATCH_K)
    winners = kcenter_local_winners(emb, KC_BATCH_P, kmax)
    for k in (KCENTER_K, KC_BATCH_K):
        via_memo = kcenter_final(
            winners.filter(F.col("lrank") <= k), k
        ).collect()
        direct = kcenter_batched(emb, KC_BATCH_P, k).collect()
        assert [tuple(r) for r in via_memo] == [tuple(r) for r in direct]
