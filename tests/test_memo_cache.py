"""Bounded persist-memo lifecycle (operators/dedup.py::_memo_persist).

The memo caps live persisted relations per session; beyond the cap the
least-recently-used relation is unpersisted and dropped so a long-lived
driver iterating over many sf_dirs/tags can't pin unbounded executor
storage.
"""

from __future__ import annotations

from orders_kafka_streams_spark.operators import dedup


def _clear(spark):
    app = spark.sparkContext.applicationId
    for k in list(dedup._PERSIST_MEMO):
        if k[0] == app:
            dedup._PERSIST_MEMO.pop(k).unpersist()


def test_memo_evicts_lru_beyond_cap(spark, sf_dir, monkeypatch):
    _clear(spark)
    monkeypatch.setattr(dedup, "_PERSIST_MEMO_MAX", 3)

    def build(i):
        return lambda: spark.range(i, i + 10)

    dfs = [dedup._memo_persist(spark, sf_dir, f"t{i}", build(i)) for i in range(3)]
    assert len(dedup._PERSIST_MEMO) == 3
    assert all(df.storageLevel.useMemory for df in dfs)

    # touch t0 → t1 becomes LRU; inserting t3 must evict t1, not t0
    dedup._memo_persist(spark, sf_dir, "t0", build(0))
    dedup._memo_persist(spark, sf_dir, "t3", build(3))
    tags = {k[2] for k in dedup._PERSIST_MEMO}
    assert tags == {"t0", "t2", "t3"}
    assert not dfs[1].storageLevel.useMemory  # t1 unpersisted
    assert dfs[0].storageLevel.useMemory  # t0 survived (recently used)
    _clear(spark)


def test_memo_hit_returns_same_relation(spark, sf_dir):
    _clear(spark)
    a = dedup._memo_persist(spark, sf_dir, "hit", lambda: spark.range(5))
    b = dedup._memo_persist(spark, sf_dir, "hit", lambda: spark.range(5))
    assert a is b
    _clear(spark)
