"""q_global_shuffle — deterministic corpus-wide training-order
permutation (VERDICT r8 item 4). The load-bearing property is
SHARD-BOUNDARY INVARIANCE: the (doc_id -> shuffle_pos, shard,
pos_in_shard) mapping must not depend on how the input happened to be
partitioned or how many range stripes the two-pass rank used —
otherwise the "same" shuffle differs between a 32-thread local run
and a 1000-executor cluster.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from orders_kafka_streams_spark.operators.sampling import (
    N_SHARDS,
    global_shuffle,
)
from orders_kafka_streams_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id").persist()


@pytest.fixture(scope="module")
def baseline(docs):
    return {r["doc_id"]: (r["shuffle_pos"], r["shard"], r["pos_in_shard"])
            for r in global_shuffle(docs).collect()}


def test_permutation_is_a_bijection(baseline):
    n = len(baseline)
    assert sorted(p for p, _, _ in baseline.values()) == list(range(1, n + 1))


def test_shards_are_contiguous_blocks(baseline):
    """shard/pos_in_shard are pure functions of shuffle_pos and the
    block size — contiguous equal blocks, so a shard reader streams
    one position range."""
    n = len(baseline)
    block = -(-n // N_SHARDS)
    for pos, shard, pis in baseline.values():
        assert shard == (pos - 1) // block
        assert pis == (pos - 1) % block + 1


def test_stripe_count_invariance(docs, baseline):
    """The two-pass rank's range-partition count is a parallelism
    knob, never a semantics knob: 8 or 64 stripes produce the
    identical permutation (hence identical shard boundaries)."""
    for n_parts in (8, 64):
        got = {r["doc_id"]: (r["shuffle_pos"], r["shard"], r["pos_in_shard"])
               for r in global_shuffle(docs, n_parts=n_parts).collect()}
        assert got == baseline


def test_input_partitioning_invariance(docs, baseline):
    """Repartitioning / pre-sorting the input corpus must not change
    the permutation — the shuffle key is a pure function of doc_id."""
    scrambled = docs.repartition(7).sortWithinPartitions(F.desc("doc_id"))
    got = {r["doc_id"]: (r["shuffle_pos"], r["shard"], r["pos_in_shard"])
           for r in global_shuffle(scrambled).collect()}
    assert got == baseline


def test_actually_permutes(baseline):
    """The hash order must differ from insertion order (a permutation
    that equals doc_id order would mean the seed hash never applied)."""
    by_doc = sorted(baseline)  # doc_id ascending
    pos_seq = [baseline[d][0] for d in by_doc]
    assert pos_seq != sorted(pos_seq)
