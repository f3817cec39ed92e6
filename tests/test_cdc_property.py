"""Content-defined chunking properties (operators/dedup.py::cdc_chunks).

The reason CDC exists: chunk boundaries depend only on content, so a
passage shared by two documents produces the same chunk hashes wherever
it appears (fixed-size chunking breaks on any offset shift). Only the
chunks touching the passage's edges may differ (they mix in surrounding
text).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.dedup import cdc_chunks


def _chunks_of(spark, texts):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], ["doc_id", "text"])
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    out = (
        df.select("doc_id", toks.alias("t"))
        .select("doc_id", F.explode(cdc_chunks(F.col("t"))).alias("c"))
        .select("doc_id", "c.ch", "c.ln")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.ch, r.ln))
    return by_doc


def test_shared_passage_chunks_identically_at_any_offset(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    passage = [rng.choice(vocab) for _ in range(300)]
    prefix_a = [rng.choice(vocab) for _ in range(41)]
    prefix_b = [rng.choice(vocab) for _ in range(97)]
    doc_a = " ".join(prefix_a + passage)
    doc_b = " ".join(prefix_b + passage)
    ch = _chunks_of(spark, [doc_a, doc_b])
    a = {h for h, _ in ch[0]}
    b = {h for h, _ in ch[1]}
    shared = a & b
    # all interior passage chunks coincide despite different offsets —
    # at least half of the smaller doc's chunks must be shared (only
    # the prefix chunks and the first boundary-straddling chunk differ)
    assert len(shared) >= min(len(a), len(b)) // 2, (len(shared), len(a), len(b))


def test_chunks_partition_the_token_stream(spark):
    rng = random.Random(11)
    text = " ".join(rng.choice([f"w{i}" for i in range(30)]) for _ in range(500))
    ch = _chunks_of(spark, [text])
    assert sum(ln for _, ln in ch[0]) == 500  # lossless partition
    assert all(ln > 0 for _, ln in ch[0])


def test_identical_docs_have_identical_chunk_sequences(spark):
    text = " ".join(f"tok{i % 17}" for i in range(200))
    ch = _chunks_of(spark, [text, text])
    assert ch[0] == ch[1]
