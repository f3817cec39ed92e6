"""Rows-only tests for the mapInPandas multimodal plumbing (no SQL
oracle — Python kernel)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_table,
)


def test_decode_deterministic_and_typed(spark, sf_dir):
    m = media_table(spark, sf_dir)
    d1 = decode_media(m).orderBy("doc_id").collect()
    d2 = decode_media(m).orderBy("doc_id").collect()
    assert d1 == d2
    assert len(d1) == m.count()
    for r in d1[:20]:
        assert 16 <= r.width < 80 and 16 <= r.height < 80
        assert 1 <= r.n_frames <= 3
        assert 0.0 <= r.mean_luma <= 1.0
        assert r.byte_len > 0


def test_decode_byte_len_matches_catalyst(spark, sf_dir):
    # the Python kernel and the Catalyst octet_length must agree
    m = media_table(spark, sf_dir)
    d = decode_media(m).select("doc_id", F.col("byte_len").alias("py_len"))
    joined = m.select("doc_id", "byte_len").join(d, "doc_id")
    assert joined.filter(F.col("byte_len") != F.col("py_len")).count() == 0


def test_frame_sample(spark, sf_dir):
    d = decode_media(media_table(spark, sf_dir))
    fs = frame_sample(d, every_n=2)
    rows = fs.collect()
    assert all(r.frame_idx % 2 == 0 for r in rows)
    # every item has frame 0
    assert fs.filter(F.col("frame_idx") == 0).count() == d.count()
