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


def test_decode_golden_rows(spark):
    """Golden-row contract for the decode stub (VERDICT r1 item 9):
    fixed payloads → exact hand-computed features. Determinism alone
    can't catch a silently changed kernel; these literals pin the
    byte→feature arithmetic (width = 16 + n%64, height = 16 + (n//64)%64,
    n_frames = 1 + n%3, mean_luma = sum(first 32 bytes) % 256 / 255)
    so any drift in the stub — or a real-codec swap that breaks the
    Arrow plumbing — fails on exact values, not just row counts."""
    import pytest

    m = spark.createDataFrame(
        [
            (1, bytearray(b"hello world")),
            (2, bytearray(b"")),
            (3, bytearray(bytes([7]) * 200)),
        ],
        "doc_id long, media binary",
    )
    got = {r.doc_id: r for r in decode_media(m).collect()}
    assert len(got) == 3
    # b"hello world": n=11, byte sum 1116
    r = got[1]
    assert (r.byte_len, r.width, r.height, r.n_frames) == (11, 27, 16, 3)
    assert r.mean_luma == pytest.approx(92 / 255.0, rel=1e-12)
    # empty payload: all floors
    r = got[2]
    assert (r.byte_len, r.width, r.height, r.n_frames) == (0, 16, 16, 1)
    assert r.mean_luma == 0.0
    # 200 × 0x07: exercises the //64 height band and the 32-byte luma cap
    r = got[3]
    assert (r.byte_len, r.width, r.height, r.n_frames) == (200, 24, 19, 3)
    assert r.mean_luma == pytest.approx(224 / 255.0, rel=1e-12)
