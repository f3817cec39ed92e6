"""SCD2 and Z-order structural invariants on crafted fixtures — the
oracle parity for q_scd2/q_zorder_layout checks the real tables; these
pin the corner semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.warehouse import Z_BITS, scd2, zorder_key


def _events(spark, rows):
    """rows: (event_id, ms, user_id, event_type)"""
    epoch = datetime.datetime(1970, 1, 1)
    return spark.createDataFrame(
        [
            (eid, epoch + datetime.timedelta(milliseconds=ms), uid, et, 0.0, "{}")
            for eid, ms, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_scd2_flip_flop_creates_new_version(spark):
    # A at t0-t1, B at t2, A again at t3: the return to A is a NEW
    # version (SCD2 never reopens a closed one)
    ev = _events(
        spark,
        [(1, 0, 7, "A"), (2, 1000, 7, "A"), (3, 2000, 7, "B"), (4, 3000, 7, "A")],
    )
    out = sorted(scd2(ev).collect(), key=lambda r: r.version)
    assert [(r.version, r.event_type, r.n_events) for r in out] == [
        (1, "A", 2),
        (2, "B", 1),
        (3, "A", 1),
    ]
    # contiguity: each version's valid_to is the next's valid_from
    assert [(r.valid_from_ms, r.valid_to_ms) for r in out] == [
        (0, 2000),
        (2000, 3000),
        (3000, None),
    ]
    assert [r.is_current for r in out] == [False, False, True]


def test_scd2_exactly_one_current_per_user(spark, sf_dir):
    from orders_kafka_streams_spark.operators.warehouse import _q_scd2

    cur = (
        _q_scd2(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
        .filter(F.col("n_cur") != 1)
        .count()
    )
    assert cur == 0


def test_scd2_pit_no_future_leakage(spark, monkeypatch, tmp_path):
    """A fact picks the version in effect AT its time: before the first
    state event → NULL; between changes → the latest start ≤ fact ts;
    never a later version (leakage)."""
    import orders_kafka_streams_spark.operators.warehouse as wh
    from orders_kafka_streams_spark.operators.warehouse import _q_scd2_pit

    ev = _events(
        spark,
        [
            (1, 500, 7, "purchase"),   # before any state -> NULL
            (2, 1000, 7, "signup"),    # state v1
            (3, 1500, 7, "purchase"),  # -> v1 signup
            (4, 2000, 7, "error"),     # state v2
            (5, 2500, 7, "purchase"),  # -> v2 error
        ],
    )
    monkeypatch.setattr(wh, "load_table", lambda spark, sf_dir, name: ev)
    out = {r.event_id: (r.pit_version, r.pit_state) for r in _q_scd2_pit(spark, "ignored").collect()}
    assert out == {1: (None, None), 3: (1, "signup"), 5: (2, "error")}


def _z_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    pts = [(x, y) for x in (0, 1, 5, 31, 63) for y in (0, 2, 17, 63)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _z_ref(r.x, r.y, Z_BITS), (r.x, r.y)


def test_zorder_key_is_a_bijection_on_the_grid(spark):
    n = 1 << Z_BITS
    df = (
        spark.range(n * n)
        .select((F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
        .select(zorder_key(F.col("x"), F.col("y")).alias("z"))
    )
    assert df.distinct().count() == n * n
    mm = df.agg(F.min("z").alias("lo"), F.max("z").alias("hi")).first()
    assert (mm.lo, mm.hi) == (0, n * n - 1)
