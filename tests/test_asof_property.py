"""Property-based check: the union+last-carry as-of join is equivalent
to pandas ``merge_asof`` (backward, with tolerance) on arbitrary
inputs — not just the events fixture."""

from __future__ import annotations

import pandas as pd
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.asof import asof_join

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),          # key
    st.integers(min_value=0, max_value=5_000_000),  # ts offset ms
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
)
BASE = 1_700_000_000_000_000  # µs


def _to_sdf(spark, rows, start_id):
    data = [
        (start_id + i, (BASE + ms * 1000), k, float(v)) for i, (k, ms, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, ts_us long, user_id long, value double")
    return df.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(ROW, min_size=1, max_size=25),
    right=st.lists(ROW, min_size=1, max_size=25),
    tol_s=st.sampled_from([1, 60, 3600]),
)
def test_asof_matches_pandas_merge_asof(spark, left, right, tol_s):
    ldf = _to_sdf(spark, left, 0)
    rdf = _to_sdf(spark, right, 10_000)
    got = asof_join(
        ldf,
        rdf,
        on=["user_id"],
        right_payload=["value"],
        order_col="event_id",
        tolerance_ms=tol_s * 1000,
    ).toPandas()

    lp = ldf.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    rp = (
        rdf.toPandas()
        .sort_values(["ts", "event_id"])
        # merge_asof takes the LAST row among equal timestamps per key —
        # matching our (ts, side, event_id) tie order requires the right
        # side deduped to the max event_id per (key, ts)
        .groupby(["user_id", "ts"], as_index=False)
        .last()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lp,
        rp.rename(columns={"value": "value_asof", "ts": "ts_asof", "event_id": "rid"}),
        left_on="ts",
        right_on="ts_asof",
        by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(seconds=tol_s),
    )

    def canon(eid, ts, val):
        ts_s = "~" if pd.isna(ts) else pd.Timestamp(ts).isoformat()
        val_s = "~" if pd.isna(val) else f"{round(float(val), 4):.4f}"
        return f"{eid}|{ts_s}|{val_s}"

    got_s = sorted(canon(r.event_id, r.ts_asof, r.value_asof) for r in got.itertuples())
    exp_s = sorted(canon(r.event_id, r.ts_asof, r.value_asof) for r in exp.itertuples())
    assert got_s == exp_s


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(ROW, min_size=1, max_size=25),
    right=st.lists(ROW, min_size=1, max_size=25),
    tol_s=st.sampled_from([60, 3600]),
)
def test_asof_forward_matches_pandas_merge_asof(spark, left, right, tol_s):
    ldf = _to_sdf(spark, left, 0)
    rdf = _to_sdf(spark, right, 10_000)
    got = asof_join(
        ldf,
        rdf,
        on=["user_id"],
        right_payload=["value"],
        order_col="event_id",
        tolerance_ms=tol_s * 1000,
        direction="forward",
    ).toPandas()

    lp = ldf.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    rp = (
        rdf.toPandas()
        .sort_values(["ts", "event_id"])
        # forward carry takes the FIRST right row among equal timestamps
        # ((ts, side desc, event_id) order) — dedupe to min event_id
        .groupby(["user_id", "ts"], as_index=False)
        .first()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lp,
        rp.rename(columns={"value": "value_asof", "ts": "ts_asof", "event_id": "rid"}),
        left_on="ts",
        right_on="ts_asof",
        by="user_id",
        direction="forward",
        tolerance=pd.Timedelta(seconds=tol_s),
    )

    def canon(eid, ts, val):
        ts_s = "~" if pd.isna(ts) else pd.Timestamp(ts).isoformat()
        val_s = "~" if pd.isna(val) else f"{round(float(val), 4):.4f}"
        return f"{eid}|{ts_s}|{val_s}"

    got_s = sorted(canon(r.event_id, r.ts_asof, r.value_asof) for r in got.itertuples())
    exp_s = sorted(canon(r.event_id, r.ts_asof, r.value_asof) for r in exp.itertuples())
    assert got_s == exp_s


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(ROW, min_size=1, max_size=25),
    right=st.lists(ROW, min_size=1, max_size=25),
    tol_s=st.sampled_from([60, 3600]),
)
def test_asof_nearest_matches_pandas_merge_asof(spark, left, right, tol_s):
    # unique (key, ts) on the right so tie-among-duplicates semantics
    # (engine-specific) can't leak into the comparison; the nearest
    # back-vs-forward tie rule itself (backward wins) matches pandas
    right = list({(k, ms): (k, ms, v) for k, ms, v in right}.values())
    ldf = _to_sdf(spark, left, 0)
    rdf = _to_sdf(spark, right, 10_000)
    got = asof_join(
        ldf,
        rdf,
        on=["user_id"],
        right_payload=["value"],
        order_col="event_id",
        tolerance_ms=tol_s * 1000,
        direction="nearest",
    ).toPandas()

    lp = ldf.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    rp = rdf.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    exp = pd.merge_asof(
        lp,
        rp.rename(columns={"value": "value_asof", "ts": "ts_asof", "event_id": "rid"}),
        left_on="ts",
        right_on="ts_asof",
        by="user_id",
        direction="nearest",
        tolerance=pd.Timedelta(seconds=tol_s),
    )

    def canon(eid, ts, val):
        ts_s = "~" if pd.isna(ts) else pd.Timestamp(ts).isoformat()
        val_s = "~" if pd.isna(val) else f"{round(float(val), 4):.4f}"
        return f"{eid}|{ts_s}|{val_s}"

    got_s = sorted(canon(r.event_id, r.ts_asof, r.value_asof) for r in got.itertuples())
    exp_s = sorted(canon(r.event_id, r.ts_asof, r.value_asof) for r in exp.itertuples())
    assert got_s == exp_s


@pytest.mark.parametrize("direction", ["empty_right"])
def test_asof_empty_right(spark, direction):
    ldf = _to_sdf(spark, [(1, 1000, 5.0)], 0)
    rdf = _to_sdf(spark, [(2, 500, 1.0)], 100)  # different key only
    out = asof_join(ldf, rdf, on=["user_id"], right_payload=["value"], order_col="event_id")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].value_asof is None and rows[0].ts_asof is None