"""Property-based check: the union+carry gap-fill/LOCF resample is
equivalent to an independent pandas reference (hourly grid per user +
merge_asof backward with (ts, event_id) tie order) on arbitrary
inputs — not just the events fixture."""

from __future__ import annotations

import pandas as pd

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.timeseries import gapfill_locf

ROW = st.tuples(
    st.integers(min_value=0, max_value=2),           # user
    st.integers(min_value=0, max_value=10_000_000),  # ts offset ms (~2.8 h)
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
)
BASE = 1_700_000_000_000_000  # µs


def _pandas_reference(rows) -> dict:
    """Per-user (n_hours, n_empty, checksum) via an independent pandas
    LOCF: grid = hourly range over [trunc(min), trunc(max)]; each grid
    point takes the LAST event (by (ts, event_id) order) with ts ≤ t."""
    pdf = pd.DataFrame(
        [
            {
                "event_id": i,
                "user_id": u,
                "ts": pd.Timestamp(BASE // 1000 + ms, unit="ms"),
                "value": float(v),
            }
            for i, (u, ms, v) in enumerate(rows)
        ]
    )
    out = {}
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        grid = pd.date_range(
            g["ts"].min().floor("h"), g["ts"].max().floor("h"), freq="h"
        )
        filled = []
        for t in grid:
            prior = g[g["ts"] <= t]
            filled.append(float(prior["value"].iloc[-1]) if len(prior) else None)
        vals = [x for x in filled if x is not None]
        out[u] = (
            len(grid),
            sum(1 for x in filled if x is None),
            round(sum(vals), 4) if vals else None,
        )
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(ROW, min_size=1, max_size=30))
def test_gapfill_matches_pandas_locf(spark, rows):
    data = [
        (i, BASE + ms * 1000, u, float(v)) for i, (u, ms, v) in enumerate(rows)
    ]
    ev = (
        spark.createDataFrame(
            data, "event_id long, ts_us long, user_id long, value double"
        )
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .drop("ts_us")
    )
    got = {
        r["user_id"]: (r["n_hours"], r["n_empty"], r["locf_checksum"])
        for r in gapfill_locf(ev).collect()
    }
    want = _pandas_reference(rows)
    assert set(got) == set(want)
    for u in want:
        gh, ge, gc = got[u]
        wh, we, wc = want[u]
        assert (gh, ge) == (wh, we), (u, got[u], want[u])
        if wc is None:
            assert gc is None, (u, got[u], want[u])
        else:
            assert gc is not None and abs(gc - wc) < 1e-6, (u, got[u], want[u])
