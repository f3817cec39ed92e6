"""The DQ audit must FAIL on violating data — a constraint suite that
can only pass verifies nothing. Crafted tables inject one violation
per check; oracle parity covers the all-green path on the real data."""

from __future__ import annotations

import datetime

import orders_kafka_streams_spark.operators.dq as dq
from orders_kafka_streams_spark.operators.dq import dq_audit


def _tables(spark):
    epoch = datetime.datetime(1970, 1, 1)

    def ts(ms):
        return epoch + datetime.timedelta(milliseconds=ms)

    events = spark.createDataFrame(
        [
            # duplicate event_id (uniqueness), one NULL value
            # (completeness), one off-domain event_type
            (1, ts(0), 1, "click", 1.0, "{}"),
            (1, ts(1), 1, "view", None, "{}"),
            (2, ts(2), 2, "teleport", 2.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orders = spark.createDataFrame(
        # custkey 99 has no customer row (RI); negative totalprice
        [(10, 1, "O", -5.0), (11, 99, "F", 3.0)],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(1, "Customer#1", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    return {"events": events, "orders": orders, "customer": customer}


def test_every_check_fails_on_violating_data(spark, monkeypatch):
    tabs = _tables(spark)
    monkeypatch.setattr(dq, "load_table", lambda spark, sf_dir, name: tabs[name])
    out = {r.check: r for r in dq_audit(spark, "ignored").collect()}
    assert set(out) == set(dq.THRESHOLDS)
    assert all(not r.passed for r in out.values()), {
        k: (r.metric, r.passed) for k, r in out.items()
    }
    # metrics are the exact violation fractions
    assert out["uniqueness_events_event_id"].metric == round(2 / 3, 6)
    assert out["completeness_events_value"].metric == round(2 / 3, 6)
    assert out["ri_orders_custkey"].metric == 0.5
    assert out["domain_events_event_type"].metric == round(2 / 3, 6)
    assert out["nonneg_orders_totalprice"].metric == 0.5
