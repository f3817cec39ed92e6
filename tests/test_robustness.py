from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.operators.robustness import (
    _q_approx_distinct,
    poisoned_events,
    PROPS_SCHEMA,
)
from orders_kafka_streams_spark.sources.json_edge import decode_json, json_encode


def test_approx_distinct_error_bound(spark, sf_dir):
    rows = _q_approx_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_orders - r.exact_orders) / max(r.exact_orders, 1)
        assert rel_err < 0.05, (r.l_returnflag, r.approx_orders, r.exact_orders)


def test_decode_json_routes_corrupt_rows(spark, sf_dir):
    raw = poisoned_events(spark, sf_dir)
    good, corrupt = decode_json(raw, PROPS_SCHEMA, "value", keep_cols=("event_id",))
    n_total = raw.count()
    n_good, n_corrupt = good.count(), corrupt.count()
    assert n_good + n_corrupt == n_total  # nothing dropped, nothing crashed
    assert n_corrupt == raw.filter(F.col("event_id") % 100 == 0).count()
    # corrupt rows keep the raw payload for a dead-letter sink
    assert corrupt.columns == ["event_id", "raw"]
    assert good.filter(F.col("k").isNull()).count() == 0


def test_json_roundtrip(spark, sf_dir):
    # encode → decode is lossless for well-formed rows (serde parity with
    # the reference's Gson round-trip, JsonObjectSerde.java:26-50)
    from orders_kafka_streams_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    encoded = json_encode(ev, key_col="event_id")
    assert encoded.columns == ["key", "value"]
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    good, corrupt = decode_json(encoded, schema, "value", keep_cols=("key",))
    assert corrupt.count() == 0
    assert good.count() == ev.count()


def test_approx_percentile_error_bound(spark, sf_dir):
    # KLL-style sketch at accuracy=1000: the approx quantile must land
    # within 2% (value-relative) of the exact quantile on this
    # distribution — same failing-mode pattern as the HLL gate above.
    from orders_kafka_streams_spark.operators.robustness import _q_approx_percentile

    rows = _q_approx_percentile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for ap, ex in ((r.ap50, r.p50), (r.ap90, r.p90)):
            assert abs(ap - ex) / max(abs(ex), 1e-9) < 0.02, (r.o_orderstatus, ap, ex)
