"""StructType registry for the reference's event shapes.

The reference is schemaless (Gson ``JsonObject`` round-trips,
/root/reference/src/main/java/com/github/dhoard/orders/kafka/streams/JsonObjectSerde.java:26-50)
but its de-facto schemas are fixed (README.md:26-65). Here they are
explicit ``StructType``s: JSON is parsed ONCE at the edge with
``from_json`` and never carried as text through the plan.

Column-name convention: the reference uses dotted JSON keys
(``event.type``); we use snake_case columns (``event_type``) — dots
collide with Spark's nested-field syntax.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input topic `order` / `order-keyed` (reference README.md:28-46):
# order.placed / order.fulfilled events.
ORDER_EVENT = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_timestamp", T.LongType(), False),  # epoch ms
        T.StructField("facility_id", T.StringType(), False),
        T.StructField("order_id", T.StringType(), False),
    ]
)

# Internal topic `order-info` (reference OrderProcessor.java:139-143).
ORDER_INFO = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("facility_id", T.StringType(), False),
        T.StructField("order_id", T.StringType(), False),
        T.StructField("processing_ms", T.LongType(), False),
    ]
)

# Final output `facility-info-by-minute` (reference README.md:54-65, Main.java:170-203).
FACILITY_INFO_BY_MINUTE = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("facility_id", T.StringType(), False),
        T.StructField("processing_count", T.LongType(), False),
        T.StructField("processing_ms", T.LongType(), False),
        T.StructField("event_timestamp", T.LongType(), False),  # window end, epoch ms
    ]
)

# Driver test table `events` (TESTDATA.md / FIXTURES.md §B).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),  # JSON text, e.g. {"k": 87}
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "order_event": ORDER_EVENT,
    "order_info": ORDER_INFO,
    "facility_info_by_minute": FACILITY_INFO_BY_MINUTE,
    "events": EVENTS,
}
