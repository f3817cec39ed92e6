"""Source-format breadth: the same query code runs over parquet, JSON,
and CSV inputs (explicit schemas — no inference in the engine), and
join-strategy hints are honored."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from orders_kafka_streams_spark.plans import explain_str
from orders_kafka_streams_spark.schemas import EVENTS
from orders_kafka_streams_spark.sources.tables import load_table


def _events_sample(spark, sf_dir):
    return load_table(spark, sf_dir, "events").limit(500)


def test_json_source_roundtrip(spark, sf_dir, tmp_path):
    ev = _events_sample(spark, sf_dir)
    path = os.path.join(str(tmp_path), "events_json")
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema(EVENTS).json(path)
    assert back.count() == ev.count()
    a = sorted(map(str, back.select("event_id", "event_type", "user_id").collect()))
    b = sorted(map(str, ev.select("event_id", "event_type", "user_id").collect()))
    assert a == b


def test_csv_source_roundtrip(spark, sf_dir, tmp_path):
    ev = _events_sample(spark, sf_dir).drop("props")  # commas inside JSON props
    path = os.path.join(str(tmp_path), "events_csv")
    ev.write.mode("overwrite").option("header", True).csv(path)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    back = spark.read.schema(schema).option("header", True).csv(path)
    assert back.count() == ev.count()
    assert back.agg(F.sum("user_id")).collect() == ev.agg(F.sum("user_id")).collect()


def test_orc_source_roundtrip(spark, sf_dir, tmp_path):
    ev = _events_sample(spark, sf_dir)
    path = os.path.join(str(tmp_path), "events_orc")
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == ev.count()
    # ORC carries the schema; predicate pushdown works like parquet
    pruned = back.filter(F.col("event_type") == "click").select("event_id")
    assert "PushedFilters" in pruned._jdf.queryExecution().executedPlan().toString() or (
        pruned.count() == ev.filter(F.col("event_type") == "click").count()
    )
    assert back.agg(F.sum("user_id")).collect() == ev.agg(F.sum("user_id")).collect()


def test_join_strategy_hints_respected(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    shuffle_hash = li.join(supp.hint("SHUFFLE_HASH"), li.l_suppkey == supp.s_suppkey)
    assert "ShuffledHashJoin" in explain_str(shuffle_hash)
    merge = li.join(supp.hint("MERGE"), li.l_suppkey == supp.s_suppkey)
    assert "SortMergeJoin" in explain_str(merge)
    bcast = li.join(supp.hint("BROADCAST"), li.l_suppkey == supp.s_suppkey)
    assert "BroadcastHashJoin" in explain_str(bcast)
