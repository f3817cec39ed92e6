"""Adversarial skew fixtures for the co-occurrence family (VERDICT r5
item 1). The uncapped query's scale posture is the a-priori semi-join
(lossless frequent-item pruning before the pair self-join); the capped
variant is the EXPLICIT truncation for a power user whose basket is
individually-frequent items. Both are pinned here on a corpus built to
hurt: six power users sharing a 500-item basket, a long rare-item tail
(pruned losslessly), and a crowd of small normal baskets.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from orders_kafka_streams_spark.operators.timeseries import (
    COOC_BASKET_CAP,
    COOC_MIN_SUPPORT,
    ORACLE as TS_ORACLE,
    _q_item_cooccurrence,
    _q_item_cooccurrence_capped,
)
from tests.oracle_harness import TABLES, compare

SF = "/root/testdata/sf0.01"

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

N_POWER = 6  # >= MIN_SUPPORT so the shared 500-item basket is ALL frequent
POWER_ITEMS = 500
N_NORMAL = 200
N_RARE = 500  # one holder each -> below MIN_SUPPORT, semi-join prunes


def _touch(user: int, item: int, eid: int):
    import datetime

    return (
        eid,
        datetime.datetime(2024, 1, 1, 12, 0, 0),
        user,
        "view",
        1.0,
        '{"k": %d}' % item,
    )


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    """sf0.01 with events REPLACED by the adversarial basket corpus
    (other tables symlinked so the oracle harness can bind its views)."""
    d = tmp_path_factory.mktemp("cooc_skew")
    for t in TABLES:
        if t != "events":
            os.symlink(os.path.join(SF, f"{t}.parquet"), str(d / f"{t}.parquet"))
    rows, eid = [], 0
    for p in range(N_POWER):
        for item in range(POWER_ITEMS):
            rows.append(_touch(900_000 + p, item, eid))
            eid += 1
    for u in range(N_NORMAL):
        for item in {u % 50, (u * 7 + 3) % 50, (u * 13 + 11) % 50}:
            rows.append(_touch(100_000 + u, item, eid))
            eid += 1
    for i in range(N_RARE):
        rows.append(_touch(500_000 + i, 10_000 + i, eid))
        eid += 1
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # single FILE (not a Spark part-dir): the DuckDB oracle views bind
    # read_parquet('<dir>/events.parquet') exactly like the driver's
    pdf.to_parquet(str(d / "events.parquet"), index=False)
    return str(d)


def test_apriori_semijoin_is_lossless_on_skew(spark, skew_dir):
    """The Spark plan prunes rare items BEFORE the self-join; the
    oracle SQL does not prune at all. Identical answers on a corpus
    where the pruned tail is 500 of 1000 items = the semi-join is
    lossless, not approximately so."""
    ok, msg = compare(
        _q_item_cooccurrence(spark, skew_dir),
        TS_ORACLE["q_item_cooccurrence"],
        skew_dir,
    )
    assert ok, msg


def test_capped_matches_its_oracle_on_skew(spark, skew_dir):
    ok, msg = compare(
        _q_item_cooccurrence_capped(spark, skew_dir),
        TS_ORACLE["q_item_cooccurrence_capped"],
        skew_dir,
    )
    assert ok, msg


def test_cap_bounds_power_user_fanout(spark, skew_dir):
    """With the cap, a power user's 500-item (all-frequent) basket
    enters the pair stage as its CAP smallest item ids only — so no
    qualifying pair can mention an item beyond rank CAP. The uncapped
    query DOES surface such pairs (they exist with n_ab = N_POWER),
    proving the cap is doing real truncation, not vacuously passing."""
    assert N_POWER >= COOC_MIN_SUPPORT  # fixture invariant the test relies on
    capped = _q_item_cooccurrence_capped(spark, skew_dir).collect()
    assert capped, "capped query returned nothing on the skew corpus"
    assert max(max(r.ia, r.ib) for r in capped) < COOC_BASKET_CAP
    uncapped = _q_item_cooccurrence(spark, skew_dir).collect()
    assert any(
        max(r.ia, r.ib) >= COOC_BASKET_CAP for r in uncapped
    ), "fixture too weak: uncapped top-k never left the capped range"
