"""Property check: the binned range join equals the naive theta join
(equi key + `start <= ts < end` residual) on arbitrary inputs — the
binning prefilter must be lossless at every bin alignment, including
intervals straddling bin boundaries and zero-width intervals."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from orders_kafka_streams_spark.functions.portable import epoch_ms
from orders_kafka_streams_spark.operators.timeseries import BIN_MS, range_join

BASE_MS = 1_700_000_000_000

IV = st.tuples(
    st.integers(min_value=0, max_value=3),              # key
    st.integers(min_value=0, max_value=4 * BIN_MS),     # start offset
    st.integers(min_value=0, max_value=2 * BIN_MS),     # width
)
PT = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=6 * BIN_MS),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(intervals=st.lists(IV, min_size=1, max_size=12), points=st.lists(PT, min_size=1, max_size=30))
def test_binned_range_join_equals_theta_join(spark, intervals, points):
    idf = spark.createDataFrame(
        [(i, k, BASE_MS + s, BASE_MS + s + w) for i, (k, s, w) in enumerate(intervals)],
        "interval_id long, user_id long, start_ms long, end_ms long",
    )
    pdf = spark.createDataFrame(
        [(j, k, BASE_MS + o) for j, (k, o) in enumerate(points)],
        "pt_id long, user_id long, off_ms long",
    ).select("pt_id", "user_id", F.timestamp_millis("off_ms").alias("ts"))

    got = sorted(
        (r.interval_id, r.pt_id)
        for r in range_join(idf, pdf, key="user_id").select("interval_id", "pt_id").collect()
    )
    naive = sorted(
        (r.interval_id, r.pt_id)
        for r in idf.join(
            pdf.withColumn("pm", epoch_ms(F.col("ts"))),
            (idf.user_id == pdf.user_id)
            & (F.col("pm") >= F.col("start_ms"))
            & (F.col("pm") < F.col("end_ms")),
        )
        .select("interval_id", "pt_id")
        .collect()
    )
    assert got == naive
