"""Reconstruction-error bound for int8 scalar quantization — the part
of q_emb_quantize that is NOT hash-diffable (per-element codes flip on
1-ulp floor boundaries between engines; see the operator docstring).
Half-up rounding guarantees every residual is at most scale/2, so mse
in code units is bounded by 0.25; codes must stay inside int8."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_kafka_streams_spark.sources.tables import load_table, parallelize


def test_quantization_error_bound_and_code_range(spark, sf_dir):
    emb = parallelize(load_table(spark, sf_dir, "embeddings"))
    v = F.col("embedding")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / 127.0
    base = emb.select("vec_id", v.alias("v"), scale.alias("scale"))
    sc = F.col("scale")
    codes = F.transform(F.col("v"), lambda x: F.floor(x.cast("double") / sc + 0.5).cast("int"))
    err = F.zip_with(
        F.col("v"),
        codes,
        lambda x, c: (x.cast("double") - c * sc) * (x.cast("double") - c * sc),
    )
    mse_cu = (
        F.aggregate(err, F.lit(0.0), lambda a, x: a + x) / F.size(F.col("v")) / (sc * sc)
    )
    stats = base.select(
        F.max(mse_cu).alias("worst_mse"),
        F.max(F.array_max(codes)).alias("max_code"),
        F.min(F.array_min(codes)).alias("min_code"),
    ).collect()[0]
    assert stats.worst_mse <= 0.25 + 1e-9
    assert stats.max_code <= 127 and stats.min_code >= -127
