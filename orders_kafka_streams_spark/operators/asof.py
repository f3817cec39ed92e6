"""Generic as-of join — an operator Spark lacks natively (SURVEY §2.9).

``asof_join(left, right, ...)`` matches each left row with the most
recent right row at-or-before its timestamp (per key, optional
tolerance), the shape of pandas ``merge_asof`` / kdb ``aj`` /
QuestDB ``ASOF JOIN``.

Scale design — union + last-carry instead of join or applyInPandas:
both sides are unioned with a side marker, shuffled ONCE on the key,
sorted within partitions on (ts, side), and the right payload is
carried forward with ``last(..., ignorenulls)``. Cost is one exchange
+ one sort — O(n log n_partition) with no candidate-pair blowup (a
range self-join is quadratic per key) and no Python (a per-group
``merge_asof`` via applyInPandas pays Arrow transfer on 100% of
rows). Skewed keys are split by AQE; the window's frame is
running-prefix so Spark streams it without buffering whole partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import epoch_ms


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    order_col: str | None = None,
    tolerance_ms: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same key (backward as-of).

    Unmatched (or out-of-tolerance) left rows survive with null
    payload columns — left-outer semantics, like ``merge_asof``.
    ``order_col`` (a column present on both sides, e.g. an event id)
    makes tie order among equal timestamps deterministic.
    """
    on = list(on)
    payload = list(right_payload)
    l2 = left.withColumn("_ats", F.col(left_ts)).withColumn("_side", F.lit(1))
    r2 = (
        right.select(
            *on,
            F.col(right_ts).alias("_ats"),
            F.lit(0).alias("_side"),
            *([order_col] if order_col and order_col not in on else []),
            *[F.col(p).alias(f"{p}{suffix}") for p in payload],
        )
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    order: list[Column] = [F.col("_ats"), F.col("_side")]
    if order_col:
        order.append(F.col(order_col))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(c: Column) -> Column:
        return F.last(F.when(F.col("_side") == 0, c), ignorenulls=True).over(w)

    matched_ts = carry(F.col("_ats"))
    within = matched_ts.isNotNull()
    if tolerance_ms is not None:
        within = within & ((epoch_ms(F.col("_ats")) - epoch_ms(matched_ts)) <= tolerance_ms)

    out = u.withColumn(f"_ts{suffix}", F.when(within, matched_ts))
    for p in payload:
        out = out.withColumn(f"{p}{suffix}", F.when(within, carry(F.col(f"{p}{suffix}"))))
    return (
        out.filter(F.col("_side") == 1)
        .withColumn(f"ts{suffix}", F.col(f"_ts{suffix}"))
        .drop("_ats", "_side", f"_ts{suffix}")
    )
