"""Generic as-of join — an operator Spark lacks natively (SURVEY §2.9).

``asof_join(left, right, ...)`` matches each left row with the right
row nearest its timestamp (per key, optional tolerance) in the chosen
``direction`` — backward (at-or-before, the default), forward
(at-or-after) or nearest — the full surface of pandas ``merge_asof``
/ kdb ``aj`` / QuestDB ``ASOF JOIN``.

Scale design — union + carry instead of join or applyInPandas: both
sides are unioned with a side marker, shuffled ONCE on the key,
sorted within partitions on (ts, side), and the right payload is
carried with ``last(..., ignorenulls)`` over a running-prefix frame
(backward) or ``first(...)`` over a running-suffix frame (forward).
Cost is one exchange + one sort per needed direction — O(n log
n_partition) with no candidate-pair blowup (a range self-join is
quadratic per key) and no Python (a per-group ``merge_asof`` via
applyInPandas pays Arrow transfer on 100% of rows). ``nearest`` runs
both carries over the SAME key partitioning — still one exchange,
two in-partition sorts. Skewed keys are split by AQE; prefix/suffix
frames stream without buffering whole partitions.
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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row nearest its timestamp
    on the same key: the latest with ``right.ts <= left.ts``
    (backward), the earliest with ``right.ts >= left.ts`` (forward),
    or whichever of the two is closer (nearest; exact ties go
    backward — pinned, deterministic).

    Unmatched (or out-of-tolerance) left rows survive with null
    payload columns — left-outer semantics, like ``merge_asof``.
    ``order_col`` (a column present on both sides, e.g. an event id)
    makes tie order among equal timestamps deterministic.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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
    tiebreak = [F.col(order_col)] if order_col else []

    # backward: right rows at the SAME ts sort before the left row so
    # the prefix frame sees them; forward mirrors with side desc so the
    # suffix frame starting at the left row still covers same-ts rights.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_side"), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_side").desc(), *tiebreak)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def carry_back(c: Column) -> Column:
        return F.last(F.when(F.col("_side") == 0, c), ignorenulls=True).over(w_back)

    def carry_fwd(c: Column) -> Column:
        return F.first(F.when(F.col("_side") == 0, c), ignorenulls=True).over(w_fwd)

    def within_of(m_ts: Column, back: bool) -> Column:
        ok = m_ts.isNotNull()
        if tolerance_ms is not None:
            delta = (
                epoch_ms(F.col("_ats")) - epoch_ms(m_ts)
                if back
                else epoch_ms(m_ts) - epoch_ms(F.col("_ats"))
            )
            ok = ok & (delta <= tolerance_ms)
        return ok

    if direction in ("backward", "forward"):
        back = direction == "backward"
        carry = carry_back if back else carry_fwd
        within = within_of(carry(F.col("_ats")), back)
        out = u.withColumn(f"_ts{suffix}", F.when(within, carry(F.col("_ats"))))
        for p in payload:
            out = out.withColumn(f"{p}{suffix}", F.when(within, carry(F.col(f"{p}{suffix}"))))
    else:  # nearest
        # r11 (guide §2.4): ONE struct carry per direction over the SAME
        # ascending (ts, side, tiebreak) order — the forward carry uses a
        # running-suffix frame on that order instead of the side-desc
        # mirror sort, so the whole query plans one Sort + one Window
        # node (was 4 sorts + 4 Window nodes: asc/desc sort flips × the
        # ts-then-payload re-derivation). The suffix frame from a left
        # row excludes same-ts right rows (they sort BEFORE it under
        # side asc); harmless: when a same-ts right exists the backward
        # carry matches at delta 0, so choose_back is always taken and
        # the forward carry's view of same-ts rows never reaches the
        # output (ties go backward by the pinned rule either way).
        def side_struct() -> Column:
            return F.when(
                F.col("_side") == 0,
                F.struct(
                    F.col("_ats").alias("_m_ts"),
                    *[F.col(f"{p}{suffix}").alias(p) for p in payload],
                ),
            )

        w_fwd_same = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ats"), F.col("_side"), *tiebreak)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        out = u.withColumn(
            "_b", F.last(side_struct(), ignorenulls=True).over(w_back)
        ).withColumn("_f", F.first(side_struct(), ignorenulls=True).over(w_fwd_same))
        b_ts, f_ts = F.col("_b._m_ts"), F.col("_f._m_ts")
        b_ok, f_ok = within_of(b_ts, True), within_of(f_ts, False)
        # backward wins exact ties: back delta <= forward delta
        choose_back = b_ok & (
            ~f_ok
            | (
                (epoch_ms(F.col("_ats")) - epoch_ms(b_ts))
                <= (epoch_ms(f_ts) - epoch_ms(F.col("_ats")))
            )
        )
        out = out.withColumn(
            f"_ts{suffix}",
            F.when(choose_back, b_ts).when(f_ok, f_ts),
        )
        for p in payload:
            out = out.withColumn(
                f"{p}{suffix}",
                F.when(choose_back, F.col(f"_b.{p}")).when(f_ok, F.col(f"_f.{p}")),
            )
        out = out.drop("_b", "_f")
    return (
        out.filter(F.col("_side") == 1)
        .withColumn(f"ts{suffix}", F.col(f"_ts{suffix}"))
        .drop("_ats", "_side", f"_ts{suffix}")
    )
