"""Streaming EWMA: per-user exponentially weighted moving average as a
stateful streaming operator (SURVEY §2.8 tier; batch twin: q_ewma in
operators/timeseries.py).

The recurrence ewma_t = α·x_t + (1−α)·ewma_{t−1} needs exactly one
double of state per key — the canonical applyInPandasWithState shape:
state stays O(keys) regardless of stream length, each micro-batch folds
its rows in event-time order and emits one row per input event with the
running value (the monitoring stream a drift dashboard consumes).

The reference has no equivalent operator; its only stateful kernel is
the pair matcher (OrderProcessor.java:99-154). This reuses that
operator's plumbing for a numeric recurrence.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_ALPHA = 0.3  # matches operators/timeseries.EWMA_ALPHA (batch twin)

OUTPUT_SCHEMA = "user_id long, event_id long, ts_ms long, value double, ewma double, n long"
STATE_SCHEMA = "ewma double, n long"


def stream_ewma(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """events (streaming, with ``ts``/``user_id``/``value``) → one row
    per event carrying the running per-user EWMA.

    Kernel is self-contained (builtins + pandas only) so workers
    unpickle it without importing this package. NoTimeout: the state is
    a live per-user statistic, not a buffer with an expiry policy.
    """

    def folder(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ewma, n = state.get if state.exists else (None, 0)
        # materialize BEFORE the emptiness check: `if pdfs` on an
        # iterator is always truthy, so the old guard never protected
        # pd.concat([]) from raising on an empty chunk stream.
        chunks = list(pdfs)
        rows = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not len(rows):
            yield pd.DataFrame(
                columns=["user_id", "event_id", "ts_ms", "value", "ewma", "n"]
            )
            return
        rows = rows.sort_values(["ts_ms", "event_id"]).reset_index(drop=True)
        vals = rows["value"].astype(float)
        # pandas ewm(adjust=False) runs the SAME recursion
        # y_t = (1-α)·y_{t-1} + α·x_t in C — bit-identical to the
        # per-row Python fold (multiplications share operands, IEEE
        # addition is commutative; exactness is unit-asserted in
        # tests/test_streaming.py). Prior state seeds via a prepended
        # synthetic row. Raw (unrounded) ewma: rounding happens
        # engine-side in the consuming query.
        if ewma is None:
            e = vals.ewm(alpha=alpha, adjust=False).mean()
        else:
            seeded = pd.concat([pd.Series([float(ewma)]), vals], ignore_index=True)
            e = seeded.ewm(alpha=alpha, adjust=False).mean().iloc[1:].reset_index(drop=True)
        k = len(rows)
        out = pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": rows["event_id"].astype("int64"),
                "ts_ms": rows["ts_ms"].astype("int64"),
                "value": vals,
                "ewma": e.to_numpy(),
                "n": n + pd.RangeIndex(1, k + 1).to_numpy(),
            }
        )
        state.update((float(e.iloc[-1]), n + k))
        yield out

    prepared = events.selectExpr(
        "user_id", "event_id", "value", "unix_millis(CAST(ts AS TIMESTAMP)) AS ts_ms"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        folder,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
