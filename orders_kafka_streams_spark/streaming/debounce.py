"""Streaming debounce: per-(user, event_type) duplicate-fire flagging
as a stateful streaming operator (batch twin: q_debounce in
operators/timeseries.py).

State per key is the LAST raw event's timestamp — one int64 per
(user, type), O(keys) regardless of stream length. Each micro-batch
folds its rows in event-time order, seeds the gap of its first row
from the carried state, and emits every row with a dropped flag, so
the union of all batches' flags equals the batch lag-window form
however the stream is split (tests/test_stream_debounce.py asserts
1-batch ≡ k-batch ≡ batch oracle). Throttle semantics — the gap is
measured from the previous RAW event, matching the batch twin.

The reference has no equivalent operator; this reuses the
applyInPandasWithState plumbing of streaming/transitions.py (the same
last-row cursor, carrying one timestamp instead of an event triple).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_id long, event_type string, dropped long"
STATE_SCHEMA = "ts_ms long"


def stream_debounce(events: DataFrame, gap_ms: int) -> DataFrame:
    """events (streaming, with ``ts``/``user_id``/``event_type``) → one
    row per event with its debounce verdict.

    Kernel is self-contained (builtins + pandas only) so workers
    unpickle it without importing this package. NoTimeout: the carried
    timestamp is a live cursor, not an expiring buffer.
    """

    def folder(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev_ts = state.get[0] if state.exists else None
        chunks = list(pdfs)
        rows = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not len(rows):
            yield pd.DataFrame(columns=["event_id", "event_type", "dropped"])
            return
        rows = rows.sort_values(["ts_ms", "event_id"]).reset_index(drop=True)
        ts = rows["ts_ms"].astype("int64").tolist()
        prevs = [prev_ts] + ts[:-1]
        out = pd.DataFrame(
            {
                "event_id": rows["event_id"].astype("int64"),
                "event_type": rows["event_type"],
                "dropped": [
                    1 if (p is not None and t - p < gap_ms) else 0
                    for p, t in zip(prevs, ts)
                ],
            }
        )
        state.update((ts[-1],))
        yield out

    prepared = events.selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "unix_millis(CAST(ts AS TIMESTAMP)) AS ts_ms",
    )
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        folder,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
