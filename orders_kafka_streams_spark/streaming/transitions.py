"""Streaming Markov transitions: per-user prev→next event-type pairs
as a stateful streaming operator (batch twin: q_transition_matrix in
operators/timeseries.py).

State per user is exactly the LAST seen event — (ts_ms, event_id,
event_type), O(keys) regardless of stream length. Each micro-batch
folds its rows in event-time order, seeds from the carried state, and
emits one row per ADJACENT pair, so the union of all batches' outputs
equals the batch window-lag pair relation however the stream is split
(tests/test_stream_transitions.py asserts 1-batch ≡ k-batch ≡ batch
oracle).

The reference has no equivalent operator; its only stateful kernel is
the pair matcher (src/main/java/com/github/dhoard/kstreams/
OrderProcessor.java:99-154, one CREATED→CONFIRMED pair per key). This
generalizes that topology to the full event-type alphabet using the
same applyInPandasWithState plumbing as streaming/ewma.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, event_id long, prev_type string, next_type string"
STATE_SCHEMA = "ts_ms long, event_id long, event_type string"


def stream_transitions(events: DataFrame) -> DataFrame:
    """events (streaming, with ``ts``/``user_id``/``event_type``) → one
    row per adjacent same-user event pair.

    Kernel is self-contained (builtins + pandas only) so workers
    unpickle it without importing this package. NoTimeout: the carried
    last-event is a live per-user cursor, not a buffer with an expiry
    policy (the 24 h pair-expiry semantics live in the pair matcher,
    not here).
    """

    def folder(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = state.get if state.exists else None
        chunks = list(pdfs)
        rows = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not len(rows):
            yield pd.DataFrame(
                columns=["user_id", "event_id", "prev_type", "next_type"]
            )
            return
        rows = rows.sort_values(["ts_ms", "event_id"]).reset_index(drop=True)
        types = rows["event_type"].tolist()
        eids = rows["event_id"].astype("int64").tolist()
        carry = prev[2] if prev is not None else None
        out = pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": eids,
                "prev_type": [carry] + types[:-1],
                "next_type": types,
            }
        )
        out = out[out["prev_type"].notna()]
        state.update((int(rows["ts_ms"].iloc[-1]), eids[-1], types[-1]))
        yield out

    prepared = events.selectExpr(
        "user_id", "event_id", "event_type", "unix_millis(CAST(ts AS TIMESTAMP)) AS ts_ms"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        folder,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
