"""Pair matcher on ``transformWithStateInPandas`` — Spark 4's native
arbitrary-stateful API (SPARK-49564 / the transformWithState operator).

Same reference semantics as streaming/pair_matcher.py
(OrderProcessor.java:99-206): buffer first-arriving side in keyed
state, last-writer-wins on duplicate placed events
(OrderProcessor.java:114), emit-on-complete + state delete
(OrderProcessor.java:146-149). The differences are the API tier:

- state is a named, schema'd ``ValueState`` on a handle (RocksDB-backed
  provider at scale) instead of one opaque tuple per key;
- timers are first-class (``registerTimer``) rather than a single
  per-key timeout config — the punctuator expiry
  (OrderProcessor.java:161-206) maps to one timer per buffered key,
  O(expired) not O(state)/min; kept off here so drain-style runs
  settle (see pair_matcher.py's rationale);
- the processor object is stateful across batches within a partition,
  so the class (not a closure) is the natural unit.

The processor is defined inside the factory so cloudpickle ships it
by VALUE — workers never import this package.

Environment gate: the transformWithState state-server protocol speaks
protobuf (pyspark/sql/streaming/proto/StateMessage_pb2.py imports
``google.protobuf``). Containers without protobuf crash the driver
worker at init (verified here: STREAMING_PYTHON_RUNNER_INITIALIZATION
_FAILURE → ImportError google.protobuf), so callers must check
:func:`tws_available` first; the registry in
operators/streaming_queries.py only exposes q_stream_pair_tws when it
returns True.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id long, event_kind string, fulfilled_ms long, processing_ms long"


def tws_available() -> bool:
    """True iff the runtime can execute transformWithStateInPandas
    (needs ``google.protobuf`` for the state-server wire protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def pair_match_tws(
    events: DataFrame,
    placed_type: str = "click",
    fulfilled_type: str = "purchase",
) -> DataFrame:
    """events (streaming) → order.info records via transformWithState."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PairMatch(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._placed = handle.getValueState("placed", "placed_ms long")

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            got = self._placed.get()
            placed_ms = got[0] if got is not None else None
            out: list[tuple[int, str, int, int]] = []
            batch = pd.concat(list(rows), ignore_index=True)
            if len(batch):
                batch = batch.sort_values(["ts_ms", "event_type", "event_id"])
                for r in batch.itertuples(index=False):
                    if r.event_type == placed_type:
                        placed_ms = int(r.ts_ms)  # last-writer-wins
                    elif r.event_type == fulfilled_type and placed_ms is not None:
                        out.append(
                            (user_id, "order.info", int(r.ts_ms), int(r.ts_ms) - placed_ms)
                        )
                        placed_ms = None  # emit-on-complete deletes state
            if placed_ms is None:
                self._placed.clear()
            else:
                self._placed.update((placed_ms,))
            yield pd.DataFrame(
                out, columns=["user_id", "event_kind", "fulfilled_ms", "processing_ms"]
            )

        def close(self) -> None:
            pass

    prepared = events.selectExpr(
        "user_id", "event_type", "event_id", "unix_millis(CAST(ts AS TIMESTAMP)) AS ts_ms"
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=PairMatch(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
