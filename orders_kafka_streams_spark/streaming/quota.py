"""Streaming per-source admission quota: cap how many documents each
source may admit into the corpus, enforced AT INGEST with O(sources)
state (SURVEY §2.8 stateful tier; batch twin: q_source_quota in
operators/curation.py).

The batch quota ranks each source's docs by model-quality margin and
keeps the top SOURCE_QUOTA — a ranking only a full pass can compute.
The ingest-time analogue every production pipeline actually runs is
ARRIVAL-ORDER admission: a doc is admitted iff it passes the quality
gate (margin > 0, the same linear head as the batch classifier) and
its source has admitted fewer than the quota so far. State per key is
ONE counter — bounded by |sources| regardless of stream length, the
cheapest stateful shape there is.

The reference has no equivalent operator; its only stateful kernel is
the pair matcher (OrderProcessor.java:99-154). This reuses that
operator's applyInPandasWithState plumbing for a counting gate.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id long, source string, margin double, src_rank long"
STATE_SCHEMA = "admitted long"


def stream_source_quota(scored: DataFrame, quota: int) -> DataFrame:
    """scored (streaming: ``doc_id``/``source``/``margin``, already
    quality-filtered) → the admitted rows, each stamped with its
    1-based per-source admission rank.

    Docs fold in doc_id order within each micro-batch and the admitted
    counter carries across batches, so the admitted SET is invariant
    to how the stream batches the corpus as long as delivery respects
    doc_id order (the file-source contract the EWMA/transition twins
    already rely on; asserted in tests/test_stream_quota.py).

    Kernel is self-contained (builtins + pandas only) so workers
    unpickle it without importing this package. NoTimeout: the counter
    is the live quota ledger, not a buffer with an expiry policy.
    """

    def gate(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        (admitted,) = state.get if state.exists else (0,)
        chunks = list(pdfs)
        rows = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not len(rows):
            yield pd.DataFrame(columns=["doc_id", "source", "margin", "src_rank"])
            return
        rows = rows.sort_values("doc_id").reset_index(drop=True)
        room = max(quota - admitted, 0)
        take = rows.iloc[:room]
        out = pd.DataFrame(
            {
                "doc_id": take["doc_id"].astype("int64"),
                "source": source,
                "margin": take["margin"].astype(float),
                "src_rank": admitted + pd.RangeIndex(1, len(take) + 1).to_numpy(),
            }
        )
        state.update((admitted + len(take),))
        yield out

    return scored.groupBy("source").applyInPandasWithState(
        gate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
