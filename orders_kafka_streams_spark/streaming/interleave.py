"""Streaming admission twin of the mixture-interleave schedule: each
arriving document receives its per-source WITHIN-RANK at ingest with
O(sources) state (SURVEY §2.8 stateful tier; batch twin:
q_interleave_mixture in operators/sampling.py).

The batch schedule shuffles within a source by seeded hash — a
full-pass notion. The ingest-time analogue every live intake actually
runs is ARRIVAL-ORDER admission: a doc's within-source rank is its
source's running counter, exactly the q_stream_source_quota ledger
without the cap. The global interleave position then follows from the
memoized corpus weights OUTSIDE the stream (the stride key
within_rank / √(source tokens) and one two-pass rank over the drained
relation — the q_stream_transition_matrix drain-then-rollup shape),
because a doc's GLOBAL position is a full-order property no bounded
state can finalize mid-stream.

State per key is ONE counter — bounded by |sources| regardless of
stream length. The reference has no equivalent operator; its only
stateful kernel is the pair matcher (OrderProcessor.java:99-154).
This reuses that operator's applyInPandasWithState plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id long, source string, within_rank long"
STATE_SCHEMA = "seen long"


def stream_interleave_ranks(docs: DataFrame) -> DataFrame:
    """docs (streaming: ``doc_id``/``source``) → every row stamped with
    its 1-based per-source arrival rank.

    Docs fold in doc_id order within each micro-batch and the counter
    carries across batches, so each row's rank is invariant to how the
    stream batches the corpus as long as delivery respects doc_id
    order (the file-source contract the EWMA/quota/transition twins
    already rely on; asserted in tests/test_stream_interleave.py).

    Kernel is self-contained (builtins + pandas only) so workers
    unpickle it without importing this package. NoTimeout: the counter
    is the live schedule ledger, not a buffer with an expiry policy.
    """

    def stamp(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        (seen,) = state.get if state.exists else (0,)
        chunks = list(pdfs)
        rows = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not len(rows):
            yield pd.DataFrame(columns=["doc_id", "source", "within_rank"])
            return
        rows = rows.sort_values("doc_id").reset_index(drop=True)
        out = pd.DataFrame(
            {
                "doc_id": rows["doc_id"].astype("int64"),
                "source": source,
                "within_rank": seen + pd.RangeIndex(1, len(rows) + 1).to_numpy(),
            }
        )
        state.update((seen + len(rows),))
        yield out

    return docs.groupBy("source").applyInPandasWithState(
        stamp,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
