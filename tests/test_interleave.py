"""Stride-interleave schedule contracts (q_interleave_mixture, r10):
bijective positions, per-source order preservation, and the stride
guarantee — every prefix holds each source in ≈ its weight share."""

from __future__ import annotations

import math

from orders_kafka_streams_spark.operators.sampling import _q_interleave_mixture


def test_interleave_contracts(spark, sf_dir):
    rows = sorted(
        _q_interleave_mixture(spark, sf_dir).collect(),
        key=lambda r: r.interleave_pos,
    )
    n = len(rows)
    assert n > 0
    # bijection: positions 1..n
    assert [r.interleave_pos for r in rows] == list(range(1, n + 1))
    # per-source order preservation: within_rank strictly increases
    # along the interleave for each source
    last: dict[str, int] = {}
    for r in rows:
        assert r.within_rank == last.get(r.source, 0) + 1, r
        last[r.source] = r.within_rank
    sources = sorted(last)
    assert len(sources) > 1

    # stride guarantee: at any prefix, source s has seen within_rank
    # floor-close to prefix-share · w_s. Stride scheduling by key
    # j/w_s bounds each source's deviation from its weight share to
    # O(1) docs per source at every KEY cutoff; check at quartile
    # prefixes with a ±(#sources+1) tolerance (integer rounding of
    # the key cutoffs).
    from pyspark.sql import functions as F

    from orders_kafka_streams_spark.operators.text import _tokenized

    tok = (
        _tokenized(spark, sf_dir, "source")
        .groupBy("source")
        .agg(F.sum(F.size("t")).alias("t"))
        .collect()
    )
    weights = {r.source: math.sqrt(r.t) for r in tok}
    wsum = sum(weights.values())
    for frac in (0.25, 0.5, 0.75):
        p = int(n * frac)
        seen: dict[str, int] = {}
        for r in rows[:p]:
            seen[r.source] = seen.get(r.source, 0) + 1
        for s in sources:
            expected = p * weights[s] / wsum
            assert abs(seen.get(s, 0) - expected) <= len(sources) + 1, (
                frac,
                s,
                seen.get(s, 0),
                expected,
            )
