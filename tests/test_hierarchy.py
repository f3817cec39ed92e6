"""Recursive-CTE hierarchy walk (q_part_hierarchy): closed-form depth
and root invariants plus a hand-folded path-cost check — the recursion
must reach every part exactly once with the ancestor-chain state the
closed form can't shortcut.
"""

from __future__ import annotations

from orders_kafka_streams_spark.operators.relational import QUERIES
from orders_kafka_streams_spark.sources.tables import load_table


def test_hierarchy_covers_every_part_once(spark, sf_dir):
    rows = QUERIES["q_part_hierarchy"](spark, sf_dir).collect()
    n_parts = load_table(spark, sf_dir, "part").count()
    assert len(rows) == n_parts
    assert len({r.p_partkey for r in rows}) == n_parts


def test_depth_and_root_are_decimal_closed_form(spark, sf_dir):
    """parent(k) = k DIV 10 means depth(k) = len(str(k)) - 1 and the
    root is k's leading decimal digit — the recursion must agree with
    the closed form on every row."""
    for r in QUERIES["q_part_hierarchy"](spark, sf_dir).collect():
        digits = str(r.p_partkey)
        assert r.depth == len(digits) - 1, r
        assert r.root_key == int(digits[0]), r


def test_path_retail_is_ancestor_chain_fold(spark, sf_dir):
    """path_retail == the root→leaf left fold of p_retailprice along
    the DIV-10 ancestor chain, re-folded driver-side in the same
    order."""
    price = {
        r.p_partkey: r.p_retailprice
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice")
        .collect()
    }
    got = {
        r.p_partkey: r.path_retail
        for r in QUERIES["q_part_hierarchy"](spark, sf_dir).collect()
    }
    for k in list(price)[:200]:
        chain = []
        cur = k
        while cur >= 10:
            chain.append(cur)
            cur //= 10
        chain.append(cur)
        total = 0.0
        for node in reversed(chain):  # root first — the fold order
            total = total + price[node]
        assert abs(got[k] - round(total, 4)) < 1e-9, k
