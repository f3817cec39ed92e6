"""docs/REGISTRY.md staleness gate (VERDICT r5 item 8): the committed
index must byte-match a regeneration from the live registry + budgets.
SELF-HEALING like the PLANS.md dossier gate: drift is rewritten in
place (shows up in git diff for the next commit) rather than failing
the suite on a purely mechanical artifact.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen():
    spec = importlib.util.spec_from_file_location(
        "okss_gen_registry", os.path.join(REPO, "tools", "gen_registry.py")
    )
    mod = importlib.util.module_from_spec(spec)
    saved = sys.argv
    sys.argv = ["gen_registry.py"]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = saved
    return mod


def test_registry_index_is_fresh_or_self_heals(capsys):
    mod = _gen()
    want = "\n".join(mod.build_lines())
    path = os.path.join(REPO, "docs", "REGISTRY.md")
    have = open(path).read() if os.path.exists(path) else None
    if have != want:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(want)
        print(f"REGISTRY.md was stale — regenerated {path}")
    assert open(path).read() == want


def test_registry_index_covers_every_query():
    from orders_kafka_streams_spark.operators import all_queries

    path = os.path.join(REPO, "docs", "REGISTRY.md")
    body = open(path).read()
    missing = [q for q in all_queries() if f"| {q} |" not in body]
    assert not missing, f"queries absent from docs/REGISTRY.md: {missing}"
