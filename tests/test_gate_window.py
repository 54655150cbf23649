"""Correctness-gate window invariants (no Spark session needed).

The driver records the FIRST 50 ``queries()`` entries per round. The
round-5 rotation contract (VERDICT r4 ask #1): while more queries lack
a driver-recorded row than the window holds, every window slot must go
to a never-recorded query — a recorded query sitting in the first 50
silently burns a slot and delays full driver coverage by a round.
"""

from __future__ import annotations

import glob
import json


def _declared():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries()), mod.oracle_sql()


def _driver_recorded() -> set[str]:
    recorded: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(path, encoding="utf-8") as f:
            recorded |= set(json.load(f))
    return recorded


def test_every_query_has_an_oracle():
    keys, oracles = _declared()
    assert set(keys) == set(oracles)
    assert len(keys) == len(set(keys))


def test_gate_window_spends_slots_on_unrecorded_queries():
    keys, _ = _declared()
    recorded = _driver_recorded()
    unrecorded = [k for k in keys if k not in recorded]
    window = keys[:50]
    if len(unrecorded) >= 50:
        wasted = [k for k in window if k in recorded]
        assert not wasted, (
            f"window slots burned on already-recorded queries: {wasted} — "
            "move never-recorded queries into the first 50"
        )
    else:
        # fewer unrecorded than slots: all of them must be in the window
        missing = [k for k in unrecorded if k not in window]
        assert not missing, (
            f"never-recorded queries outside the first-50 window: {missing}"
        )
