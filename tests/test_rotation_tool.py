"""Smoke tests for the gate-window rotation tool (tools/rotation.py).

The tool decides which 50 queries the driver adjudicates next round —
a bug here silently burns gate slots, which is exactly how ecdf's fix
went unrecorded for two rounds. No Spark needed; git history only.
"""

from __future__ import annotations

import importlib.util
import json
import sys


def _tool():
    spec = importlib.util.spec_from_file_location(
        "rotation", "/root/repo/tools/rotation.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_queue_covers_every_declared_query():
    tool = _tool()
    rows = tool.build_queue()
    declared = set(_entry().queries())
    assert {r["query"] for r in rows} == declared
    # staleness fields are sane: recorded rounds within history,
    # touch timestamps positive
    for r in rows:
        assert 0 <= r["recorded_round"] <= 99
        assert r["touched_ts"] > 0
    # ordering invariant: non-increasing staleness
    st = [r["staleness_s"] for r in rows]
    assert st == sorted(st, reverse=True)


def test_window_pins_and_unrecorded_first():
    tool = _tool()
    rows = tool.build_queue()
    pinned = tool._pinned()
    window = list(pinned)
    for row in rows:
        if len(window) >= 50:
            break
        if row["query"] not in window:
            window.append(row["query"])
    assert len(window) == 50 and len(set(window)) == 50
    # every never-driver-recorded query must land inside the window
    # (they have recorded_round 0 -> maximal staleness)
    never = [r["query"] for r in rows if r["recorded_round"] == 0]
    if len(never) <= 50 - len(pinned):
        missing = [q for q in never if q not in window]
        assert not missing, missing


def test_pins_release_on_green_ecdf(tmp_path, monkeypatch):
    tool = _tool()
    # hermetic: point REPO at a synthetic fixture BEFORE the first
    # assertion — the old version read the real repo state, whose
    # precondition expired the moment the driver wrote
    # CORRECTNESS_r09.json (VERDICT r9 "What's wrong" #1)
    monkeypatch.setattr(tool, "REPO", tmp_path)
    # synthetic r<=8 history only: pins active
    (tmp_path / "CORRECTNESS_r08.json").write_text(
        json.dumps({"ecdf": {"hash_match": False}})
    )
    assert tool._pinned() == ["ecdf", "quantiles_linear",
                              "weighted_quantiles"]
    # a synthetic r09 green row releases them
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps({"ecdf": {"rows_match": True, "schema_match": True,
                             "hash_match": True}})
    )
    assert tool._pinned() == []
    # a red r09 row keeps them
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps({"ecdf": {"hash_match": False}})
    )
    assert tool._pinned() == ["ecdf", "quantiles_linear",
                              "weighted_quantiles"]


def test_record_ts_falls_back_to_file_mtime(tmp_path, monkeypatch):
    """An on-disk CORRECTNESS file with NO record commit must use the
    file's mtime, never epoch 0 — the r9 epoch fallback ranked the 50
    just-verified queries as the stalest in the catalog and would have
    hijacked the next gate window (VERDICT r9 "What's wrong" #2)."""
    tool = _tool()
    monkeypatch.setattr(tool, "REPO", tmp_path)
    f = tmp_path / "CORRECTNESS_r42.json"
    f.write_text(json.dumps({"ecdf": {"hash_match": True}}))
    # no 'round 42: verdict/' commit anywhere -> mtime fallback
    ts = tool.record_ts(42, {})
    assert ts == int(f.stat().st_mtime) and ts > 0
    # a real record commit still wins over the mtime
    assert tool.record_ts(42, {42: 1234567890}) == 1234567890
    # a round with neither commit nor file -> 0 (genuinely unrecorded)
    assert tool.record_ts(7, {}) == 0
