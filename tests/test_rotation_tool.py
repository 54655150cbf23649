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
    # ordering invariant (round-12 policy, VERDICT r11 ask #2):
    # recorded_round ascending is PRIMARY — never-recorded (0) first,
    # then the oldest driver rows — so the stale tail drains by
    # construction even when a module-wide edit marks the whole
    # stats family "touched"
    rr = [r["recorded_round"] for r in rows]
    assert rr == sorted(rr)


def test_window_oldest_rows_dominate_and_excludes_no_oracle():
    """The assembled window = pins + round pins + oldest recorded
    rows; cox/pca (rows-only forever) never burn a slot (VERDICT r11
    ask #3)."""
    tool = _tool()
    rows = tool.build_queue()
    window = _entry()._GATE_WINDOW
    assert len(window) == 50 and len(set(window)) == 50
    assert "cox" not in window and "pca" not in window
    # every never-driver-recorded query must land inside the window
    never = [r["query"] for r in rows if r["recorded_round"] == 0]
    reserved = len(tool._pinned()) + len(tool._ROUND_PINS)
    if len(never) <= 50 - reserved:
        missing = [q for q in never if q not in window]
        assert not missing, missing
    # non-pin slots go to the oldest recorded rounds: the window must
    # contain every query from the single oldest recorded round
    # (unless that cohort alone overflows the free slots)
    ages = {r["query"]: r["recorded_round"] for r in rows}
    oldest = min(v for v in ages.values() if v > 0)
    cohort = [q for q, v in ages.items() if v == oldest]
    if len(cohort) <= 50 - reserved:
        missing = [q for q in cohort if q not in window]
        assert not missing, (
            f"r{oldest:02d}-vintage rows left outside the window: "
            f"{missing}"
        )


def test_max_row_age_warnings():
    tool = _tool()
    rows = [
        {"query": "fresh", "recorded_round": 11},
        {"query": "stale", "recorded_round": 3},
        {"query": "never", "recorded_round": 0},
        {"query": "cox", "recorded_round": 3},
    ]
    warns = tool.max_row_age_warnings(rows, budget=5)
    assert any("stale" in w for w in warns)
    assert not any("fresh" in w for w in warns)
    assert not any("never" in w for w in warns)  # age starts at record 1
    assert not any("cox" in w for w in warns)  # excluded rows don't age


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
