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


# Queries DELIBERATELY registered without a DuckDB oracle — the
# driver's documented rows-only check for genuinely non-SQL-expressible
# closings. Every entry needs a justification; anything else must have
# an oracle.
ROWS_ONLY_ALLOWED = {
    # eigendecomposition is not SQL-expressible; full-precision numpy
    # parity pinned in tests/test_r11_operators.py
    "pca",
    # iterative Newton optimization (driver loop over distributed
    # sufficient statistics) — numpy parity pinned in pytest
    "cox",
}


def test_every_query_has_an_oracle():
    keys, oracles = _declared()
    assert set(oracles) <= set(keys), "oracle for an unregistered query"
    assert set(keys) - set(oracles) == ROWS_ONLY_ALLOWED
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


def test_oracle_output_types_never_hugeint():
    """The r6/r7 `ecdf` red row root cause: DuckDB's sum(BIGINT)
    returns HUGEINT, which pandas renders as float64 — so an uncast
    integer expression hash-mismatches the int64 Spark column
    (`3356` vs `3356.0`) even though every value compares equal.
    Statically DESCRIBE every oracle at sf0.001 and reject any
    HUGEINT output column: they all need an explicit CAST AS BIGINT."""
    import duckdb

    _, oracles = _declared()
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    offenders = []
    for name, sql in oracles.items():
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception:
            continue  # oracles needing runtime temp tables: sweep covers them
        for col, typ, *_ in desc:
            if "INT128" in typ.upper() or "HUGEINT" in typ.upper():
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle columns that DuckDB will render as float64 (driver "
        f"hash mismatch vs Spark int64): {offenders} — CAST AS BIGINT"
    )


def test_gate_window_is_the_declared_rotation():
    """Round-9 contract (VERDICT r8 asks #1/#2): queries() must put
    _GATE_WINDOW first, the window must be exactly 50 unique declared
    names, and slots 1-3 must stay pinned to ecdf + its
    stats._prefix_sums co-witnesses until a driver-recorded green
    `ecdf` row exists in CORRECTNESS_r09+ (it was red in r6 AND r7;
    the r8 HUGEINT-oracle fix has never been driver-adjudicated)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    window = mod._GATE_WINDOW
    assert len(window) == 50 and len(set(window)) == 50
    assert list(mod.queries())[:50] == window
    ecdf_confirmed = any(
        json.load(open(p)).get("ecdf", {}).get("hash_match") is True
        for p in glob.glob("/root/repo/CORRECTNESS_r*.json")
        if int(p.rsplit("_r", 1)[1][:2]) >= 9
    )
    if not ecdf_confirmed:
        assert window[:3] == ["ecdf", "quantiles_linear", "weighted_quantiles"]


def test_no_duplicate_dict_keys_in_query_registries():
    """A duplicate key in the queries()/oracle_sql() dict LITERALS
    silently shadows an earlier query (python keeps the last value) —
    the round-8 `sessionize` near-miss: a new batch query reused the
    streaming sessionizer's key and knocked it out of the registry
    without any test noticing. Parse the source, not the dict."""
    import ast

    src = open("/root/repo/__spark_entry__.py", encoding="utf-8").read()
    tree = ast.parse(src)
    offenders = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef):
            continue
        if node.name not in ("queries", "_registry", "oracle_sql"):
            continue
        for sub in ast.walk(node):
            if isinstance(sub, ast.Dict):
                keys = [
                    k.value
                    for k in sub.keys
                    if isinstance(k, ast.Constant) and isinstance(k.value, str)
                ]
                from collections import Counter

                dups = [k for k, c in Counter(keys).items() if c > 1]
                if dups:
                    offenders.append(f"{node.name}: {dups}")
    assert not offenders, f"duplicate registry keys shadow queries: {offenders}"
