"""t_closeness — the ICDE 2007 skewness-attack audit completing the
k_anonymity / l_diversity privacy ladder (operators/pii.py)."""

from __future__ import annotations

import collections

import pytest

from etl_spark_gradle_spark.operators.pii import t_closeness
from etl_spark_gradle_spark.operators.relational import TransformationError


def _py_t_closeness(rows, t, distance):
    """Pure-python reference: exact integer numerators over n_g*N."""
    cells = collections.Counter()
    glob = collections.Counter()
    for g, v in rows:
        if v is None:
            continue
        cells[(g, v)] += 1
        glob[v] += 1
    N = sum(glob.values())
    vals = sorted(glob)
    m = len(vals)
    groups = collections.Counter(g for g, v in rows if v is not None)
    out = {}
    for g, n in groups.items():
        if distance == "emd":
            cum = tot = 0
            for v in vals:
                cum += cells.get((g, v), 0) * N - glob[v] * n
                tot += abs(cum)
            d = tot / (n * N * (m - 1)) if m > 1 else 0.0
        else:
            tot = sum(
                abs(cells.get((g, v), 0) * N - glob[v] * n) for v in vals
            )
            d = tot / (2 * n * N) if m > 1 else 0.0
        if d > t:
            out[g] = (n, d)
    return out


def test_t_closeness_matches_pure_python(spark):
    import random

    random.seed(3)
    rows = [(f"z{random.randint(0, 4)}", random.randint(1, 4))
            for _ in range(400)]
    rows += [("z9", 4)] * 20 + [("z9", 1)] * 2  # skewed group
    rows += [("z0", None)] * 5  # NULL sensitive excluded
    df = spark.createDataFrame(rows, "zip string, band int")
    for dist in ("emd", "tv"):
        got = {r["zip"]: (r["n"], r["distance"]) for r in
               t_closeness(df, ["zip"], "band", t=0.1,
                           distance=dist).collect()}
        want = _py_t_closeness(rows, 0.1, dist)
        assert set(got) == set(want)
        for g in want:
            assert got[g][0] == want[g][0]
            assert got[g][1] == pytest.approx(want[g][1], abs=1e-15)
    # the planted skewed group must be detected
    assert "z9" in _py_t_closeness(rows, 0.1, "emd")


def test_t_closeness_absent_values_move_mass(spark):
    # a group missing a globally-common value is NOT close even though
    # its own values are uniform — the expansion must include absent
    # values (the skewness attack t-closeness exists to catch)
    rows = [("a", 1)] * 10 + [("b", 1)] * 5 + [("b", 2)] * 5
    df = spark.createDataFrame(rows, "g string, v int")
    d = {r["g"]: r["distance"] for r in
         t_closeness(df, ["g"], "v", t=0.0).collect()}
    # global: p(1)=.75, p(2)=.25 ; group a: (1, 0) -> emd = .25
    assert d["a"] == pytest.approx(0.25)
    assert d["b"] == pytest.approx(0.25)


def test_t_closeness_degenerate_and_summary(spark):
    # single global value -> distance 0, no violations at any t
    one = spark.createDataFrame([("a", 7), ("b", 7)], "g string, v int")
    assert t_closeness(one, ["g"], "v", t=0.0).count() == 0
    rows = [("a", 1)] * 10 + [("b", 2)] * 10
    df = spark.createDataFrame(rows, "g string, v int")
    s = t_closeness(df, ["g"], "v", t=0.2, output="summary").collect()[0]
    assert s["total_rows"] == 20 and s["total_groups"] == 2
    assert s["violating_groups"] == 2  # perfectly split -> max skew
    assert s["max_distance"] == pytest.approx(0.5)
    assert s["at_risk_share"] == 1.0


def test_t_closeness_validation_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(TransformationError):
        t_closeness(df, [], "v")
    with pytest.raises(TransformationError):
        t_closeness(df, ["g"], "v", t=1.5)
    with pytest.raises(TransformationError):
        t_closeness(df, ["g"], "v", distance="kl")
    with pytest.raises(TransformationError):
        t_closeness(df, ["g"], "missing")
    t = TRANSFORMER_REGISTRY["t_closeness"]
    ok = TransformationConfig(
        type="t_closeness",
        options={"quasiIdentifiers": "g", "sensitiveColumn": "v",
                 "t": "0.1", "distance": "tv"},
    )
    assert t.validate(df, ok).is_valid
    assert t.transform(df, ok, None).columns == ["g", "n", "distance"]
    bad = TransformationConfig(
        type="t_closeness",
        options={"quasiIdentifiers": "g", "sensitiveColumn": "v",
                 "t": "nope"},
    )
    assert not t.validate(df, bad).is_valid
