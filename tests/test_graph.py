"""Fixed-point PageRank (operators/graph.py): exact equality with a
pure-python integer reference, partitioning independence, adapter."""

from __future__ import annotations

import pytest

from etl_spark_gradle_spark.operators.graph import SCALE, pagerank
from etl_spark_gradle_spark.operators.relational import TransformationError

EDGES = [
    ("a", "b"),
    ("b", "c"),
    ("c", "a"),
    ("a", "c"),
    ("d", "a"),  # d is a source-only node; c->a makes a a hub
]


def py_pagerank(edges, d100=85, iterations=5):
    """Pure-python replica of the integer iteration."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    teleport = ((100 - d100) * SCALE) // (100 * n)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        in_sum = {v: 0 for v in nodes}
        for s, t in edges:
            in_sum[t] += pr[s] // outdeg[s]
        pr = {v: teleport + (d100 * in_sum[v]) // 100 for v in nodes}
    return pr


def test_pagerank_matches_integer_reference(spark):
    df = spark.createDataFrame(EDGES, ["s", "t"])
    got = {r.node: r.pr_int for r in pagerank(df, "s", "t").collect()}
    assert got == py_pagerank(EDGES)
    # hub 'a' (two in-edges incl. from the rank-rich c) outranks 'b'
    assert got["a"] > got["b"]
    # source-only 'd' receives teleport mass only after round 1
    assert got["d"] == min(got.values())
    # double rendering is the exact integer ratio
    rows = {r.node: r for r in pagerank(df, "s", "t").collect()}
    for v, r in rows.items():
        assert r.pr == r.pr_int / float(SCALE)


def test_pagerank_partitioning_and_multiedge_independence(spark):
    dup = EDGES + EDGES[:3]  # multi-edges must collapse
    want = py_pagerank(EDGES, iterations=3)
    for parts in (1, 5, 16):
        df = spark.createDataFrame(dup, ["s", "t"]).repartition(parts)
        got = {r.node: r.pr_int
               for r in pagerank(df, "s", "t", iterations=3).collect()}
        assert got == want, parts


def test_pagerank_mass_conservation_bound(spark):
    """Total mass never exceeds SCALE and shrinks only via floor leaks
    + non-redistributed dangling mass (documented variant)."""
    df = spark.createDataFrame(EDGES, ["s", "t"])
    got = [r.pr_int for r in pagerank(df, "s", "t", iterations=8).collect()]
    assert 0 < sum(got) <= SCALE
    assert all(v > 0 for v in got)


def test_pagerank_validation_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame(EDGES, ["s", "t"])
    with pytest.raises(TransformationError, match="damping"):
        pagerank(df, "s", "t", damping=1.0)
    with pytest.raises(TransformationError, match="damping"):
        pagerank(df, "s", "t", damping=0.855)  # not hundredths
    with pytest.raises(TransformationError, match="iterations"):
        pagerank(df, "s", "t", iterations=0)
    with pytest.raises(TransformationError, match="edge column"):
        pagerank(df, "s", "nope")

    tr = TRANSFORMER_REGISTRY["pagerank"]
    cfg = TransformationConfig(
        type="pagerank",
        options={"srcColumn": "s", "dstColumn": "t", "iterations": "3"},
    )
    assert tr.validate(df, cfg).is_valid
    got = {r.node: r.pr_int for r in tr.transform(df, cfg, None).collect()}
    assert got == py_pagerank(EDGES, iterations=3)
    for bad in (
        {"srcColumn": "s"},
        {"srcColumn": "s", "dstColumn": "t", "damping": "1.5"},
        {"srcColumn": "s", "dstColumn": "t", "iterations": "0"},
        {"srcColumn": "zz", "dstColumn": "t"},
    ):
        assert not tr.validate(
            df, TransformationConfig(type="pagerank", options=bad)
        ).is_valid
