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


# ------------------------------------------------------------ triangle_count


def _py_triangles(edges):
    import itertools

    adj = {}
    es = set()
    for a, b in edges:
        if a == b or a is None or b is None:
            continue
        x, y = min(a, b), max(a, b)
        if (x, y) in es:
            continue
        es.add((x, y))
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    per_v = {}
    total = 0
    for x, y in es:
        for z in adj[x] & adj[y]:
            if z > y:  # canonical x < y < z counts each once
                total += 1
                for v in (x, y, z):
                    per_v[v] = per_v.get(v, 0) + 1
    return total, per_v


def test_triangle_count_matches_python_reference(spark):
    import random

    from etl_spark_gradle_spark.operators.graph import triangle_count

    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(300)]
    edges += [(1, 2), (2, 3), (1, 3)]  # guarantee at least one triangle
    df = spark.createDataFrame(edges, "a int, b int").repartition(5)
    total, per_v = _py_triangles(edges)
    assert total > 0

    got_total = triangle_count(df, "a", "b", per_vertex=False).collect()[0][
        "triangles"
    ]
    assert got_total == total

    got_pv = {
        r["vertex"]: r["triangles"]
        for r in triangle_count(df, "a", "b").collect()
    }
    assert got_pv == per_v


def test_triangle_count_self_loops_multiedges_nulls(spark):
    from etl_spark_gradle_spark.operators.graph import triangle_count

    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (None, 2), (3, None)],
        "a int, b int",
    )
    rows = triangle_count(df, "a", "b").collect()
    assert {r["vertex"]: r["triangles"] for r in rows} == {1: 1, 2: 1, 3: 1}


def test_triangle_count_skewed_hub_and_plan(spark):
    """A hub vertex connected to everyone: the degree orientation must
    point every hub edge INTO the hub, so the hub generates no wedges
    itself (the O(m^1.5) bound in action); plan stays equi-join only."""
    from etl_spark_gradle_spark.operators.graph import triangle_count

    n = 60
    edges = [(0, i) for i in range(1, n)] + [(i, i + 1) for i in range(1, n - 1)]
    df = spark.createDataFrame(edges, "a int, b int")
    # each path edge (i, i+1) forms a triangle with the hub
    got = triangle_count(df, "a", "b", per_vertex=False).collect()[0]["triangles"]
    assert got == n - 2
    plan = (
        triangle_count(df, "a", "b")._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_triangle_count_validation_and_adapter(spark):
    import pytest as _pytest

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.graph import (
        TriangleCountTransformer,
        triangle_count,
    )
    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.plans.config import (
        RunContext,
        TransformationConfig,
    )

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with _pytest.raises(TransformationError, match="not in schema"):
        triangle_count(df, "a", "zzz")
    assert triangle_count(df, "a", "b").count() == 0  # no triangle

    tf = TRANSFORMER_REGISTRY["triangle_count"]
    assert type(tf) is TriangleCountTransformer
    out = tf.transform(
        spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "a int, b int"),
        TransformationConfig(
            type="triangle_count",
            options={"srcColumn": "a", "dstColumn": "b", "perVertex": "false"},
        ),
        RunContext.create("t", spark),
    )
    assert out.collect()[0]["triangles"] == 1
    bad = tf.validate(df, TransformationConfig(type="triangle_count", options={}))
    assert not bad.is_valid


def py_bfs(edges, seeds, max_hops, directed=False):
    adj = {}
    for s, t in set(edges):
        adj.setdefault(s, set()).add(t)
        if not directed:
            adj.setdefault(t, set()).add(s)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        if not nxt:
            break
        frontier = nxt
    return dist


def test_bfs_distances_matches_reference(spark):
    from etl_spark_gradle_spark.operators.graph import bfs_distances

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    df = spark.createDataFrame(edges, ["s", "t"])
    seeds = spark.createDataFrame([("a",), ("zz",)], ["n"])
    got = {r.node: r.dist
           for r in bfs_distances(df, "s", "t", seeds, "n", max_hops=2).collect()}
    want = py_bfs(edges, ["a", "zz"], 2)
    assert got == want           # zz absent from graph still dist 0
    assert got["c"] == 2 and "d" not in got and "x" not in got
    # directed: nothing reaches back to a
    gd = {r.node: r.dist
          for r in bfs_distances(df, "s", "t",
                                 spark.createDataFrame([("c",)], ["n"]),
                                 "n", max_hops=3, directed=True).collect()}
    assert gd == {"c": 0, "d": 1, "e": 2}


def test_bfs_distances_partitioning_and_early_exit(spark):
    from etl_spark_gradle_spark.operators.graph import bfs_distances

    edges = [(i, i + 1) for i in range(20)]
    want = py_bfs(edges, [0], 50)
    for parts in (1, 8):
        df = spark.createDataFrame(edges, ["s", "t"]).repartition(parts)
        seeds = spark.createDataFrame([(0,)], ["n"])
        got = {r.node: r.dist
               for r in bfs_distances(df, "s", "t", seeds, "n",
                                      max_hops=50).collect()}
        assert got == want, parts
    # max_hops=0 -> seeds only
    df = spark.createDataFrame(edges, ["s", "t"])
    seeds = spark.createDataFrame([(5,)], ["n"])
    got = bfs_distances(df, "s", "t", seeds, "n", max_hops=0).collect()
    assert [(r.node, r.dist) for r in got] == [(5, 0)]


def test_bfs_yaml_adapter_and_validation(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig
    from etl_spark_gradle_spark.operators.graph import bfs_distances

    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["s", "t"])
    t = TRANSFORMER_REGISTRY["bfs"]
    cfg = TransformationConfig(
        type="bfs",
        options={"srcColumn": "s", "dstColumn": "t", "seedValues": "a",
                 "maxHops": "1"},
    )
    assert t.validate(df, cfg).is_valid
    got = {r.node: r.dist for r in t.transform(df, cfg, None).collect()}
    assert got == {"a": 0, "b": 1}
    for opts in (
        {"srcColumn": "s"},
        {"srcColumn": "s", "dstColumn": "t"},
        {"srcColumn": "s", "dstColumn": "t", "seedView": "v"},
        {"srcColumn": "s", "dstColumn": "t", "seedValues": "a", "maxHops": "-1"},
    ):
        assert not t.validate(df, TransformationConfig(type="bfs", options=opts)).is_valid
    with pytest.raises(TransformationError):
        bfs_distances(df, "s", "nope", df.select("s"), "s")
