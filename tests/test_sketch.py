"""Mergeable HLL distinct sketches (operators/sketch.py).

The load-bearing property at 100 TB is merge-losslessness: per-shard
sketches unioned must equal the whole-table sketch exactly, so rollups
never need the raw data again.
"""

from __future__ import annotations

import pytest

from etl_spark_gradle_spark.operators import sketch as sk
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig
from tests.conftest import load_table


def test_estimate_within_error_bound(spark):
    li = load_table(spark, "lineitem")
    est = {
        r.l_returnflag: r.distinct_est
        for r in sk.distinct_estimate(li, ["l_returnflag"], "l_partkey").collect()
    }
    from pyspark.sql import functions as F

    exact = {
        r.l_returnflag: r.exact
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("exact"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for flag, e in est.items():
        # lg_k=12 → ~1.6 % RSE; 5 % is > 3 sigma
        assert abs(e - exact[flag]) / exact[flag] < 0.05


def test_union_of_shard_sketches_is_lossless(spark):
    """sketch(A) ∪ sketch(B) == sketch(A ∪ B), register-exact."""
    li = load_table(spark, "lineitem")
    # shard by return flag (disjoint cover), sketch each, merge to global
    per_shard = sk.build_distinct_sketch(li, ["l_returnflag"], "l_partkey")
    merged = sk.merge_sketches(per_shard, group_by=[]).collect()[0].distinct_est
    direct = (
        sk.build_distinct_sketch(li, [], "l_partkey").collect()[0].distinct_est
    )
    assert merged == direct


def test_rollup_chain_keeps_mergeable_sketch(spark):
    """fine→mid→global chain: merge output can merge again."""
    od = load_table(spark, "orders")
    fine = sk.build_distinct_sketch(
        od, ["o_orderpriority", "o_orderstatus"], "o_custkey"
    )
    mid = sk.merge_sketches(fine, ["o_orderpriority"], keep_sketch=True)
    assert "sketch" in mid.columns
    top = sk.merge_sketches(mid, group_by=[]).collect()[0].distinct_est
    direct = sk.build_distinct_sketch(od, [], "o_custkey").collect()[0].distinct_est
    assert top == direct


def test_sketch_transformer_build_and_merge(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    li = load_table(spark, "lineitem")
    tf = TRANSFORMER_REGISTRY["sketch"]
    ctx = RunContext.create("t", spark)

    built = tf.transform(
        li,
        TransformationConfig(
            type="sketch",
            options={
                "column": "l_partkey",
                "groupBy": "l_returnflag,l_linestatus",
                "keepSketch": "true",
            },
        ),
        ctx,
    )
    assert set(built.columns) == {"l_returnflag", "l_linestatus", "sketch", "distinct_est"}

    rolled = tf.transform(
        built,
        TransformationConfig(
            type="sketch", options={"strategy": "merge", "groupBy": "l_returnflag"}
        ),
        ctx,
    )
    assert set(rolled.columns) == {"l_returnflag", "distinct_est"}
    direct = {
        r.l_returnflag: r.distinct_est
        for r in sk.distinct_estimate(li, ["l_returnflag"], "l_partkey").collect()
    }
    assert {r.l_returnflag: r.distinct_est for r in rolled.collect()} == direct


def test_sketch_transformer_validation(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    li = load_table(spark, "lineitem")
    tf = TRANSFORMER_REGISTRY["sketch"]
    ctx = RunContext.create("t", spark)

    with pytest.raises(TransformationError, match="requires 'column'"):
        tf.transform(li, TransformationConfig(type="sketch", options={}), ctx)
    with pytest.raises(TransformationError, match="not in input schema"):
        tf.transform(
            li, TransformationConfig(type="sketch", options={"column": "nope"}), ctx
        )
    with pytest.raises(TransformationError, match="build|merge"):
        tf.transform(
            li,
            TransformationConfig(
                type="sketch", options={"strategy": "theta", "column": "l_partkey"}
            ),
            ctx,
        )
    # merge on a frame with no sketch column
    with pytest.raises(TransformationError, match="not in input schema: sketch"):
        tf.transform(
            li, TransformationConfig(type="sketch", options={"strategy": "merge"}), ctx
        )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketches (quantile companion to HLL)
# ---------------------------------------------------------------------------


def test_histogram_build_counts_and_overflow(spark):
    rows = [(1, -5.0), (1, 0.0), (1, 5.0), (1, 9.99), (1, 10.0), (1, 50.0), (1, None)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = sk.build_histogram_sketch(df, ["g"], "x", lo=0.0, hi=10.0, bins=2).collect()[0]
    # [-5 underflow] [0, 5 in bin1] [5..10: 5.0 goes to bin2? floor(5/10*2)=1 -> bin2]
    # 0.0 -> bin1; 5.0 -> bin2; 9.99 -> bin2; 10.0, 50.0 -> overflow; None dropped
    assert out.hist_counts == [1, 1, 2, 2]
    assert sum(out.hist_counts) == 6  # null counted nowhere


def test_histogram_merge_is_exact(spark):
    import random

    rng = random.Random(7)
    rows = [(i % 5, rng.uniform(-10, 110)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["g", "x"])
    direct = sk.build_histogram_sketch(df, [], "x", 0.0, 100.0, bins=16).collect()[0]
    fine = sk.build_histogram_sketch(df, ["g"], "x", 0.0, 100.0, bins=16)
    merged = sk.merge_histograms(fine, []).collect()[0]
    assert merged.hist_counts == direct.hist_counts


def test_histogram_quantile_accuracy(spark):
    import random

    rng = random.Random(11)
    vals = [rng.uniform(0, 100) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    hist = sk.build_histogram_sketch(df, [], "x", 0.0, 100.0, bins=100)
    got = hist.select(
        sk.histogram_quantile("hist_counts", 0.0, 100.0, 0.5).alias("p50"),
        sk.histogram_quantile("hist_counts", 0.0, 100.0, 0.9).alias("p90"),
    ).collect()[0]
    svals = sorted(vals)
    exact_p50 = svals[int(0.5 * len(svals)) - 1]
    exact_p90 = svals[int(0.9 * len(svals)) - 1]
    # bin width 1.0 -> estimate within one bin width of the exact quantile
    assert abs(got.p50 - exact_p50) <= 1.0, (got.p50, exact_p50)
    assert abs(got.p90 - exact_p90) <= 1.0, (got.p90, exact_p90)


def test_histogram_quantile_edges(spark):
    df = spark.createDataFrame([(200.0,), (300.0,)], ["x"])  # all overflow
    hist = sk.build_histogram_sketch(df, [], "x", 0.0, 100.0, bins=4)
    got = hist.select(
        sk.histogram_quantile("hist_counts", 0.0, 100.0, 0.5).alias("p50")
    ).collect()[0]
    assert got.p50 == 100.0  # clamped to hi
    empty = spark.createDataFrame([(None,)], "x DOUBLE")
    h2 = sk.build_histogram_sketch(empty, [], "x", 0.0, 100.0, bins=4)
    assert h2.select(
        sk.histogram_quantile("hist_counts", 0.0, 100.0, 0.5).alias("p50")
    ).collect()[0].p50 is None


def test_sketch_transformer_histogram_strategies(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    ev = load_table(spark, "events")
    tf = TRANSFORMER_REGISTRY["sketch"]
    ctx = RunContext.create("t", spark)
    built = tf.transform(
        ev,
        TransformationConfig(
            type="sketch",
            options={
                "strategy": "histogram",
                "column": "value",
                "groupBy": "event_type",
                "lo": "0",
                "hi": "100",
                "bins": "10",
                "quantiles": "0.5",
            },
        ),
        ctx,
    )
    assert "hist_counts" in built.columns and "p5" in built.columns
    merged = tf.transform(
        built,
        TransformationConfig(
            type="sketch",
            options={"strategy": "merge_histogram", "lo": "0", "hi": "100",
                     "quantiles": "0.5,0.9"},
        ),
        ctx,
    )
    row = merged.collect()[0]
    assert len(row.hist_counts) == 12
    assert row.p5 is not None and row.p9 is not None
    with pytest.raises(TransformationError, match="requires 'lo'"):
        tf.transform(
            ev,
            TransformationConfig(
                type="sketch", options={"strategy": "histogram", "column": "value"}
            ),
            ctx,
        )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_often_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.sketch import build_cms, cms_estimate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    true = li.groupBy("l_partkey").agg(F.count("*").alias("true_cnt"))
    # narrow width -> real collisions; estimates must still never undercount
    cms = build_cms(li, "l_partkey", depth=4, width=256)
    est = cms_estimate(cms, true, "l_partkey", depth=4, width=256)
    rows = est.collect()
    assert all(r.cms_count >= r.true_cnt for r in rows)
    # wide sketch -> exact for every key at this cardinality
    wide = build_cms(li, "l_partkey", depth=4, width=65536)
    exact = cms_estimate(wide, true, "l_partkey", depth=4, width=65536).collect()
    assert all(r.cms_count == r.true_cnt for r in exact)


def test_cms_merge_equals_single_build(spark, sf_dir):
    from etl_spark_gradle_spark.operators.sketch import build_cms, merge_cms

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    whole = build_cms(li, "l_suppkey", depth=3, width=1024)
    a = build_cms(li.where("l_orderkey % 2 = 0"), "l_suppkey", depth=3, width=1024)
    b = build_cms(li.where("l_orderkey % 2 = 1"), "l_suppkey", depth=3, width=1024)
    merged = merge_cms(a.unionByName(b))
    w = {(r.d, r.w): r.cnt for r in whole.collect()}
    m = {(r.d, r.w): r.cnt for r in merged.collect()}
    assert w == m


def test_cms_absent_key_zero_and_null_excluded(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.sketch import build_cms, cms_estimate

    df = spark.createDataFrame([("a",), ("a",), (None,), ("b",)], ["k"])
    cms = build_cms(df, "k", depth=3, width=64)
    # total mass per depth row == non-null rows (nulls excluded)
    per_d = {r.d: r.total for r in
             cms.groupBy("d").agg(F.sum("cnt").alias("total")).collect()}
    assert per_d == {0: 3, 1: 3, 2: 3}
    items = spark.createDataFrame([("zzz-not-present",)], ["k"])
    est = cms_estimate(cms, items, "k", depth=3, width=64).collect()
    # a key that shares no cell with any input estimates 0 (width 64 and
    # 3 rows of 3 distinct values -> collision on all 3 rows is ~(3/64)^3)
    assert est[0].cms_count in (0, 1, 2)  # never negative, bounded above by mass


def test_cms_weighted_build(spark):
    from etl_spark_gradle_spark.operators.sketch import build_cms, cms_estimate

    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)], ["k", "n"])
    cms = build_cms(df, "k", depth=3, width=64, weight_col="n")
    items = spark.createDataFrame([("a",), ("b",)], ["k"])
    est = {r.k: r.cms_count for r in
           cms_estimate(cms, items, "k", depth=3, width=64).collect()}
    assert est["a"] >= 15 and est["b"] >= 2


def test_cms_validation_and_yaml_adapter(spark):
    import pytest as _pytest

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.sketch import build_cms, merge_cms
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame([("a",)], ["k"])
    with _pytest.raises(TransformationError, match="depth"):
        build_cms(df, "k", depth=0)
    with _pytest.raises(TransformationError, match="hash_fn"):
        build_cms(df, "k", hash_fn="sha9000")
    with _pytest.raises(TransformationError, match="missing column"):
        merge_cms(df)

    t = TRANSFORMER_REGISTRY["sketch"]
    ctx = RunContext.create("t", spark)
    cfg = TransformationConfig(
        type="sketch",
        options={"strategy": "cms", "column": "k", "depth": "3", "width": "64"},
    )
    out = t.transform(df, cfg, ctx)
    assert set(out.columns) == {"d", "w", "cnt"}
    assert out.count() == 3
    merged = t.transform(
        out,
        TransformationConfig(type="sketch", options={"strategy": "cms_merge"}),
        ctx,
    )
    assert merged.count() == 3
    bad = t.validate(
        df, TransformationConfig(type="sketch", options={"strategy": "cms"})
    )
    assert not bad.is_valid


def test_cms_prune_no_false_negatives_and_min_count(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.sketch import build_cms, cms_prune

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cms = build_cms(li, "l_partkey", depth=4, width=1024)
    kept = cms_prune(li, "l_partkey", cms, depth=4, width=1024, min_count=30)
    freq = {
        r.l_partkey
        for r in li.groupBy("l_partkey").count().where("count >= 30").collect()
    }
    kept_keys = {r.l_partkey for r in kept.select("l_partkey").distinct().collect()}
    # CMS never undercounts -> every truly-frequent key MUST survive
    assert freq <= kept_keys
    # survivors' estimated floor: every kept key has every cell >= 30,
    # so its TRUE count can be below 30 only via collisions; at width
    # 1024 over ~200 keys that should be rare (<= a few)
    assert len(kept_keys - freq) <= 5


def test_cms_prune_is_shuffle_free_for_the_probe_side(spark, sf_dir):
    import io
    from contextlib import redirect_stdout

    from etl_spark_gradle_spark.operators.sketch import build_cms, cms_prune

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cms = build_cms(li, "l_partkey", depth=3, width=512)
    kept = cms_prune(li, "l_partkey", cms, depth=3, width=512, min_count=10)
    buf = io.StringIO()
    with redirect_stdout(buf):
        kept.explain("formatted")
    plan = buf.getvalue()
    import re

    # formatted explain lists each node in the tree AND a "(n) Node"
    # detail block - count the detail headers, one per physical node
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)) == 3
    assert "SortMergeJoin" not in plan


def test_cms_prune_validation(spark):
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.sketch import build_cms, cms_prune

    df = spark.createDataFrame([("a",)], ["k"])
    cms = build_cms(df, "k", depth=2, width=16)
    with _pytest.raises(TransformationError, match="min_count"):
        cms_prune(df, "k", cms, depth=2, width=16, min_count=0)
    with _pytest.raises(TransformationError, match="missing column"):
        cms_prune(df, "k", cms.drop("cnt"), depth=2, width=16)


def test_cms_join_cardinality_never_undercounts(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.sketch import (
        build_cms,
        cms_join_cardinality,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    true = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    # narrow sketch: collisions inflate, never deflate
    est_narrow = cms_join_cardinality(
        build_cms(orders, "o_orderkey", depth=3, width=128),
        build_cms(li, "l_orderkey", depth=3, width=128),
    ).collect()[0].est_join_rows
    assert est_narrow >= true
    # wide sketch: estimate tightens toward the truth
    est_wide = cms_join_cardinality(
        build_cms(orders, "o_orderkey", depth=3, width=65536),
        build_cms(li, "l_orderkey", depth=3, width=65536),
    ).collect()[0].est_join_rows
    assert true <= est_wide <= est_narrow
    assert est_wide <= true * 1.05  # within 5% at this width

    from etl_spark_gradle_spark.operators.relational import TransformationError
    import pytest as _pytest
    with _pytest.raises(TransformationError, match="missing column"):
        cms_join_cardinality(orders, build_cms(li, "l_orderkey"))


# ---------------------------------------------------------------- KMV


def _py_kmv(values, k):
    import hashlib

    hs = sorted({hashlib.md5(f"kmv:{v}".encode()).hexdigest() for v in values})
    return hs[:k]


def _py_kmv_estimate(sketch, k):
    if len(sketch) < k:
        return float(len(sketch))
    return float(k - 1) / (int(sketch[k - 1][:12], 16) / 281474976710656.0)


def test_kmv_matches_python_reference_exactly(spark):
    """The sketch is deterministic relational state: array and estimate
    equal a straight python replay of the same md5 math."""
    from etl_spark_gradle_spark.operators.sketch import build_kmv

    vals = [(f"g{i % 2}", i * 7) for i in range(500)]
    df = spark.createDataFrame(vals, "g string, v int").repartition(7)
    got = {
        r["g"]: (r["kmv"], r["distinct_est"])
        for r in build_kmv(df, ["g"], "v", k=32).collect()
    }
    for g in ("g0", "g1"):
        expect = _py_kmv([v for gg, v in vals if gg == g], 32)
        assert got[g][0] == expect
        assert got[g][1] == _py_kmv_estimate(expect, 32)


def test_kmv_estimate_accuracy_and_small_groups(spark):
    from etl_spark_gradle_spark.operators.sketch import build_kmv

    df = spark.createDataFrame(
        [("big", i) for i in range(5000)] + [("tiny", i) for i in range(9)],
        "g string, v int",
    )
    got = {r["g"]: r for r in build_kmv(df, ["g"], "v", k=128).collect()}
    # RSE ~ 1/sqrt(126) ~ 9%; allow 4 sigma
    assert abs(got["big"]["distinct_est"] - 5000) < 5000 * 0.36
    # under-filled sketch -> exact
    assert got["tiny"]["distinct_est"] == 9.0
    assert len(got["tiny"]["kmv"]) == 9


def test_kmv_merge_equals_direct_build(spark):
    """k smallest of the union of per-shard KMVs == KMV of the union:
    rollups never lose accuracy vs a fresh build."""
    from etl_spark_gradle_spark.operators.sketch import build_kmv, merge_kmv

    df = spark.createDataFrame(
        [(f"s{i % 4}", "x", i % 700) for i in range(3000)],
        "shard string, g string, v int",
    )
    per_shard = build_kmv(df, ["shard", "g"], "v", k=48)
    rolled = merge_kmv(per_shard, ["g"], k=48, sketch_col="kmv")
    direct = build_kmv(df, ["g"], "v", k=48)
    r, d = rolled.collect()[0], direct.collect()[0]
    assert r["kmv"] == d["kmv"]
    assert r["distinct_est"] == d["distinct_est"]


def test_kmv_jaccard_estimate(spark):
    from etl_spark_gradle_spark.operators.sketch import (
        build_kmv,
        kmv_jaccard_expr,
    )
    from pyspark.sql import functions as F

    # |A|=1200, |B|=1200, |A∩B|=600 -> true J = 600/1800 = 1/3
    df = spark.createDataFrame(
        [("a", i) for i in range(1200)] + [("b", i + 600) for i in range(1200)],
        "g string, v int",
    )
    sk = build_kmv(df, ["g"], "v", k=128)
    a = sk.filter("g = 'a'").selectExpr("kmv AS ka")
    b = sk.filter("g = 'b'").selectExpr("kmv AS kb")
    est = (
        a.crossJoin(b)
        .select(kmv_jaccard_expr(F.col("ka"), F.col("kb"), 128).alias("j"))
        .collect()[0]["j"]
    )
    assert abs(est - 1 / 3) < 0.15


def test_kmv_nulls_excluded_and_validation(spark):
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.sketch import build_kmv, merge_kmv

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "g string, v int"
    )
    row = build_kmv(df, ["g"], "v", k=8).collect()[0]
    assert len(row["kmv"]) == 2 and row["distinct_est"] == 2.0
    with _pytest.raises(TransformationError, match="k >= 2"):
        build_kmv(df, ["g"], "v", k=1)
    with _pytest.raises(TransformationError, match="not in"):
        build_kmv(df, ["g"], "zzz")
    with _pytest.raises(TransformationError, match="sketch column"):
        merge_kmv(df, ["g"], k=8, sketch_col="nope")


def test_kmv_topk_prunes_before_the_group_shuffle(spark):
    """WindowGroupLimit must run in Partial mode before the exchange —
    the property that bounds the shuffle to k hashes per group per map
    task at 100 TB."""
    from etl_spark_gradle_spark.operators.sketch import build_kmv

    df = spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(2000)], "g string, v int"
    ).repartition(6)
    plan = build_kmv(df, ["g"], "v", k=16)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_kmv_yaml_adapter(spark):
    from etl_spark_gradle_spark.operators.sketch import SketchTransformer, build_kmv
    from etl_spark_gradle_spark.plans.config import (
        RunContext,
        TransformationConfig,
    )

    df = spark.createDataFrame(
        [(f"g{i % 2}", f"s{i % 5}", i % 40) for i in range(400)],
        "g string, s string, v int",
    )
    tf = SketchTransformer()
    ctx = RunContext.create("t", spark)
    built = tf.transform(
        df,
        TransformationConfig(
            type="sketch",
            options={
                "strategy": "kmv", "column": "v", "groupBy": "g,s",
                "k": "16", "keepSketch": "true",
            },
        ),
        ctx,
    )
    merged = tf.transform(
        built,
        TransformationConfig(
            type="sketch",
            options={
                "strategy": "kmv_merge", "groupBy": "g", "k": "16",
                "keepSketch": "true",
            },
        ),
        ctx,
    )
    direct = build_kmv(df, ["g"], "v", k=16)
    got = {r["g"]: r["kmv"] for r in merged.collect()}
    want = {r["g"]: r["kmv"] for r in direct.collect()}
    assert got == want

    bad = tf.validate(
        df, TransformationConfig(type="sketch", options={"strategy": "kmv"})
    )
    assert not bad.is_valid
    bad2 = tf.validate(
        df,
        TransformationConfig(type="sketch", options={"strategy": "kmv_merge"}),
    )
    assert not bad2.is_valid


def test_merge_kmv_rejects_mismatched_k(spark):
    """merge_kmv must not silently produce a wrong estimate when the
    declared k disagrees with the build k: larger-k inputs are caught
    from sketch sizes; smaller-k inputs are caught via the recorded
    k_col metadata."""
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.sketch import build_kmv, merge_kmv

    rows = [(f"s{i % 4}", f"u{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "shard string, user string")

    # larger-k build merged under a smaller declared k: sketch sizes
    # exceed k -> runtime error instead of a silent estimate
    big = build_kmv(df, ["shard"], "user", k=64)
    with _pytest.raises(Exception, match="larger k"):
        merge_kmv(big, [], k=16).collect()

    # smaller-k build merged under larger declared k: undetectable
    # from sizes alone (union may stay under k), caught by k_col
    small = build_kmv(df, ["shard"], "user", k=16, k_col="build_k")
    with _pytest.raises(Exception, match="smaller k"):
        merge_kmv(small, [], k=64, k_col="build_k").collect()

    # matched k with metadata: merge equals a direct global build
    ok = merge_kmv(small, [], k=16, k_col="build_k").collect()[0]
    direct = build_kmv(df, [], "user", k=16).collect()[0]
    assert ok["kmv"] == direct["kmv"]
    assert ok["distinct_est"] == direct["distinct_est"]
    assert ok["build_k"] == 16


def test_merge_kmv_guard_survives_sketch_only_projection(spark):
    """The k-mismatch guard must fire even when the caller projects
    ONLY the sketch column (dropping the estimate): Catalyst prunes
    unevaluated expressions, so a guard folded solely into the
    estimate column would vanish and an invalid merge pass silently
    (round-8 ADVICE finding)."""
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.sketch import build_kmv, merge_kmv

    rows = [(f"s{i % 4}", f"u{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "shard string, user string")
    big = build_kmv(df, ["shard"], "user", k=64)
    with _pytest.raises(Exception, match="larger k"):
        merge_kmv(big, [], k=16).select("kmv").collect()


def test_misra_gries_build_invariants_and_exactness(spark):
    """build_mg: exact when distinct <= capacity; under pruning the
    undercount bound true - weight <= err holds for every kept value
    and every value with true count > err is present."""
    import random
    from collections import Counter

    from etl_spark_gradle_spark.operators.sketch import build_mg

    random.seed(41)
    # zipf-ish: a few heavy values + a long tail
    vals = (["hot1"] * 400 + ["hot2"] * 250 + ["hot3"] * 120
            + [f"t{i}" for i in range(300) for _ in (0, 1)])
    random.shuffle(vals)
    true = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v string")

    # exact regime: capacity >= distinct
    exact = {r["value"]: (r["mg_weight"], r["mg_err"])
             for r in build_mg(df, [], "v", capacity=1000).collect()}
    assert exact == {v: (c, 0) for v, c in true.items()}

    # pruned regime
    got = {r["value"]: (r["mg_weight"], r["mg_err"])
           for r in build_mg(df, [], "v", capacity=8).collect()}
    assert 0 < len(got) <= 8
    errs = {e for _, e in got.values()}
    assert len(errs) == 1
    err = errs.pop()
    for v, (w, _) in got.items():
        assert 0 < w <= true[v]
        assert true[v] - w <= err
    # every value with true count > err is guaranteed kept
    for v, c in true.items():
        if c > err:
            assert v in got
    assert "hot1" in got and "hot2" in got


def test_misra_gries_merge_keeps_guarantee(spark):
    """merge_mg over two shard summaries: weights undercount the
    POOLED truth by at most the summed+pruned err; heavy hitters of
    the pooled stream survive the merge."""
    import random
    from collections import Counter

    from etl_spark_gradle_spark.operators.sketch import build_mg, merge_mg
    from pyspark.sql import functions as F

    random.seed(43)
    s1 = ["a"] * 300 + ["b"] * 150 + [f"x{i}" for i in range(200)]
    s2 = ["a"] * 200 + ["c"] * 180 + [f"y{i}" for i in range(200)]
    random.shuffle(s1)
    random.shuffle(s2)
    true = Counter(s1) + Counter(s2)
    d1 = spark.createDataFrame([(v,) for v in s1], "v string")
    d2 = spark.createDataFrame([(v,) for v in s2], "v string")
    m1 = build_mg(d1, [], "v", capacity=10).withColumn(
        "_src", F.lit("s1")
    )
    m2 = build_mg(d2, [], "v", capacity=10).withColumn(
        "_src", F.lit("s2")
    )
    merged = {
        r["value"]: (r["mg_weight"], r["mg_err"])
        for r in merge_mg(
            m1.unionByName(m2), [], capacity=10, src_col="_src"
        ).collect()
    }
    assert 0 < len(merged) <= 10
    err = next(iter(merged.values()))[1]
    for v, (w, e) in merged.items():
        assert e == err
        assert 0 < w <= true[v]
        assert true[v] - w <= err
    for v, c in true.items():
        if c > err:
            assert v in merged
    assert {"a", "b", "c"} <= set(merged)


def test_misra_gries_grouped_and_validation(spark):
    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
    )
    from etl_spark_gradle_spark.operators.sketch import build_mg

    rows = [("g", "a"), ("g", "a"), ("g", "b"), ("h", "z")]
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {(r["grp"], r["value"]): r["mg_weight"]
           for r in build_mg(df, ["grp"], "v", capacity=4).collect()}
    assert out == {("g", "a"): 2, ("g", "b"): 1, ("h", "z"): 1}
    import pytest as _pytest

    with _pytest.raises(TransformationError, match="capacity >= 1"):
        build_mg(df, ["grp"], "v", capacity=0)
    with _pytest.raises(TransformationError, match="not in input schema"):
        build_mg(df, ["grp"], "nope", capacity=4)
