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
