"""Set ops, sort/limit, distinct, sample, salted aggregation — the
SURVEY §2.7 extension transformers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
from etl_spark_gradle_spark.operators.relational import (
    TransformationError,
    salted_aggregate,
    sample_rows,
    set_op,
    sort_limit,
)
from etl_spark_gradle_spark.plans.config import AggregateExpr, RunContext, TransformationConfig


@pytest.fixture(scope="module")
def kv(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "v"]
    )


def test_set_op_union_distinct_and_all(spark, kv):
    kv.filter("k >= 3").createOrReplaceTempView("right_kv")
    distinct = set_op(kv, spark, "right_kv", "union", distinct=True)
    assert distinct.count() == 4
    allrows = set_op(kv, spark, "right_kv", "union", distinct=False)
    assert allrows.count() == 6


def test_set_op_union_by_name(spark):
    left = spark.createDataFrame([(1, "a")], ["k", "v"])
    # reversed column order on the right — positional union would mis-zip
    spark.createDataFrame([("b", 2)], ["v", "k"]).createOrReplaceTempView("rev_kv")
    rows = {(r.k, r.v) for r in set_op(left, spark, "rev_kv", "union").collect()}
    assert rows == {(1, "a"), (2, "b")}


def test_set_op_intersect_except(spark, kv):
    kv.filter("k IN (2, 3)").createOrReplaceTempView("mid_kv")
    assert {r.k for r in set_op(kv, spark, "mid_kv", "intersect").collect()} == {2, 3}
    assert {r.k for r in set_op(kv, spark, "mid_kv", "except").collect()} == {1, 4}


def test_sort_limit_topn(spark, kv):
    out = sort_limit(kv, ["k DESC"], limit=2).collect()
    assert [r.k for r in out] == [4, 3]
    with pytest.raises(TransformationError):
        sort_limit(kv, [])


def test_sample_rows_seeded_and_bounded(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = sample_rows(li, 0.1, seed=7).count()
    b = sample_rows(li, 0.1, seed=7).count()
    assert a == b  # seeded determinism within Spark
    total = li.count()
    assert 0.02 * total < a < 0.25 * total
    with pytest.raises(TransformationError):
        sample_rows(li, 1.5)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    aggs = [
        AggregateExpr("l_quantity", "sum", "s"),
        AggregateExpr("*", "count", "c"),
        AggregateExpr("l_quantity", "min", "mn"),
        AggregateExpr("l_quantity", "max", "mx"),
        AggregateExpr("l_quantity", "avg", "av"),
    ]
    salted = {
        r.l_returnflag: (r.s, r.c, r.mn, r.mx, round(r.av, 9))
        for r in salted_aggregate(li, ["l_returnflag"], aggs, salt_buckets=8).collect()
    }
    plain = {
        r.l_returnflag: (r.s, r.c, r.mn, r.mx, round(r.av, 9))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
            F.avg("l_quantity").alias("av"),
        )
        .collect()
    }
    assert salted == plain


def test_registry_adapters_validate(spark, kv):
    ctx = RunContext.create("t", spark)
    setop = TRANSFORMER_REGISTRY["setop"]
    bad = setop.validate(kv, TransformationConfig(type="setop", options={"op": "bogus"}))
    assert not bad.is_valid
    kv.createOrReplaceTempView("right_kv")
    out = setop.transform(
        kv,
        TransformationConfig(type="setop", options={"op": "union", "rightTable": "right_kv"}),
        ctx,
    )
    assert out.count() == 4
    sample = TRANSFORMER_REGISTRY["sample"]
    assert not sample.validate(
        kv, TransformationConfig(type="sample", options={"fraction": "nope"})
    ).is_valid
