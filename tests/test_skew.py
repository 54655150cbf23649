"""Salted skew join: exact equality with the plain join under
pathological key skew, plan-shape guards, and the YAML adapter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.operators.skew import SkewJoinTransformer, skew_join
from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig


def _skewed_frames(spark, n_hot=400, n_cold=200):
    """Fact side where key 7 owns ~2/3 of all rows; dimension side with
    1-3 rows per key (including keys with multiple matches, a key
    missing from the dimension, and a null fact key)."""
    fact = spark.createDataFrame(
        [(7, f"hot{i}") for i in range(n_hot)]
        + [(i % 50, f"cold{i}") for i in range(n_cold)]
        + [(999, "orphan"), (None, "nullkey")],
        "k int, payload string",
    ).repartition(8)
    dim = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)]
        + [(7, "dim7_b"), (7, "dim7_c"), (3, "dim3_b")],
        "k int, attr string",
    )
    return fact, dim


def _sorted_rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("mode", ["explicit", "threshold", "sampled"])
def test_skew_join_equals_plain_join(spark, how, mode):
    fact, dim = _skewed_frames(spark)
    kwargs = {
        "explicit": {"hot_keys": [7, 3]},
        "threshold": {"hot_threshold": 5},
        "sampled": {"hot_threshold": 50, "sample_fraction": 0.5},
    }[mode]
    got = skew_join(fact, dim, on=["k"], how=how, salt_buckets=4, **kwargs)
    want = fact.join(dim, on=["k"], how=how)
    assert got.columns == want.columns
    assert _sorted_rows(got) == _sorted_rows(want)


def test_skew_join_composite_keys_and_duplicate_rows(spark):
    left = spark.createDataFrame(
        [(1, "a", i) for i in range(60)] + [(2, "b", 0), (2, "b", 0)],
        "k1 int, k2 string, v int",
    )
    right = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (2, "b", "z"), (3, "c", "w")],
        "k1 int, k2 string, w string",
    )
    got = skew_join(
        left, right, on=["k1", "k2"], salt_buckets=3, hot_keys=[(1, "a")]
    )
    want = left.join(right, on=["k1", "k2"], how="inner")
    assert _sorted_rows(got) == _sorted_rows(want)


def test_skew_join_no_hot_keys_short_circuits(spark):
    fact, dim = _skewed_frames(spark, n_hot=5, n_cold=20)
    got = skew_join(fact, dim, on=["k"], hot_threshold=10_000)
    # no key reaches the threshold -> the plain join plan, no salt node
    assert "__skew_salt" not in got._jdf.queryExecution().toString()
    want = fact.join(dim, on=["k"], how="inner")
    assert _sorted_rows(got) == _sorted_rows(want)


def test_skew_join_plan_shape(spark):
    """The hot path must join on (keys + salt) and the split joins must
    broadcast the frozen hot-key set."""
    fact, dim = _skewed_frames(spark)
    got = skew_join(fact, dim, on=["k"], salt_buckets=4, hot_keys=[7])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__skew_salt" in plan  # salt participates in the hot join keys
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "Union" in plan


def test_skew_join_validation(spark):
    fact, dim = _skewed_frames(spark, n_hot=5, n_cold=5)
    with pytest.raises(TransformationError, match="exactly one of"):
        skew_join(fact, dim, on=["k"])
    with pytest.raises(TransformationError, match="exactly one of"):
        skew_join(fact, dim, on=["k"], hot_keys=[7], hot_threshold=5)
    with pytest.raises(TransformationError, match="right schema"):
        skew_join(fact, dim, on=["payload"], hot_keys=["x"])
    with pytest.raises(TransformationError, match="inner.*left"):
        skew_join(fact, dim, on=["k"], how="full", hot_keys=[7])
    with pytest.raises(TransformationError, match="salt_buckets"):
        skew_join(fact, dim, on=["k"], salt_buckets=1, hot_keys=[7])
    with pytest.raises(TransformationError, match="reserved"):
        skew_join(
            fact.withColumn("__skew_salt", F.lit(1)), dim, on=["k"], hot_keys=[7]
        )


def test_skew_join_yaml_adapter(spark):
    fact, dim = _skewed_frames(spark)
    dim.createOrReplaceTempView("skew_dim")
    ctx = RunContext.create("t", spark)
    tf = SkewJoinTransformer()

    cfg = TransformationConfig(
        type="skew_join",
        options={
            "rightTable": "skew_dim",
            "joinKeys": "k",
            "joinType": "left",
            "saltBuckets": "4",
            "hotThreshold": "5",
        },
    )
    got = tf.transform(fact, cfg, ctx)
    want = fact.join(dim, on=["k"], how="left")
    assert _sorted_rows(got) == _sorted_rows(want)

    bad = TransformationConfig(
        type="skew_join",
        options={"rightTable": "skew_dim", "joinKeys": "k"},
    )
    res = tf.validate(fact, bad)
    assert not res.is_valid and any("hotKeys" in e for e in res.errors)

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    assert type(TRANSFORMER_REGISTRY["skew_join"]) is SkewJoinTransformer


def test_skew_join_null_keys_bypass_and_null_hot_sentinel(spark):
    """NULL join keys: excluded from hot candidacy, right-null rows
    dropped, left-null rows bypass the join entirely (null-padded for
    left, dropped for inner) — results still identical to the plain
    join even when NULL is the dominant 'sentinel' key."""
    fact = spark.createDataFrame(
        [(None, f"n{i}") for i in range(300)]
        + [(i % 20, f"c{i}") for i in range(100)],
        "k int, payload string",
    ).repartition(6)
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(20)] + [(None, "dnull")],
        "k int, attr string",
    )
    for how in ("inner", "left"):
        got = skew_join(fact, dim, on=["k"], how=how, hot_threshold=50)
        want = fact.join(dim, on=["k"], how=how)
        assert _sorted_rows(got) == _sorted_rows(want), how
    # explicit NULL hot key is silently ignored, not crashed on
    got = skew_join(fact, dim, on=["k"], how="left", hot_keys=[None, 3])
    want = fact.join(dim, on=["k"], how="left")
    assert _sorted_rows(got) == _sorted_rows(want)


def test_skew_join_adapter_rejects_bad_sample_fraction(spark):
    fact, dim = _skewed_frames(spark, n_hot=5, n_cold=5)
    dim.createOrReplaceTempView("skew_dim_sf")
    res = SkewJoinTransformer().validate(
        fact,
        TransformationConfig(
            type="skew_join",
            options={
                "rightTable": "skew_dim_sf", "joinKeys": "k",
                "hotThreshold": "5", "sampleFraction": "ten-percent",
            },
        ),
    )
    assert not res.is_valid and any("sampleFraction" in e for e in res.errors)


class TestSkewReport:
    def test_counts_share_rank_and_nulls(self, spark):
        from etl_spark_gradle_spark.operators.skew import skew_report

        rows = (
            [("hot", "x")] * 6 + [("warm", "x")] * 3
            + [(None, "y")] * 2 + [("cold", None)]
        )
        df = spark.createDataFrame(rows, "k string, c string").repartition(4)
        got = {
            (r.column, r.value): (r.n, r.rank, r.share)
            for r in skew_report(df, ["k", "c"], top_k=2).collect()
        }
        assert got[("k", "hot")] == (6, 1, 6 / 12)
        assert got[("k", "warm")] == (3, 2, 3 / 12)
        # NULL is reported as a real (stringified-to-None) hot key
        assert got[("c", "x")] == (9, 1, 9 / 12)
        assert got[("c", "y")] == (2, 2, 2 / 12)
        # the NULL value (1 row) falls past top_k=2 here; raise top_k
        # and it must surface as a real reported key
        full = {
            (r.column, r.value): r.n
            for r in skew_report(df, ["c"], top_k=5).collect()
        }
        assert full[("c", None)] == 1
        # top_k cuts per column
        assert all(r <= 2 for (_, _), (_, r, _) in
                   [((a, b), v) for (a, b), v in got.items()])
        assert len([1 for (col, _) in got if col == "k"]) == 2

    def test_validation_and_adapter(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.relational import (
            TransformationError,
        )
        from etl_spark_gradle_spark.operators.skew import skew_report
        from etl_spark_gradle_spark.plans.config import (
            RunContext,
            TransformationConfig,
        )

        df = spark.createDataFrame([("a", 1)], "k string, v int")
        with pytest.raises(TransformationError, match="columns"):
            skew_report(df, [])
        with pytest.raises(TransformationError, match="top_k"):
            skew_report(df, ["k"], top_k=0)
        t = TRANSFORMER_REGISTRY["skew_report"]
        cfg = TransformationConfig(
            type="skew_report", options={"columns": "k,v", "topK": 3}
        )
        assert t.validate(df, cfg).is_valid
        out = t.transform(
            df, cfg, RunContext(pipeline_id="t", run_id="r", spark=spark)
        )
        assert set(out.columns) == {"column", "value", "n", "share", "rank"}
        assert not t.validate(
            df, TransformationConfig(type="skew_report", options={})
        ).is_valid
