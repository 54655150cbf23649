"""Feature-engineering transforms (operators/features.py): target
encoding (smoothed / leave-one-out) and explicit-vocabulary one-hot."""

from __future__ import annotations

from decimal import Decimal

import pytest

from etl_spark_gradle_spark.operators.features import (
    OneHotTransformer,
    TargetEncodeTransformer,
    one_hot,
    target_encode,
)
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig


def _exact_mean(vals):
    return float(str(sum(Decimal(str(v)) for v in vals))) / len(vals)


def test_target_encode_smoothed_mean_matches_reference(spark):
    rows = (
        [("a", 10.0)] * 8
        + [("a", 20.0)] * 2
        + [("b", 100.0)] * 3
        + [("c", 50.0)]  # rare category -> pulled toward the prior
    )
    df = spark.createDataFrame(rows, "g string, y double").repartition(5)
    m = 5.0
    all_y = [y for _, y in rows]
    prior = _exact_mean(all_y)
    got = {
        (r["g"], r["y"]): r["g_te"]
        for r in target_encode(df, ["g"], "y", smoothing=m).collect()
    }
    for g in ("a", "b", "c"):
        ys = [y for gg, y in rows if gg == g]
        want = (float(str(sum(Decimal(str(v)) for v in ys))) + m * prior) / (
            len(ys) + m
        )
        for y in set(ys):
            assert abs(got[(g, y)] - want) < 1e-12, g
    # rare category sits between its own mean and the prior
    assert prior < got[("c", 50.0)] < 50.0


def test_target_encode_loo_removes_own_target(spark):
    rows = [("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, y double")
    prior = _exact_mean([1.0, 3.0, 5.0, 7.0])
    got = {
        (r["g"], r["y"]): r["enc"]
        for r in target_encode(
            df, ["g"], "y", smoothing=0.0, method="loo", output_col="enc"
        ).collect()
    }
    # LOO mean of the OTHER two rows
    assert abs(got[("a", 1.0)] - 4.0) < 1e-12
    assert abs(got[("a", 3.0)] - 3.0) < 1e-12
    assert abs(got[("a", 5.0)] - 2.0) < 1e-12
    # singleton category: empty LOO sample -> prior
    assert abs(got[("b", 7.0)] - prior) < 1e-12


def test_target_encode_null_category_null_target(spark):
    rows = [("a", 2.0), ("a", 4.0), (None, 8.0), (None, 10.0), ("a", None)]
    df = spark.createDataFrame(rows, "g string, y double")
    got = {
        (r["g"], r["y"]): r["g_te"]
        for r in target_encode(df, ["g"], "y", smoothing=0.0).collect()
    }
    # NULL category is its own group (null-safe join), mean 9.0
    assert abs(got[(None, 8.0)] - 9.0) < 1e-12
    # NULL target row still receives its category's encoding
    assert abs(got[("a", None)] - 3.0) < 1e-12


def test_target_encode_validation_and_adapter(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, y double")
    with pytest.raises(TransformationError, match="method"):
        target_encode(df, ["g"], "y", method="kfold")
    with pytest.raises(TransformationError, match="smoothing"):
        target_encode(df, ["g"], "y", smoothing=-1)
    with pytest.raises(TransformationError, match="not in schema"):
        target_encode(df, ["zz"], "y")
    with pytest.raises(TransformationError, match="reserved"):
        target_encode(df.withColumnRenamed("y", "_te_n"), ["g"], "_te_n")

    tf = TargetEncodeTransformer()
    out = tf.transform(
        df,
        TransformationConfig(
            type="target_encode",
            options={
                "categoryColumns": "g", "targetColumn": "y",
                "smoothing": "0", "outputColumn": "enc",
            },
        ),
        RunContext.create("t", spark),
    )
    assert out.collect()[0]["enc"] == 1.0
    bad = tf.validate(
        df,
        TransformationConfig(
            type="target_encode",
            options={"categoryColumns": "g", "targetColumn": "y",
                     "smoothing": "much"},
        ),
    )
    assert not bad.is_valid


def test_one_hot_vocab_other_and_nulls(spark):
    df = spark.createDataFrame(
        [("red",), ("blue",), ("green",), (None,)], "c string"
    )
    out = one_hot(df, "c", ["red", "blue"], other_col="c_other")
    got = {r["c"]: (r["c_red"], r["c_blue"], r["c_other"]) for r in out.collect()}
    assert got["red"] == (1, 0, 0)
    assert got["blue"] == (0, 1, 0)
    assert got["green"] == (0, 0, 1)
    assert got[None] == (0, 0, 1)  # null-safe flags: 0, never NULL
    # zero shuffles: no Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    with pytest.raises(TransformationError, match="unique"):
        one_hot(df, "c", ["x", "x"])
    with pytest.raises(TransformationError, match="value list"):
        one_hot(df, "c", [])

    tf = OneHotTransformer()
    out2 = tf.transform(
        df,
        TransformationConfig(
            type="one_hot",
            options={"column": "c", "values": "red,blue", "prefix": "is"},
        ),
        RunContext.create("t", spark),
    )
    assert "is_red" in out2.columns and "is_blue" in out2.columns


class TestRobustScale:
    def test_mad_mode_hand_computed(self, spark):
        from etl_spark_gradle_spark.operators.features import robust_scale

        vals = list(range(1, 10)) + [1000]
        df = spark.createDataFrame([("g", float(v)) for v in vals], "grp string, x double")
        out = {r.x: r.x_scaled for r in robust_scale(df, "x", group_by=["grp"]).collect()}
        med, mad = 5.0, 2.0  # type-1 medians of values / abs deviations
        for v in vals:
            assert abs(out[float(v)] - (v - med) / (1.4826 * mad)) < 1e-12
        # the outlier is far out in robust sigmas yet did not drag the scale
        assert out[1000.0] > 300

    def test_iqr_mode(self, spark):
        from etl_spark_gradle_spark.operators.features import robust_scale

        vals = list(range(1, 10)) + [1000]
        df = spark.createDataFrame([("g", float(v)) for v in vals], "grp string, x double")
        out = {r.x: r.x_scaled for r in
               robust_scale(df, "x", group_by=["grp"], method="iqr").collect()}
        # type-1: q1 = 3rd of 10 -> 3, q3 = 8th -> 8, med = 5th -> 5
        for v in vals:
            assert abs(out[float(v)] - (v - 5.0) / 5.0) < 1e-12

    def test_degenerate_and_null_inputs(self, spark):
        from etl_spark_gradle_spark.operators.features import robust_scale

        df = spark.createDataFrame(
            [("c", 7.0), ("c", 7.0), ("c", None), ("d", 1.0), ("d", 2.0), ("d", 3.0)],
            "grp string, x double",
        )
        rows = robust_scale(df, "x", group_by=["grp"]).collect()
        c = [r for r in rows if r.grp == "c"]
        assert len(c) == 3 and all(r.x_scaled is None for r in c)  # MAD=0 + null x
        d = {r.x: r.x_scaled for r in rows if r.grp == "d"}
        assert abs(d[3.0] - 1.0 / 1.4826) < 1e-12

    def test_rows_never_dropped_and_frame_not_reshuffled(self, spark, sf_dir):
        from etl_spark_gradle_spark.operators.features import robust_scale
        from tests.conftest import load_table

        ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
        out = robust_scale(ev, "value", group_by=["event_type"])
        assert out.count() == ev.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the row-level enrichment join must be broadcast, not a shuffle
        # of the frame (histogram shuffles for the stats are expected)
        assert "BroadcastHashJoin" in plan

    def test_global_ungrouped_both_methods(self, spark):
        from etl_spark_gradle_spark.operators.features import robust_scale

        df = spark.createDataFrame([(float(v),) for v in range(1, 11)], "x double")
        mad = {r.x: r.x_scaled for r in robust_scale(df, "x").collect()}
        # type-1: median of 1..10 -> 5; adev median -> 2
        assert abs(mad[10.0] - (10 - 5.0) / (1.4826 * 2.0)) < 1e-12
        iqr = {r.x: r.x_scaled for r in robust_scale(df, "x", method="iqr").collect()}
        # q1 = 3rd -> 3, q3 = 8th -> 8
        assert abs(iqr[10.0] - (10 - 5.0) / 5.0) < 1e-12

    def test_validation_and_adapter(self, spark):
        import pytest as _pytest

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.features import (
            RobustScaleTransformer,
            robust_scale,
        )
        from etl_spark_gradle_spark.operators.relational import TransformationError
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

        df = spark.createDataFrame([("g", 1.0)], "grp string, x double")
        with _pytest.raises(TransformationError, match="method"):
            robust_scale(df, "x", method="bogus")
        with _pytest.raises(TransformationError, match="not in schema"):
            robust_scale(df, "nope")
        with _pytest.raises(TransformationError, match="already in schema"):
            robust_scale(df.withColumn("x_scaled", df.x), "x")
        assert "robust_scale" in TRANSFORMER_REGISTRY
        cfg = TransformationConfig(
            type="robust_scale",
            options={"column": "x", "groupBy": "grp", "method": "iqr"},
        )
        out = RobustScaleTransformer().transform(df, cfg, RunContext.create("t", spark))
        assert "x_scaled" in out.columns
        bad = TransformationConfig(type="robust_scale", options={"scale": "abc"})
        res = RobustScaleTransformer().validate(df, bad)
        assert not res.is_valid and any("scale" in e for e in res.errors)


def test_robust_scale_all_null_global_keeps_rows(spark):
    """All-NULL value column on the UNGROUPED path: the stats frame is
    empty and a crossJoin would erase the input — rows must survive
    with a NULL scaled column (review finding)."""
    from etl_spark_gradle_spark.operators.features import robust_scale

    df = spark.createDataFrame([(1, None), (2, None)], "id long, x double")
    rows = robust_scale(df, "x").collect()
    assert len(rows) == 2
    assert all(r.x_scaled is None for r in rows)
    rows2 = robust_scale(df, "x", method="iqr").collect()
    assert len(rows2) == 2 and all(r.x_scaled is None for r in rows2)


def test_one_hot_sanitized_name_collision_disambiguated(spark):
    """Distinct vocabulary values that sanitize to the same column name
    ('a.b' vs 'a_b') must get DISTINCT flag columns — the old behavior
    silently overwrote the first flag with the second."""
    from etl_spark_gradle_spark.operators.features import one_hot

    df = spark.createDataFrame(
        [("a.b",), ("a_b",), ("c",)], "v string"
    )
    out = one_hot(df, "v", ["a.b", "a_b", "c"])
    flag_cols = [c for c in out.columns if c != "v"]
    assert len(flag_cols) == 3, flag_cols
    rows = {r["v"]: r.asDict() for r in out.collect()}
    # each value lights exactly its own flag
    assert rows["a.b"]["v_a_b"] == 1 and rows["a.b"]["v_a_b__1"] == 0
    assert rows["a_b"]["v_a_b"] == 0 and rows["a_b"]["v_a_b__1"] == 1
    assert sum(rows["c"][c] for c in flag_cols) == 1

    # pre-existing output column name is an error, not an overwrite
    from etl_spark_gradle_spark.operators.relational import TransformationError
    import pytest as _pytest

    clash = spark.createDataFrame([("x", 9)], "v string, v_x int")
    with _pytest.raises(TransformationError, match="already in schema"):
        one_hot(clash, "v", ["x"])


def test_one_hot_other_col_clash_refused(spark):
    """Regression (code-review): other_col overwriting an existing
    column is the same silent-overwrite class as the flag columns."""
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.features import one_hot
    from etl_spark_gradle_spark.operators.relational import TransformationError

    df = spark.createDataFrame([("x", 1)], "v string, flags int")
    with _pytest.raises(TransformationError, match="already in schema"):
        one_hot(df, "v", ["x"], other_col="flags")


def _py_feature_hash(docs, n_features, lowercase=True, signed=False):
    """Pure-python reference of the md5-prefix hashing trick."""
    import hashlib
    import re as _re

    out = {}
    for doc_id, text in docs:
        if text is None:
            continue
        for tok in [t for t in _re.split(r"\s+", text) if t != ""]:
            if lowercase:
                tok = tok.lower()
            h = hashlib.md5(("fh:" + tok).encode()).hexdigest()
            bucket = int(h[:8], 16) % n_features
            sgn = 1 if (not signed or int(h[8], 16) % 2 == 0) else -1
            out[(doc_id, bucket)] = out.get((doc_id, bucket), 0) + sgn
    return out


def test_feature_hash_matches_python_reference(spark):
    from etl_spark_gradle_spark.operators.features import feature_hash

    docs = [
        (1, "The quick brown fox the QUICK fox"),
        (2, "hello   world\thello"),
        (3, None),          # null text -> no rows
        (4, ""),            # empty text -> no rows
        (None, "orphan"),   # null id is a legitimate group
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(3)
    got = {
        (r.doc_id, r.feature): r.tf
        for r in feature_hash(df, "doc_id", "text", n_features=16).collect()
    }
    assert got == _py_feature_hash(docs, 16)
    assert all(0 <= f < 16 for _, f in got)
    # per-doc token counts survive the bucketing (no tokens lost)
    assert sum(tf for (d, _), tf in got.items() if d == 1) == 7
    assert sum(tf for (d, _), tf in got.items() if d == 2) == 3


def test_feature_hash_signed_and_pretokenized(spark):
    from etl_spark_gradle_spark.operators.features import feature_hash

    docs = [(1, "a b c d e f g h i j k l"), (2, "a a a a")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.feature): r.tf
        for r in feature_hash(
            df, "doc_id", "text", n_features=4, alternate_sign=True
        ).collect()
    }
    assert got == _py_feature_hash(docs, 4, signed=True)
    # pre-tokenized array input skips the split (and the lowercase
    # option still applies to the array elements)
    arr = spark.createDataFrame(
        [(1, ["The", "the", "fox"])], "doc_id long, toks array<string>"
    )
    got_arr = {
        (r.doc_id, r.feature): r.tf
        for r in feature_hash(arr, "doc_id", "toks", n_features=16).collect()
    }
    assert got_arr == _py_feature_hash([(1, "The the fox")], 16)


def test_feature_hash_validation_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.features import feature_hash

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(TransformationError, match="n_features"):
        feature_hash(df, "doc_id", "text", n_features=0)
    with pytest.raises(TransformationError, match="not in input schema"):
        feature_hash(df, "doc_id", "missing")
    tf = TRANSFORMER_REGISTRY["feature_hash"]
    cfg = TransformationConfig(
        type="feature_hash",
        options={"idColumn": "doc_id", "textColumn": "text",
                 "numFeatures": 8},
    )
    assert tf.validate(df, cfg).is_valid
    out = tf.transform(df, cfg, RunContext(pipeline_id="t", run_id="r", spark=spark))
    assert set(out.columns) == {"doc_id", "feature", "tf"}
    assert out.count() == 2
    bad = TransformationConfig(
        type="feature_hash", options={"idColumn": "doc_id"}
    )
    assert not tf.validate(df, bad).is_valid
