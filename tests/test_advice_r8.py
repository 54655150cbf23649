"""Regression tests for the round-8 ADVICE findings.

1 (medium) — YAML boolean options were coerced with ``bool()`` on
   values that ``plans.config._str_options`` always stringifies, so
   ``'false'`` was truthy and the option could never be disabled:
   ``includeCurrent`` (rolling_zscore), ``deltas`` (lag_features),
   ``lowercase``/``alternateSign`` (feature_hash), ``excludeEqual``
   (negative_sample), and ``rules: false`` truthily switching
   market_basket to association_rules. All five now parse through
   ``etl_spark_gradle_spark.options.parse_bool``.
2 (low) — kmeans docstring overclaimed BIGINT safety (|x|<=500 AND
   dim<=4096 overflows 2^63 at scale_bits=20); distance sums would
   wrap silently. Now guarded at runtime from the measured max
   quantized magnitude.
3 (low) — kmeans empty-input path hardcoded a string id column while
   the non-empty path preserves the input id type.
4 (low) — dedup strategy=lines silently dropped legitimate user
   columns named n_lines/kept_lines before the join-back.
"""

from __future__ import annotations

import pytest

from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.options import parse_bool
from etl_spark_gradle_spark.plans.config import TransformationConfig


def test_parse_bool_contract():
    assert parse_bool(None) is False
    assert parse_bool(None, default=True) is True
    assert parse_bool(True) is True and parse_bool(False) is False
    for s in ("true", "True", "TRUE", "1", "yes", "on"):
        assert parse_bool(s) is True, s
    for s in ("false", "False", "FALSE", "0", "no", "off", ""):
        assert parse_bool(s, default=True) is False, s
    with pytest.raises(ValueError):
        parse_bool("flase")


def test_rolling_zscore_include_current_false_string(spark):
    # 'false' through the YAML adapter must mean EXCLUDE the current
    # row (the default, leakage-free posture) — pre-fix it was truthy
    # and silently made the feature self-contaminating.
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 8)],
        "series string, ts long, v double",
    )
    t = TRANSFORMER_REGISTRY["rolling_zscore"]
    base = {
        "seriesBy": "series", "timeColumn": "ts", "valueColumn": "v",
        "windowRows": "3",
    }
    off = t.transform(
        df, TransformationConfig(type="rolling_zscore",
                                 options={**base, "includeCurrent": "false"}),
        None,
    )
    on = t.transform(
        df, TransformationConfig(type="rolling_zscore",
                                 options={**base, "includeCurrent": "true"}),
        None,
    )
    default = t.transform(
        df, TransformationConfig(type="rolling_zscore", options=base), None
    )
    zcol = [c for c in off.columns if c not in df.columns][0]
    as_map = lambda d: {r["ts"]: r[zcol] for r in d.collect()}  # noqa: E731
    assert as_map(off) == as_map(default)
    assert as_map(off) != as_map(on)


def test_lag_features_deltas_false_string(spark):
    df = spark.createDataFrame(
        [("a", i, float(i * i)) for i in range(1, 6)],
        "series string, ts long, v double",
    )
    t = TRANSFORMER_REGISTRY["lag_features"]
    base = {"seriesBy": "series", "timeColumn": "ts", "valueColumn": "v"}
    out = t.transform(
        df, TransformationConfig(type="lag_features",
                                 options={**base, "deltas": "false"}),
        None,
    )
    on = t.transform(
        df, TransformationConfig(type="lag_features",
                                 options={**base, "deltas": "true"}),
        None,
    )
    assert len(out.columns) < len(on.columns)  # no delta columns


def test_feature_hash_bool_options_false_string(spark):
    df = spark.createDataFrame([(1, "Alpha Beta")], "id long, txt string")
    t = TRANSFORMER_REGISTRY["feature_hash"]
    base = {"idColumn": "id", "textColumn": "txt", "numFeatures": "64"}
    lower_off = t.transform(
        df, TransformationConfig(type="feature_hash",
                                 options={**base, "lowercase": "false"}),
        None,
    ).collect()
    lower_on = t.transform(
        df, TransformationConfig(type="feature_hash",
                                 options={**base, "lowercase": "true"}),
        None,
    ).collect()
    assert lower_off != lower_on


def test_negative_sample_exclude_equal_false_string(spark):
    # excludeEqual: 'false' must allow the positive item to appear in
    # the negatives — pre-fix the string was truthy so the option was
    # pinned to exclude.
    import types

    from etl_spark_gradle_spark.operators.corpus import negative_sample

    df = spark.createDataFrame([("x",)], "uid string")
    pool = spark.createDataFrame([("x",)], "item string")
    on = negative_sample(
        df, key_col="uid", candidates=pool, cand_col="item", k=1,
        exclude_equal=True,
    ).count()
    off = negative_sample(
        df, key_col="uid", candidates=pool, cand_col="item", k=1,
        exclude_equal=False,
    ).count()
    assert on == 0 and off == 1
    pool.createOrReplaceTempView("_advice_neg_pool")
    t = TRANSFORMER_REGISTRY["negative_sample"]
    cfg = TransformationConfig(
        type="negative_sample",
        options={"keyColumn": "uid", "candidateColumn": "item",
                 "candidatesTable": "_advice_neg_pool", "k": "1",
                 "excludeEqual": "false"},
    )
    ctx = types.SimpleNamespace(spark=spark)
    assert t.transform(df, cfg, ctx).count() == 1


def test_market_basket_rules_false_string(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")],
        "basket long, item string",
    )
    t = TRANSFORMER_REGISTRY["market_basket"]
    base = {"basketColumn": "basket", "itemColumn": "item"}
    pairs = t.transform(
        df, TransformationConfig(type="market_basket",
                                 options={**base, "rules": "false"}),
        None,
    )
    rules = t.transform(
        df, TransformationConfig(type="market_basket",
                                 options={**base, "rules": "true"}),
        None,
    )
    assert set(pairs.columns) != set(rules.columns)


def test_kmeans_overflow_guard(spark):
    from etl_spark_gradle_spark.operators.clustering import kmeans

    # dim=64 with |x|=500 at scale_bits=20: 64*(2*500*2^20)^2 ≈ 7e19
    # > 2^63 — distance sums would wrap silently without the guard.
    df = spark.createDataFrame(
        [(i, [500.0 - i] * 64) for i in range(4)],
        "id long, vec array<double>",
    )
    with pytest.raises(TransformationError, match="scale_bits"):
        kmeans(df, "id", "vec", k=2, iterations=1, scale_bits=20)
    # the suggested smaller scale stays exact and runs clean
    out = kmeans(df, "id", "vec", k=2, iterations=1, scale_bits=10)
    assert out.count() == 4


def test_kmeans_empty_input_preserves_id_type(spark):
    from pyspark.sql.types import LongType

    from etl_spark_gradle_spark.operators.clustering import kmeans

    empty = spark.createDataFrame([], "vec_id long, vec array<double>")
    out = kmeans(empty, "vec_id", "vec", k=2, iterations=1)
    assert out.schema["vec_id"].dataType == LongType()
    assert [f.name for f in out.schema] == ["vec_id", "cluster", "dist_int"]
    # unioning the empty result with a non-empty one must not fail
    nonempty = spark.createDataFrame(
        [(i, [float(i)]) for i in range(4)], "vec_id long, vec array<double>"
    )
    assert out.unionByName(
        kmeans(nonempty, "vec_id", "vec", k=2, iterations=1)
    ).count() == 4


def test_dedup_lines_rejects_count_column_collision(spark):
    df = spark.createDataFrame(
        [(1, "keep me\nkeep me\nother line", 99)],
        "doc_id long, content string, n_lines long",
    )
    t = TRANSFORMER_REGISTRY["dedup"]
    cfg = TransformationConfig(
        type="dedup",
        options={"strategy": "lines", "idColumn": "doc_id",
                 "contentColumn": "content"},
    )
    with pytest.raises(TransformationError, match="n_lines"):
        t.transform(df, cfg, None)
    # without the clash the pass-through contract still holds
    ok = t.transform(
        df.drop("n_lines"), cfg, None
    )
    assert {"doc_id", "content", "content_dedup", "n_lines",
            "kept_lines"} <= set(ok.columns)
