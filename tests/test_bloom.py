"""Bloom-pruned semi join: parity with the plain semi join, superset
property of the raw Bloom pass, null handling, plan shape, and the
YAML transformer contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.bloom import (
    BloomSemiJoinTransformer,
    bloom_filter_rows,
    bloom_semi_join,
    build_bloom,
)
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig
from tests.conftest import load_table


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, "lineitem")


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, "orders")


def _plain_semi(fact, build, fact_key, build_key):
    keys = build.select(F.col(build_key).alias(fact_key)).distinct()
    return fact.join(keys, on=fact_key, how="left_semi")


class TestBloomSemiJoin:
    def test_parity_with_plain_semi_join(self, lineitem, orders):
        build = orders.where("o_orderpriority = '1-URGENT'")
        res = bloom_semi_join(lineitem, build, "l_orderkey", "o_orderkey")
        plain = _plain_semi(lineitem, build, "l_orderkey", "o_orderkey")
        assert res.exceptAll(plain).count() == 0
        assert plain.exceptAll(res).count() == 0

    def test_parity_under_heavy_bitmap_saturation(self, lineitem, orders):
        """A deliberately tiny bitmap (64 bits for hundreds of keys) is
        saturated with false positives — the exact verify join must
        still produce the plain-semi-join result."""
        build = orders.where("o_orderpriority = '1-URGENT'")
        res = bloom_semi_join(
            lineitem, build, "l_orderkey", "o_orderkey", num_bits=64, num_hashes=2
        )
        plain = _plain_semi(lineitem, build, "l_orderkey", "o_orderkey")
        assert res.exceptAll(plain).count() == 0
        assert plain.exceptAll(res).count() == 0

    def test_raw_bloom_is_a_superset_that_prunes(self, lineitem, orders):
        build = orders.where("o_orderpriority = '1-URGENT'")
        superset = bloom_semi_join(
            lineitem, build, "l_orderkey", "o_orderkey", exact=False
        )
        plain = _plain_semi(lineitem, build, "l_orderkey", "o_orderkey")
        # every true match survives the bloom (no false negatives)
        assert plain.exceptAll(superset).count() == 0
        # and the bloom actually prunes vs the raw fact side
        assert superset.count() < lineitem.count()

    def test_disjoint_keys_yield_empty(self, spark, lineitem):
        build = spark.createDataFrame([(-1,), (-2,)], "l_orderkey long")
        assert bloom_semi_join(lineitem, build, "l_orderkey").count() == 0

    def test_null_probe_keys_dropped_like_equi_join(self, spark):
        fact = spark.createDataFrame(
            [(1, "a"), (None, "b"), (2, "c")], "k long, v string"
        )
        build = spark.createDataFrame([(1,), (None,)], "k long")
        res = bloom_semi_join(fact, build, "k")
        assert [r.v for r in res.orderBy("v").collect()] == ["a"]

    def test_key_type_mismatch_refused(self, spark):
        fact = spark.createDataFrame([(1,)], "k int")
        build = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(TransformationError, match="key types differ"):
            bloom_semi_join(fact, build, "k")

    def test_probe_side_never_sort_merges(self, lineitem, orders):
        """The bitmap probes must be broadcast joins; the only shuffle
        the fact side may hit is the survivor-sized verify join."""
        build = orders.where("o_orderpriority = '1-URGENT'")
        res = bloom_semi_join(lineitem, build, "l_orderkey", "o_orderkey")
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_bitmap_bounded_by_num_bits(self, spark, orders):
        bitmap = build_bloom(
            orders.select("o_orderkey"), "o_orderkey", num_bits=1024, num_hashes=3
        )
        rows = bitmap.collect()
        assert len(rows) <= 1024 // 64
        assert all(0 <= r["__bloom_word_idx"] < 1024 // 64 for r in rows)

    def test_param_validation(self, spark, orders):
        with pytest.raises(TransformationError, match="num_bits"):
            build_bloom(orders, "o_orderkey", num_bits=32)
        with pytest.raises(TransformationError, match="num_hashes"):
            build_bloom(orders, "o_orderkey", num_hashes=0)
        with pytest.raises(TransformationError, match="not in schema"):
            bloom_filter_rows(orders, "nope", orders, 1024, 2)


class TestBloomTransformer:
    def _ctx(self, spark):
        return RunContext.create("t-bloom", spark)

    def test_yaml_path(self, spark, lineitem, orders):
        orders.where("o_orderpriority = '1-URGENT'").createOrReplaceTempView(
            "bloom_build"
        )
        cfg = TransformationConfig(
            type="bloom_semi_join",
            options={
                "leftKey": "l_orderkey",
                "rightKey": "o_orderkey",
                "rightTable": "bloom_build",
                "numBits": "65536",
            },
        )
        out = BloomSemiJoinTransformer().transform(lineitem, cfg, self._ctx(spark))
        plain = _plain_semi(
            lineitem,
            spark.table("bloom_build"),
            "l_orderkey",
            "o_orderkey",
        )
        assert out.count() == plain.count()

    def test_validation_errors(self, spark, lineitem):
        cfg = TransformationConfig(
            type="bloom_semi_join", options={"numBits": "8"}
        )
        res = BloomSemiJoinTransformer().validate(lineitem, cfg)
        assert not res.is_valid
        joined = "; ".join(res.errors)
        assert "leftKey" in joined and "rightTable" in joined and "num_bits" in joined

    def test_registered(self):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

        assert "bloom_semi_join" in TRANSFORMER_REGISTRY
