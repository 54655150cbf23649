"""Bucketed co-located joins: writing both sides bucketed on the join
key must make the later equi-join SHUFFLE-FREE (no Exchange in the
physical plan) — the 100-TB pattern the loader's ``bucketBy`` option
exists for (see ``sinks/loaders.py``: bucket metadata lives in the
catalog, so these writes go through ``saveAsTable``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark_gradle_spark.sinks.loaders import load_file


def _write_bucketed(spark, df, tmp_path, table, key, buckets=4, sort=True):
    opts = {
        "path": str(tmp_path / table),
        "format": "parquet",
        "table": table,
        "bucketBy": key,
        "buckets": str(buckets),
    }
    if sort:
        opts["sortBy"] = key
    load_file(df, opts, "overwrite")


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    facts = spark.range(20_000).select(
        (F.col("id") % 500).alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    dim = spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("attr")
    )
    _write_bucketed(spark, facts, tmp_path, "bj_facts", "k")
    _write_bucketed(spark, dim, tmp_path, "bj_dim", "k")
    yield spark.table("bj_facts"), spark.table("bj_dim"), facts, dim
    spark.sql("DROP TABLE IF EXISTS bj_facts")
    spark.sql("DROP TABLE IF EXISTS bj_dim")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Same bucket count + same key on both sides -> the sort-merge
    join reads bucket i against bucket i directly; any Exchange in the
    plan means the co-location contract broke."""
    bf, bd, _, _ = bucketed_pair
    # make sure the broadcast path doesn't mask the property under test
    thr0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bf.join(bd, on=["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 20_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr0)


def test_bucketed_sorted_join_skips_the_sort(spark, bucketed_pair):
    """sortBy'd buckets additionally satisfy the sort-merge ordering
    requirement: no Sort node above either scan. Needs BOTH halves of
    the contract: the loader writes ONE file per bucket (sortBy is a
    per-file guarantee), and the read session opts in via the
    spark.sql.legacy.bucketedTableScan.outputOrdering conf (Spark >= 3
    ignores sortBy metadata by default)."""
    bf, bd, _, _ = bucketed_pair
    thr0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        joined = bf.join(bd, on=["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
        assert joined.count() == 20_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr0)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )


def test_bucketed_join_results_equal_plain_join(spark, bucketed_pair):
    bf, bd, facts, dim = bucketed_pair
    got = sorted(tuple(r) for r in bf.join(bd, on=["k"]).collect())
    want = sorted(tuple(r) for r in facts.join(dim, on=["k"]).collect())
    assert got == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the write-time hash
    partitioning — groupBy(k) with no Exchange."""
    bf, _, _, _ = bucketed_pair
    agg = bf.groupBy("k").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 500


def test_bucketed_write_validation(spark, tmp_path):
    from etl_spark_gradle_spark.sources.extractors import ConfigError

    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ConfigError, match="table"):
        load_file(
            df,
            {"path": str(tmp_path / "x"), "format": "parquet",
             "bucketBy": "k", "buckets": "4"},
            "overwrite",
        )
    with pytest.raises(ConfigError, match="buckets"):
        load_file(
            df,
            {"path": str(tmp_path / "y"), "format": "parquet",
             "bucketBy": "k", "table": "bj_bad"},
            "overwrite",
        )
