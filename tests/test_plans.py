"""Physical-plan regression guards: the scale-critical plan shapes must
survive refactors (explain-only — no job execution)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators import dedup as dd
from etl_spark_gradle_spark.operators.relational import (
    filter_rows,
    join_view,
    rank_rows,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = filter_rows(li, "l_quantity > 45").select("l_orderkey", "l_quantity")
    plan = plan_of(out)
    assert "GreaterThan(l_quantity,45.0)" in plan  # reached the scan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan  # pruned


def test_join_broadcasts_small_dimension(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView("cust_v")
    out = join_view(
        orders, spark, "cust_v", "o_custkey", "c_custkey", "inner", broadcast_right=True
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ranking_plans_window_group_limit(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = rank_rows(orders, ["o_orderpriority"], ["o_totalprice DESC"], top_k=3)
    assert "WindowGroupLimit" in plan_of(out)


def test_exact_dedup_tiebreak_plans_window_group_limit(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = dd.exact_dedup(li, keys=["l_orderkey"], tiebreak_col="l_linenumber")
    assert "WindowGroupLimit" in plan_of(out)


def test_aggregation_is_partial_then_final(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = plan_of(out)
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "hashpartitioning(l_returnflag" in plan
