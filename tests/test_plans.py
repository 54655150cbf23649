"""Physical-plan regression guards: the scale-critical plan shapes must
survive refactors (explain-only — no job execution)."""

from __future__ import annotations

import io
import re
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


def test_bucketed_write_enables_colocated_join(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key into the same bucket count
    join WITHOUT any Exchange — the 100 TB co-location story. This one
    executes a small write (bucket metadata must exist in the catalog)."""
    from etl_spark_gradle_spark.sinks.loaders import load_file

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    load_file(
        orders,
        {
            "path": str(tmp_path / "orders_b"),
            "bucketBy": "o_custkey",
            "buckets": "4",
            "sortBy": "o_custkey",
            "table": "orders_bucketed",
        },
        write_mode="overwrite",
    )
    load_file(
        customer,
        {
            "path": str(tmp_path / "customer_b"),
            "bucketBy": "c_custkey",
            "buckets": "4",
            "sortBy": "c_custkey",
            "table": "customer_bucketed",
        },
        write_mode="overwrite",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_bucketed").join(
            spark.table("customer_bucketed"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides pre-bucketed: no shuffle
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")


def test_bucketed_write_validates_config(spark, sf_dir, tmp_path):
    from etl_spark_gradle_spark.plans.config import ConfigError
    from etl_spark_gradle_spark.sinks.loaders import load_file

    df = spark.range(3)
    import pytest

    with pytest.raises(ConfigError, match="table"):
        load_file(df, {"path": str(tmp_path / "x"), "bucketBy": "id"})
    with pytest.raises(ConfigError, match="buckets"):
        load_file(df, {"path": str(tmp_path / "x"), "bucketBy": "id", "table": "t"})


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Hive-style partitionBy output + a filter on the partition column
    → PartitionFilters at the scan: only matching directories are read
    (the static partition-pruning story of
    ``benchmark/PartitioningStrategySpec.scala:111-137``)."""
    from etl_spark_gradle_spark.sinks.loaders import load_file

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_part")
    load_file(
        orders,
        {"path": path, "format": "parquet"},
        write_mode="overwrite",
        partition_by=("o_orderpriority",),
    )
    back = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = plan_of(back)
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
    assert back.count() == orders.filter("o_orderpriority = '1-URGENT'").count()


def test_analytics_single_exchange(spark, sf_dir):
    """All analytic columns share one window spec → exactly one
    hashpartitioning Exchange and one Window node."""
    from etl_spark_gradle_spark.operators.relational import analytic_columns

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = analytic_columns(
        orders,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        specs=[
            ("p", "lag", ["o_totalprice", "1"]),
            ("n", "lead", ["o_totalprice"]),
            ("rt", "running_sum", ["o_totalprice"]),
        ],
    )
    plan = plan_of(out)
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1


def test_pivot_partial_aggregation(spark, sf_dir):
    """Explicit-values pivot plans the same partial+final hash agg as a
    plain groupBy — pivot cells are just more aggregate expressions."""
    from etl_spark_gradle_spark.operators.relational import pivot_table
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = pivot_table(
        li,
        group_by=["l_returnflag"],
        pivot_column="l_linestatus",
        pivot_values=["F", "O"],
        aggregations=[AggregateExpr(column="l_quantity", function="sum", alias="s")],
    )
    plan = plan_of(out)
    assert "partial_sum" in plan  # map-side combine of every pivot cell
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1  # ONE shuffle
    assert "pivotfirst" not in plan  # not the two-shuffle built-in pivot


def test_sort_within_partitions_write_produces_sorted_files(spark, sf_dir, tmp_path):
    """sortWithinPartitions sink option: a narrow (shuffle-free) local
    sort before the write, so every output file is internally sorted and
    parquet row-group min/max ranges are tight — the data-skipping knob
    for always-filtered columns at 100 TB."""
    import glob

    import pyarrow.parquet as pq

    from etl_spark_gradle_spark.sinks.loaders import load_file

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(4)
    out = str(tmp_path / "sorted")
    res = load_file(
        li,
        {"path": out, "format": "parquet", "sortWithinPartitions": "l_orderkey"},
        write_mode="overwrite",
    )
    assert res.records_written == li.count()
    files = glob.glob(out + "/*.parquet")
    assert len(files) > 1
    for f in files:
        vals = pq.read_table(f, columns=["l_orderkey"])["l_orderkey"].to_pylist()
        assert vals == sorted(vals)
    assert spark.read.parquet(out).count() == li.count()


def test_join_strategy_hints(spark, sf_dir):
    import re

    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
        join_view,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "cust_hint_v"
    )

    def plan(strategy):
        return plan_of(
            join_view(
                orders, spark, "cust_hint_v", "o_custkey", "c_custkey", "inner",
                strategy=strategy,
            )
        )

    # shuffle_hash: hash-build per partition, BOTH sorts skipped
    p = plan("shuffle_hash")
    assert re.search(r"\(\d+\) ShuffledHashJoin", p)
    assert "SortMergeJoin" not in p
    # merge: forced sort-merge even though the dim is broadcast-sized
    p = plan("merge")
    assert re.search(r"\(\d+\) SortMergeJoin", p)
    # broadcast strategy == broadcast knob
    p = plan("broadcast")
    assert re.search(r"\(\d+\) BroadcastHashJoin", p)

    import pytest as _pytest

    with _pytest.raises(TransformationError, match="join strategy"):
        join_view(orders, spark, "cust_hint_v", "o_custkey", "c_custkey",
                  "inner", strategy="bogus")
