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

# ---------------------------------------------------------------------------
# semi/anti joins, as-of join, range join, rollup/cube
# ---------------------------------------------------------------------------


def test_join_semi_anti(spark, kv):
    from etl_spark_gradle_spark.operators.relational import join_view

    spark.createDataFrame([(2,), (3,), (99,)], ["rk"]).createOrReplaceTempView("keys_sa")
    semi = join_view(kv, spark, "keys_sa", "k", "rk", "semi")
    assert semi.columns == ["k", "v"]  # left columns only
    assert {r.k for r in semi.collect()} == {2, 3}
    anti = join_view(kv, spark, "keys_sa", "k", "rk", "anti")
    assert {r.k for r in anti.collect()} == {1, 4}


def test_asof_join_backward_forward_tolerance(spark):
    from etl_spark_gradle_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"), (2, "2024-01-01 10:00:00")],
        ["k", "t"],
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 9.0), (1, "2024-01-01 11:30:00", 11.5),
         (3, "2024-01-01 09:00:00", 1.0)],
        ["k", "t", "val"],
    ).select("k", F.col("t").cast("timestamp").alias("t"), "val")

    back = asof_join(left, right, "k", "k", "t", "t", ["val"])
    got = {(r.k, str(r.t)): r.val for r in back.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 9.0
    assert got[(1, "2024-01-01 12:00:00")] == 11.5
    assert got[(2, "2024-01-01 10:00:00")] is None  # no right rows for key

    fwd = asof_join(left, right, "k", "k", "t", "t", ["val"], direction="forward")
    gotf = {(r.k, str(r.t)): r.val for r in fwd.collect()}
    assert gotf[(1, "2024-01-01 10:00:00")] == 11.5  # nearest at-or-after
    assert gotf[(1, "2024-01-01 12:00:00")] is None

    tol = asof_join(left, right, "k", "k", "t", "t", ["val"], tolerance_seconds=1800)
    gott = {(r.k, str(r.t)): r.val for r in tol.collect()}
    assert gott[(1, "2024-01-01 10:00:00")] is None  # 9:00 is 1h away > 30min
    assert gott[(1, "2024-01-01 12:00:00")] == 11.5  # 11:30 within 30min


def test_asof_join_equal_timestamp_inclusive(spark):
    from etl_spark_gradle_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, "2024-01-01 10:00:00")], ["k", "t"]).select(
        "k", F.col("t").cast("timestamp").alias("t")
    )
    right = spark.createDataFrame([(1, "2024-01-01 10:00:00", 5.0)], ["k", "t", "val"]).select(
        "k", F.col("t").cast("timestamp").alias("t"), "val"
    )
    out = asof_join(left, right, "k", "k", "t", "t", ["val"]).collect()
    assert out[0].val == 5.0


def test_range_join_points_between_semantics(spark):
    from etl_spark_gradle_spark.operators.relational import range_join_points

    pts = spark.createDataFrame([(1, 0.0), (2, 10.0), (3, 25.0), (4, 99.0)], ["pid", "x"])
    ivs = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 10.0, 30.0)], ["iv", "lo", "hi"]
    )
    out = range_join_points(pts, ivs, "x", "lo", "hi", bin_size=10.0)
    pairs = {(r.pid, r.iv) for r in out.collect()}
    # BETWEEN is inclusive on both ends; 10.0 is in both intervals
    assert pairs == {(1, 100), (2, 100), (2, 200), (3, 200)}


def test_rollup_cube_modes(spark, kv):
    from etl_spark_gradle_spark.operators.relational import aggregate

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)], ["g1", "g2", "n"]
    )
    aggs = [AggregateExpr("n", "sum", "s")]
    roll = aggregate(df, ["g1", "g2"], aggs, grouping_mode="rollup")
    assert roll.count() == 3 + 2 + 1  # leaves + per-g1 + grand total
    cube = aggregate(df, ["g1", "g2"], aggs, grouping_mode="cube")
    assert cube.count() == 3 + 2 + 2 + 1  # + per-g2 marginals
    total = {r.s for r in roll.filter("g1 IS NULL AND g2 IS NULL").collect()}
    assert total == {7}
    with pytest.raises(TransformationError):
        aggregate(df, ["g1"], aggs, grouping_mode="bogus")


def test_grouping_sets_mode(spark):
    from etl_spark_gradle_spark.operators.relational import aggregate

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)], ["g1", "g2", "n"]
    )
    aggs = [AggregateExpr("n", "sum", "s")]
    out = aggregate(
        df,
        ["g1", "g2"],
        aggs,
        grouping_mode="grouping_sets",
        grouping_sets=[["g1"], ["g2"], []],
    )
    rows = {(r.g1, r.g2, r.s) for r in out.collect()}
    assert rows == {
        ("a", None, 3),
        ("b", None, 4),
        (None, "x", 5),
        (None, "y", 2),
        (None, None, 7),
    }
    # grouping-set columns must be declared in group_by
    with pytest.raises(TransformationError, match="must appear in groupBy"):
        aggregate(df, ["g1"], aggs, grouping_mode="grouping_sets",
                  grouping_sets=[["g2"]])
    with pytest.raises(TransformationError, match="non-empty groupingSets"):
        aggregate(df, ["g1"], aggs, grouping_mode="grouping_sets")


def test_grouping_sets_yaml_adapter(spark):
    ctx = RunContext.create("t", spark)
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)], ["g1", "g2", "n"]
    )
    t = TRANSFORMER_REGISTRY["aggregation"]
    cfg = TransformationConfig(
        type="aggregation",
        options={
            "groupBy": "g1,g2",
            "groupingMode": "grouping_sets",
            "groupingSets": "g1; g2; ",
        },
        aggregations=[AggregateExpr("n", "sum", "s")],
    )
    out = t.transform(df, cfg, ctx)
    # "g1; g2; " = per-g1, per-g2, grand total
    assert out.count() == 2 + 2 + 1


def test_asof_range_registry_adapters(spark):
    ctx = RunContext.create("t", spark)
    asof = TRANSFORMER_REGISTRY["asof_join"]
    bad = asof.validate(
        spark.range(1), TransformationConfig(type="asof_join", options={})
    )
    assert not bad.is_valid
    rj = TRANSFORMER_REGISTRY["range_join"]
    bad2 = rj.validate(
        spark.range(1),
        TransformationConfig(
            type="range_join",
            options={"rightTable": "t", "pointColumn": "id", "lowerColumn": "lo",
                     "upperColumn": "hi", "binSize": "-3"},
        ),
    )
    assert not bad2.is_valid


# ---------------------------------------------------------------------------
# Analytics (lag/lead/running aggregates) and pivot
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ledger(spark):
    return spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 5), ("b", 1, 7), ("b", 2, 3)],
        ["acct", "seq", "amount"],
    )


def test_analytic_columns_lag_running(spark, ledger):
    from etl_spark_gradle_spark.operators.relational import analytic_columns

    out = analytic_columns(
        ledger,
        partition_by=["acct"],
        order_by=["seq"],
        specs=[
            ("prev_amount", "lag", ["amount", "1"]),
            ("next_amount", "lead", ["amount"]),
            ("run_total", "running_sum", ["amount"]),
            ("run_max", "running_max", ["amount"]),
            ("pct", "cume_dist", []),
        ],
    )
    rows = {(r.acct, r.seq): r for r in out.collect()}
    assert rows[("a", 1)].prev_amount is None
    assert rows[("a", 2)].prev_amount == 10
    assert rows[("a", 2)].next_amount == 5
    assert rows[("a", 3)].run_total == 35
    assert rows[("a", 3)].run_max == 20
    assert rows[("b", 2)].run_total == 10
    assert rows[("b", 2)].pct == 1.0


def test_analytics_transformer_registry(spark, ledger):
    tf = TRANSFORMER_REGISTRY["analytics"]
    cfg = TransformationConfig(
        type="analytics",
        options={
            "partitionBy": "acct",
            "orderBy": "seq",
            "expressions": "prev:lag(amount,1),rt:running_sum(amount)",
        },
    )
    ctx = RunContext.create("t", spark)
    out = tf.transform(ledger, cfg, ctx)
    got = {(r.acct, r.seq): (r.prev, r.rt) for r in out.collect()}
    assert got[("a", 3)] == (20, 35)
    bad = TransformationConfig(type="analytics", options={"expressions": "x:lag(a)"})
    with pytest.raises(TransformationError):
        tf.transform(ledger, bad, ctx)
    bad2 = TransformationConfig(
        type="analytics", options={"orderBy": "seq", "expressions": "x:no_such(a)"}
    )
    with pytest.raises(TransformationError):
        tf.transform(ledger, bad2, ctx)


def test_pivot_table_single_and_multi_agg(spark, ledger):
    from etl_spark_gradle_spark.operators.relational import pivot_table

    single = pivot_table(
        ledger,
        group_by=["acct"],
        pivot_column="seq",
        pivot_values=["1", "2"],
        aggregations=[AggregateExpr(column="amount", function="sum", alias="s")],
    )
    got = {r.acct: (r["1"], r["2"]) for r in single.collect()}
    assert got == {"a": (10, 20), "b": (7, 3)}

    multi = pivot_table(
        ledger,
        group_by=["acct"],
        pivot_column="seq",
        pivot_values=["1"],
        aggregations=[
            AggregateExpr(column="amount", function="sum", alias="s"),
            AggregateExpr(column="amount", function="count", alias="n"),
        ],
    )
    assert set(multi.columns) == {"acct", "1_s", "1_n"}


def test_pivot_transformer_requires_explicit_values(spark, ledger):
    tf = TRANSFORMER_REGISTRY["pivot"]
    ctx = RunContext.create("t", spark)
    cfg = TransformationConfig(
        type="pivot",
        options={"groupBy": "acct", "pivotColumn": "seq"},
        aggregations=[AggregateExpr(column="amount", function="sum", alias="s")],
    )
    with pytest.raises(TransformationError):
        tf.transform(ledger, cfg, ctx)


def test_explode_column_basic_outer_position(spark):
    from etl_spark_gradle_spark.operators.relational import explode_column

    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None)], ["id", "text"]
    )
    arr = "filter(split(text, ' '), x -> x != '')"
    out = explode_column(df, arr, alias="tok")
    assert {(r.id, r.tok) for r in out.collect()} == {(1, "a"), (1, "b")}
    outer = explode_column(df, arr, alias="tok", outer=True)
    got = {(r.id, r.tok) for r in outer.collect()}
    assert got == {(1, "a"), (1, "b"), (2, None), (3, None)}
    pos = explode_column(df, arr, alias="tok", with_position=True)
    assert {(r.id, r.tok_pos, r.tok) for r in pos.collect()} == {(1, 0, "a"), (1, 1, "b")}


def test_explode_transformer_registry(spark):
    tf = TRANSFORMER_REGISTRY["explode"]
    df = spark.createDataFrame([(1, [10, 20])], ["id", "xs"])
    cfg = TransformationConfig(type="explode", options={"expression": "xs", "alias": "x"})
    ctx = RunContext.create("t", spark)
    assert {(r.id, r.x) for r in tf.transform(df, cfg, ctx).collect()} == {(1, 10), (1, 20)}
    with pytest.raises(TransformationError):
        tf.transform(df, TransformationConfig(type="explode", options={}), ctx)


def test_asof_join_salted_matches_unsalted(spark):
    from datetime import datetime

    from etl_spark_gradle_spark.operators.relational import asof_join

    def ts(m):
        return datetime(2024, 1, 1, 0, m)

    # one hot key ("h") with many left rows, plus a normal key
    left = spark.createDataFrame(
        [("h", ts(m), m) for m in range(0, 30)] + [("n", ts(5), 99)],
        ["k", "t", "seq"],
    )
    right = spark.createDataFrame(
        [("h", ts(0), 100.0), ("h", ts(10), 200.0), ("h", ts(20), 300.0),
         ("n", ts(4), 50.0)],
        ["rk", "rt", "px"],
    )
    kwargs = dict(
        left_key="k", right_key="rk", left_time="t", right_time="rt",
        right_values=["px"],
    )
    plain = {(r.k, r.seq): r.px for r in asof_join(left, right, **kwargs).collect()}
    salted = {
        (r.k, r.seq): r.px
        for r in asof_join(left, right, **kwargs, salt_buckets=4).collect()
    }
    assert salted == plain
    assert plain[("h", 15)] == 200.0 and plain[("n", 99)] == 50.0


def test_stratified_sample(spark):
    from etl_spark_gradle_spark.operators.relational import stratified_sample

    df = spark.createDataFrame(
        [(i, "books" if i % 3 == 0 else ("crawl" if i % 3 == 1 else "web"))
         for i in range(300)],
        ["id", "src"],
    )
    out = stratified_sample(df, "src", {"books": 1.0, "crawl": 0.0})
    got = {r.src for r in out.collect()}
    assert got == {"books"}  # crawl sampled at 0, web unlisted -> dropped
    assert out.filter("src = 'books'").count() == 100

    withdefault = stratified_sample(
        df, "src", {"books": 1.0, "crawl": 0.0}, default_fraction=1.0
    )
    by_src = {
        r.src: r.n
        for r in withdefault.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("books") == 100 and by_src.get("web") == 100
    assert "crawl" not in by_src

    with pytest.raises(TransformationError):
        stratified_sample(df, "src", {"books": 1.5})


def test_sample_transformer_stratified_registry(spark):
    tf = TRANSFORMER_REGISTRY["sample"]
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "src"])
    ctx = RunContext.create("t", spark)
    cfg = TransformationConfig(
        type="sample",
        options={"strataColumn": "src", "fractions": "a:1.0,b:0.0"},
    )
    assert {r.src for r in tf.transform(df, cfg, ctx).collect()} == {"a"}
    bad = TransformationConfig(
        type="sample", options={"strataColumn": "nope", "fractions": "a:1.0"}
    )
    with pytest.raises(TransformationError):
        tf.transform(df, bad, ctx)


def test_asof_join_nearest_direction(spark):
    """nearest: closer of backward/forward; tie keeps backward (pandas
    merge_asof conventions); one-sided rows fall back to the side that
    exists."""
    from etl_spark_gradle_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),  # back 9:00 (1h) vs fwd 11:30 (1.5h) -> back
            (1, "2024-01-01 11:00:00"),  # back 9:00 (2h) vs fwd 11:30 (30m) -> fwd
            (1, "2024-01-01 08:00:00"),  # nothing before -> fwd 9:00
            (1, "2024-01-01 13:00:00"),  # nothing after -> back 11:30
            (2, "2024-01-01 10:00:00"),  # no right rows at all -> NULL
        ],
        ["k", "t"],
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 9.0), (1, "2024-01-01 11:30:00", 11.5)],
        ["k", "t", "val"],
    ).select("k", F.col("t").cast("timestamp").alias("t"), "val")

    out = asof_join(left, right, "k", "k", "t", "t", ["val"], direction="nearest")
    got = {(r.k, str(r.t)): r.val for r in out.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 9.0
    assert got[(1, "2024-01-01 11:00:00")] == 11.5
    assert got[(1, "2024-01-01 08:00:00")] == 9.0
    assert got[(1, "2024-01-01 13:00:00")] == 11.5
    assert got[(2, "2024-01-01 10:00:00")] is None

    # tie at equal distance -> backward match
    tie_left = spark.createDataFrame([(1, "2024-01-01 10:15:00")], ["k", "t"]).select(
        "k", F.col("t").cast("timestamp").alias("t")
    )
    tie_right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1.0), (1, "2024-01-01 10:30:00", 2.0)],
        ["k", "t", "val"],
    ).select("k", F.col("t").cast("timestamp").alias("t"), "val")
    tie = asof_join(tie_left, tie_right, "k", "k", "t", "t", ["val"], direction="nearest")
    assert tie.collect()[0].val == 1.0

    # nearest + tolerance: the chosen match is nulled when too far
    tol = asof_join(
        left, right, "k", "k", "t", "t", ["val"],
        direction="nearest", tolerance_seconds=1800,
    )
    gott = {(r.k, str(r.t)): r.val for r in tol.collect()}
    assert gott[(1, "2024-01-01 10:00:00")] is None  # 1h > 30m
    assert gott[(1, "2024-01-01 11:00:00")] == 11.5  # 30m <= 30m


def test_asof_join_salted_nearest_matches_unsalted(spark):
    from datetime import datetime

    from etl_spark_gradle_spark.operators.relational import asof_join

    def ts(m):
        return datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        [("h", ts(m), m) for m in range(0, 30)] + [("n", ts(5), 99)],
        ["k", "t", "seq"],
    )
    right = spark.createDataFrame(
        [("h", ts(0), 100.0), ("h", ts(10), 200.0), ("h", ts(20), 300.0),
         ("n", ts(4), 50.0)],
        ["rk", "rt", "px"],
    )
    kwargs = dict(
        left_key="k", right_key="rk", left_time="t", right_time="rt",
        right_values=["px"], direction="nearest",
    )
    plain = {(r.k, r.seq): r.px for r in asof_join(left, right, **kwargs).collect()}
    salted = {
        (r.k, r.seq): r.px
        for r in asof_join(left, right, **kwargs, salt_buckets=4).collect()
    }
    assert salted == plain
    assert plain[("h", 6)] == 200.0   # 6 min back vs 4 min fwd -> fwd
    assert plain[("h", 4)] == 100.0   # 4 min back vs 6 min fwd -> back
    assert plain[("h", 5)] == 100.0   # tie -> backward


def test_rolling_time_aggregate(spark):
    """Trailing RANGE window: only rows within window_seconds count."""
    from datetime import datetime

    from etl_spark_gradle_spark.operators.relational import rolling_time_aggregate
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    def ts(m, s=0):
        return datetime(2024, 1, 1, 0, m, s)

    df = spark.createDataFrame(
        [
            ("u1", ts(0), 1),
            ("u1", ts(5), 10),
            ("u1", ts(12), 100),   # 0:00 outside its 10-minute window
            ("u2", ts(5), 1000),   # other key: isolated
        ],
        ["k", "t", "v"],
    )
    out = rolling_time_aggregate(
        df,
        partition_by=["k"],
        time_column="t",
        window_seconds=600,
        aggregations=[
            AggregateExpr("v", "sum", "s"),
            AggregateExpr("*", "count", "c"),
        ],
    )
    got = {(r.k, r.t.minute): (r.s, r.c) for r in out.collect()}
    assert got[("u1", 0)] == (1, 1)
    assert got[("u1", 5)] == (11, 2)      # includes 0:00 (exactly inclusive later)
    assert got[("u1", 12)] == (110, 2)    # 0:05 + 0:12; 0:00 aged out
    assert got[("u2", 5)] == (1000, 1)

    # boundary is inclusive: an event exactly window_seconds earlier counts
    edge = spark.createDataFrame(
        [("u", ts(0), 1), ("u", ts(10), 2)], ["k", "t", "v"]
    )
    got2 = {
        r.t.minute: r.s
        for r in rolling_time_aggregate(
            edge, ["k"], "t", 600, [AggregateExpr("v", "sum", "s")]
        ).collect()
    }
    assert got2[10] == 3


def test_rolling_time_transformer(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 1), ("u", "2024-01-01 00:05:00", 10)],
        ["k", "t", "v"],
    ).selectExpr("k", "CAST(t AS TIMESTAMP) AS t", "v")
    cfg = TransformationConfig(
        type="rolling_time",
        options={"partitionBy": "k", "timeColumn": "t", "windowSeconds": "600"},
        aggregations=(AggregateExpr("v", "sum", "s"),),
    )
    out = TRANSFORMER_REGISTRY["rolling_time"].transform(
        df, cfg, RunContext.create("t", spark)
    )
    assert {r.t.minute: r.s for r in out.collect()} == {0: 1, 5: 11}

    import pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError

    bad = TransformationConfig(type="rolling_time", options={"timeColumn": "t"})
    with pytest.raises(TransformationError, match="windowSeconds"):
        TRANSFORMER_REGISTRY["rolling_time"].transform(
            df, bad, RunContext.create("t", spark)
        )


def test_hash_split_deterministic_and_proportional(spark):
    from etl_spark_gradle_spark.operators.relational import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    a = hash_split(df, "k", splits)
    b = hash_split(df, "k", splits)
    # deterministic: identical assignment across invocations
    assert a.exceptAll(b).count() == 0
    counts = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # new rows never move old rows: subset gets identical labels
    sub = hash_split(df.filter("k < 100"), "k", splits)
    joined = a.withColumnRenamed("split", "full_split").join(sub, "k")
    assert joined.filter("full_split <> split").count() == 0
    # salt reshuffles at least some assignments
    salted = hash_split(df, "k", splits, salt="v2")
    assert a.withColumnRenamed("split", "s0").join(salted, "k").filter(
        "s0 <> split"
    ).count() > 0


def test_hash_split_keep_filters_one_split(spark):
    from etl_spark_gradle_spark.operators.relational import hash_split

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    splits = [("train", 0.9), ("holdout", 0.1)]
    full = hash_split(df, "k", splits)
    kept = hash_split(df, "k", splits, keep="train")
    assert kept.count() == full.filter("split = 'train'").count()
    assert kept.filter("split <> 'train'").count() == 0
    with pytest.raises(TransformationError):
        hash_split(df, "k", splits, keep="nope")
    with pytest.raises(TransformationError):
        hash_split(df, "k", [])
    with pytest.raises(TransformationError):
        hash_split(df, "k", [("a", -1.0), ("b", 0.5)])


def test_split_transformer_registry(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "k")
    tf = TRANSFORMER_REGISTRY["split"]
    cfg = TransformationConfig(
        type="split",
        options={"keyColumn": "k", "splits": "train:0.8,test:0.2", "keep": "test"},
    )
    assert tf.validate(df, cfg).is_valid
    out = tf.transform(df, cfg, RunContext.create("t", spark))
    assert out.filter("split <> 'test'").count() == 0
    assert 0 < out.count() < 300
    bad = TransformationConfig(type="split", options={"keyColumn": "missing", "splits": "a:1"})
    assert not tf.validate(df, bad).is_valid
    bad2 = TransformationConfig(type="split", options={"keyColumn": "k", "splits": "a:0,b:0"})
    assert not tf.validate(df, bad2).is_valid


def test_sql_transform_with_input_and_views(spark):
    """type: sql escape hatch — the statement sees the pipeline frame
    as `input` plus any registered views, and the result stays one
    Catalyst plan with the rest of the pipeline."""
    from etl_spark_gradle_spark.operators.relational import sql_transform

    df = spark.createDataFrame([(1, "a", 5.0), (2, "b", 7.0), (3, "a", 9.0)], ["k", "g", "v"])
    dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")], ["g", "label"])
    dim.createOrReplaceTempView("dim_view")
    out = sql_transform(
        df,
        spark,
        """
        WITH agg AS (SELECT g, SUM(v) AS total FROM input GROUP BY g)
        SELECT agg.g, label, total FROM agg JOIN dim_view USING (g) ORDER BY g
        """,
    ).collect()
    assert [(r.g, r.label, r.total) for r in out] == [("a", "alpha", 14.0), ("b", "beta", 7.0)]


def test_sql_transformer_registry_and_errors(spark):
    from etl_spark_gradle_spark.operators.relational import TransformationError

    df = spark.createDataFrame([(1,)], ["x"])
    tf = TRANSFORMER_REGISTRY["sql"]
    cfg = TransformationConfig(
        type="sql", options={"statement": "SELECT x * 2 AS y FROM input"}
    )
    assert tf.validate(df, cfg).is_valid
    out = tf.transform(df, cfg, RunContext.create("t", spark))
    assert [r.y for r in out.collect()] == [2]
    # custom input view name
    cfg2 = TransformationConfig(
        type="sql",
        options={"statement": "SELECT x FROM my_in", "inputView": "my_in"},
    )
    assert tf.transform(df, cfg2, RunContext.create("t", spark)).count() == 1
    assert not tf.validate(df, TransformationConfig(type="sql", options={})).is_valid
    with pytest.raises(TransformationError, match="sql transform failed"):
        tf.transform(
            df,
            TransformationConfig(type="sql", options={"statement": "SELECT nope FROM input"}),
            RunContext.create("t", spark),
        )


def test_quantile_filter_band(spark):
    from etl_spark_gradle_spark.operators.relational import quantile_filter

    df = spark.createDataFrame([(i, float(i)) for i in range(101)], ["id", "v"])
    out = sorted(r.id for r in quantile_filter(df, "v", 0.1, 0.9).collect())
    assert out == list(range(10, 91))  # exact interpolated cutoffs on 0..100
    # degenerate band keeps only the median
    med = quantile_filter(df, "v", 0.5, 0.5).collect()
    assert [r.v for r in med] == [50.0]
    # full band keeps everything non-null
    assert quantile_filter(df, "v").count() == 101


def test_quantile_filter_nulls_and_errors(spark):
    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
        quantile_filter,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id int, v double"
    )
    assert sorted(r.id for r in quantile_filter(df, "v", 0, 1).collect()) == [1, 3]
    assert sorted(
        r.id for r in quantile_filter(df, "v", 0, 1, keep_nulls=True).collect()
    ) == [1, 2, 3]
    allnull = spark.createDataFrame([(1, None)], "id int, v double")
    assert quantile_filter(allnull, "v", 0, 1).count() == 0
    assert quantile_filter(allnull, "v", 0, 1, keep_nulls=True).count() == 1
    with pytest.raises(TransformationError, match="lower_q"):
        quantile_filter(df, "v", 0.9, 0.1)
    with pytest.raises(TransformationError, match="not in schema"):
        quantile_filter(df, "nope")


def test_quantile_filter_transformer(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], ["id", "v"])
    tf = TRANSFORMER_REGISTRY["quantile_filter"]
    cfg = TransformationConfig(
        type="quantile_filter",
        options={"column": "v", "lowerQuantile": "0.2", "upperQuantile": "0.8"},
    )
    assert tf.validate(df, cfg).is_valid
    assert tf.transform(df, cfg, RunContext.create("t", spark)).count() == 60
    bad = TransformationConfig(
        type="quantile_filter", options={"column": "v", "lowerQuantile": "2"}
    )
    assert not tf.validate(df, bad).is_valid


def test_flatten_structs_nested_and_collisions(spark):
    from etl_spark_gradle_spark.operators.relational import flatten_structs

    df = spark.sql("""
        SELECT 1 AS id,
               named_struct('a', 10, 'b', named_struct('c', 'x', 'd', 20)) AS s,
               named_struct('a', 99) AS s2,
               77 AS s_a,
               array(1, 2) AS arr
    """)
    out = flatten_structs(df)
    assert out.columns == ["id", "s_a", "s_b_c", "s_b_d", "s2_a", "s_a_2", "arr"]
    r = out.collect()[0]
    # collision: first-come-first-served — the struct-derived s.a
    # (earlier in the schema) keeps the plain name, the later top-level
    # s_a gets the numeric suffix; no data is shadowed either way
    assert r.s_a == 10 and r.s_a_2 == 77 and r.s_b_c == "x" and r.s_b_d == 20
    assert r.s2_a == 99 and r.arr == [1, 2]  # arrays untouched, rows unmultiplied
    assert out.count() == 1


def test_flatten_structs_max_depth_and_separator(spark):
    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
        flatten_structs,
    )

    df = spark.sql("SELECT named_struct('a', named_struct('b', 1)) AS s")
    deep = flatten_structs(df, separator=".")
    assert deep.columns == ["s.a.b"]
    shallow = flatten_structs(df, max_depth=1)
    assert shallow.columns == ["s_a"]  # depth-1: one level lifted, inner struct kept
    assert shallow.schema["s_a"].dataType.typeName() == "struct"
    with pytest.raises(TransformationError, match="max_depth"):
        flatten_structs(df, max_depth=0)


def test_flatten_transformer_registry(spark):
    df = spark.sql("SELECT 1 AS id, named_struct('x', 'v') AS meta")
    tf = TRANSFORMER_REGISTRY["flatten"]
    out = tf.transform(
        df, TransformationConfig(type="flatten", options={}), RunContext.create("t", spark)
    )
    assert out.columns == ["id", "meta_x"]
    bad = TransformationConfig(type="flatten", options={"maxDepth": "abc"})
    assert not tf.validate(df, bad).is_valid


def test_unpivot_and_null_safe_join(spark):
    from etl_spark_gradle_spark.operators.relational import (
        join_view,
        unpivot_columns,
    )

    df = spark.createDataFrame([(1, 10.0, 20.0), (2, 30.0, 40.0)], ["id", "a", "b"])
    long = unpivot_columns(df, ["id"], ["a", "b"], var_col="m", val_col="v")
    rows = {(r.id, r.m, r.v) for r in long.collect()}
    assert rows == {(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0), (2, "b", 40.0)}
    with pytest.raises(TransformationError, match="value columns"):
        unpivot_columns(df, ["id"], [])
    with pytest.raises(TransformationError, match="not in input schema"):
        unpivot_columns(df, ["id"], ["nope"])

    # registry adapter
    t = TRANSFORMER_REGISTRY["unpivot"]
    ctx = RunContext.create("t", spark)
    cfg = TransformationConfig(
        type="unpivot",
        options={"idColumns": "id", "valueColumns": "a,b"},
    )
    assert t.transform(df, cfg, ctx).count() == 4

    # null-safe join: NULL keys match each other under <=>
    left = spark.createDataFrame([(None, "l1"), (1, "l2")], ["k", "lv"])
    spark.createDataFrame([(None, "r1"), (1, "r2")], ["k", "rv"]).createOrReplaceTempView(
        "ns_right"
    )
    plain = join_view(left, spark, "ns_right", "k", "k", "inner")
    assert plain.count() == 1  # NULL never equals NULL
    safe = join_view(left, spark, "ns_right", "k", "k", "inner", null_safe=True)
    got = {(r.lv, r.rv) for r in safe.collect()}
    assert got == {("l1", "r1"), ("l2", "r2")}


# ---------------------------------------------------------------------------
# interval_overlap_join (set-vs-set interval intersection)
# ---------------------------------------------------------------------------


def test_interval_overlap_join_matches_naive(spark):
    """Binned interval-overlap join must equal the naive non-equi join
    exactly — including pairs spanning many bins (dedup is built into
    the canonical-bin condition, no distinct)."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.relational import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(i, "k%d" % (i % 3), float(i * 7 % 50), float(i * 7 % 50 + i % 13))
         for i in range(200)],
        "lid int, k string, lo double, hi double",
    )
    right = spark.createDataFrame(
        [(i, "k%d" % (i % 3), float(i * 11 % 60), float(i * 11 % 60 + i % 9))
         for i in range(150)],
        "rid int, k string, lo double, hi double",
    )
    got = interval_overlap_join(
        left, right, "lo", "hi", "lo", "hi", bin_size=5.0, keys=["k"]
    )
    got_pairs = sorted((r.lid, r.rid) for r in got.collect())
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & (F.col("l.lo") <= F.col("r.hi"))
        & (F.col("r.lo") <= F.col("l.hi")),
        "inner",
    )
    want = sorted((r["lid"], r["rid"]) for r in naive.collect())
    assert got_pairs == want and len(got_pairs) == len(set(got_pairs))

    # colliding interval columns come back suffixed, never dropped
    assert {"lo", "hi", "lo_right", "hi_right"} <= set(got.columns)

    # min_overlap prunes to the naive filtered set
    got2 = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "lo", "hi", "lo", "hi",
            bin_size=5.0, keys=["k"], min_overlap=4.0,
        ).collect()
    )
    want2 = sorted(
        (r["lid"], r["rid"])
        for r in naive.where(
            F.least(F.col("l.hi"), F.col("r.hi"))
            - F.greatest(F.col("l.lo"), F.col("r.lo"))
            >= 4.0
        ).collect()
    )
    assert got2 == want2 and len(got2) < len(got_pairs)


def test_interval_overlap_join_dates_and_validation(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
        interval_overlap_join,
    )

    shifts = spark.createDataFrame(
        [("s1", "2024-01-01", "2024-01-10"), ("s2", "2024-02-01", "2024-02-05")],
        "sid string, lo string, hi string",
    ).select("sid", F.to_date("lo").alias("lo"), F.to_date("hi").alias("hi"))
    incidents = spark.createDataFrame(
        [("i1", "2024-01-08", "2024-01-12"), ("i2", "2024-03-01", "2024-03-02")],
        "iid string, lo string, hi string",
    ).select("iid", F.to_date("lo").alias("lo"), F.to_date("hi").alias("hi"))
    out = interval_overlap_join(
        shifts, incidents, "lo", "hi", "lo", "hi", bin_size=7
    ).collect()
    assert [(r.sid, r.iid) for r in out] == [("s1", "i1")]

    with _pytest.raises(TransformationError, match="bin_size"):
        interval_overlap_join(shifts, incidents, "lo", "hi", "lo", "hi", 0)
    with _pytest.raises(TransformationError, match="not in right"):
        interval_overlap_join(shifts, incidents, "lo", "hi", "nope", "hi", 7)


def test_interval_join_yaml_adapter(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    left = spark.createDataFrame(
        [(1, 0.0, 5.0), (2, 10.0, 12.0)], "lid int, lo double, hi double"
    )
    right = spark.createDataFrame(
        [(7, 4.0, 6.0), (8, 20.0, 21.0)], "rid int, lo double, hi double"
    )
    right.createOrReplaceTempView("iv_right")

    class _Ctx:
        def __init__(self, s):
            self.spark = s

    tr = TRANSFORMER_REGISTRY["interval_join"]
    cfg = TransformationConfig(
        type="interval_join",
        options={"rightTable": "iv_right", "leftLower": "lo", "leftUpper": "hi",
                 "rightLower": "lo", "rightUpper": "hi", "binSize": "5"},
    )
    assert tr.validate(left, cfg).is_valid
    out = tr._apply(left, cfg, _Ctx(spark)).collect()
    assert [(r.lid, r.rid) for r in out] == [(1, 7)]
    bad = TransformationConfig(type="interval_join", options={"binSize": "0"})
    assert not tr.validate(left, bad).is_valid


def test_interval_overlap_join_guards(spark):
    """Regression (code-review): mixed DATE/TIMESTAMP interval columns
    would bin on incomparable grids (silently empty join) — refused;
    a pre-existing __bin column is reserved."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
        interval_overlap_join,
    )

    dates = spark.createDataFrame(
        [("2024-01-01", "2024-01-10")], "lo string, hi string"
    ).select(F.to_date("lo").alias("lo"), F.to_date("hi").alias("hi"))
    ts = spark.createDataFrame(
        [("2024-01-05 00:00:00", "2024-01-06 00:00:00")], "lo string, hi string"
    ).select(F.col("lo").cast("timestamp").alias("lo"),
             F.col("hi").cast("timestamp").alias("hi"))
    with _pytest.raises(TransformationError, match="incompatible units"):
        interval_overlap_join(dates, ts, "lo", "hi", "lo", "hi", 86400)

    binned = spark.createDataFrame([(1, 0.0, 1.0)], "__bin int, lo double, hi double")
    other = spark.createDataFrame([(0.5, 1.5)], "lo double, hi double")
    with _pytest.raises(TransformationError, match="__bin.*reserved"):
        interval_overlap_join(binned, other, "lo", "hi", "lo", "hi", 1.0)


def test_interval_overlap_join_excludes_inverted_and_null_intervals(spark):
    """Dirty intervals must emit NO bins: F.sequence(a, b) with a > b
    yields a DESCENDING sequence (not empty), so un-guarded inverted
    intervals would still land on bins and pair unpredictably
    (round-8 ADVICE finding). Null-bounded intervals also drop."""
    from etl_spark_gradle_spark.operators.relational import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [
            (1, 10.0, 20.0),      # clean
            (2, 30.0, 5.0),       # inverted — must never pair
            (3, None, 15.0),      # null lower — must never pair
            (4, 12.0, None),      # null upper — must never pair
        ],
        "lid int, lo double, hi double",
    )
    right = spark.createDataFrame(
        [(1, 0.0, 100.0)], "rid int, lo double, hi double"
    )
    got = interval_overlap_join(
        left, right, "lo", "hi", "lo", "hi", bin_size=5.0
    )
    assert sorted(r.lid for r in got.collect()) == [1]
