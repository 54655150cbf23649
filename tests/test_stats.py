"""Exact-moment statistics (operators/stats.py)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_spark_gradle_spark.operators import stats as st
from etl_spark_gradle_spark.operators.relational import TransformationError


def test_correlation_matches_numpy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    got = {
        (r.col_a, r.col_b): r.corr
        for r in st.correlation_matrix(li, cols).collect()
    }
    pdf = li.select(*cols).toPandas()
    for (a, b), v in got.items():
        want = np.corrcoef(pdf[a], pdf[b])[0, 1]
        assert abs(v - want) < 1e-9, (a, b, v, want)
    with pytest.raises(TransformationError, match=">= 2"):
        st.correlation_matrix(li, ["l_quantity"])


def test_linear_fit_matches_numpy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = {r.l_returnflag: r for r in
            st.linear_fit(li, "l_quantity", "l_extendedprice",
                          group_by=["l_returnflag"]).collect()}
    pdf = li.select("l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        slope, intercept = np.polyfit(grp.l_quantity, grp.l_extendedprice, 1)
        r = rows[flag]
        assert abs(r.slope - slope) < 1e-6 * max(1, abs(slope))
        assert abs(r.intercept - intercept) < 1e-6 * max(1, abs(intercept))
        assert 0.0 <= r.r2 <= 1.0


def test_linear_fit_perfect_line_and_degenerate(spark):
    df = spark.createDataFrame(
        [("g", float(x), 2.0 * x + 5.0) for x in range(10)]
        + [("flat", 1.0, 7.0), ("flat", 1.0, 9.0)],
        ["g", "x", "y"],
    )
    rows = {r.g: r for r in st.linear_fit(df, "x", "y", group_by=["g"]).collect()}
    assert abs(rows["g"].slope - 2.0) < 1e-12
    assert abs(rows["g"].intercept - 5.0) < 1e-12
    assert abs(rows["g"].r2 - 1.0) < 1e-12
    # zero x-variance -> NULL fit, not a crash or inf
    assert rows["flat"].slope is None and rows["flat"].r2 is None


def test_zscore_flags_semantics(spark):
    vals = [10.0] * 20 + [100.0]  # one blatant outlier
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = st.zscore_flags(df, "v", group_by=["g"], threshold=3.0)
    flagged = out.where("is_outlier").collect()
    assert len(flagged) == 1 and flagged[0].v == 100.0
    # zero-variance group: NULL z, never flagged
    const = spark.createDataFrame([("c", 5.0), ("c", 5.0)], ["g", "v"])
    rows = st.zscore_flags(const, "v", group_by=["g"]).collect()
    assert all(r.zscore is None and r.is_outlier is False for r in rows)
    with pytest.raises(TransformationError, match="threshold"):
        st.zscore_flags(df, "v", threshold=0)


def test_moment_sums_are_mergeable(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    whole = st.moment_sums(li, ["l_quantity", "l_extendedprice"]).collect()[0]
    parts = st.moment_sums(
        li.withColumn("_half", (F.col("l_orderkey") % 2).cast("int")),
        ["l_quantity", "l_extendedprice"],
        group_by=["_half"],
    )
    merged = parts.groupBy().agg(
        F.sum("n").alias("n"),
        *[
            F.sum(c).alias(c)
            for c in parts.columns
            if c.startswith(("sum_", "sumsq_", "sumxy_"))
        ],
    ).collect()[0]
    # decimal sums add EXACTLY: merged partial moments == whole-table moments
    assert merged.asDict() == whole.asDict()


def test_stats_yaml_adapter(spark, sf_dir):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t = TRANSFORMER_REGISTRY["stats"]
    ctx = RunContext.create("t", spark)
    corr = t.transform(
        li,
        TransformationConfig(
            type="stats",
            options={"operation": "correlation",
                     "columns": "l_quantity,l_extendedprice"},
        ),
        ctx,
    )
    assert corr.count() == 1
    fit = t.transform(
        li,
        TransformationConfig(
            type="stats",
            options={"operation": "linear_fit", "xColumn": "l_quantity",
                     "yColumn": "l_extendedprice", "groupBy": "l_returnflag"},
        ),
        ctx,
    )
    assert fit.count() == 3
    z = t.transform(
        li,
        TransformationConfig(
            type="stats",
            options={"operation": "zscore", "valueColumn": "l_extendedprice",
                     "threshold": "1.5"},
        ),
        ctx,
    )
    assert "is_outlier" in z.columns
    assert not t.validate(
        li, TransformationConfig(type="stats", options={"operation": "bogus"})
    ).is_valid


# ------------------------------------------------------------ exact_quantiles


def test_exact_quantiles_matches_numpy_rank_semantics(spark, sf_dir):
    from etl_spark_gradle_spark.operators.stats import exact_quantiles

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    probs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = {r.prob: (r.rank, r.value) for r in
           exact_quantiles(li, "l_extendedprice", probs).collect()}
    vals = np.sort(li.select("l_extendedprice").toPandas().l_extendedprice.values)
    n = len(vals)
    for p in probs:
        rank = max(1, int(np.ceil(p * n)))
        assert got[p] == (rank, float(vals[rank - 1])), p


def test_exact_quantiles_duplicates_nulls_and_edges(spark):
    from etl_spark_gradle_spark.operators.stats import exact_quantiles

    # heavy duplication + nulls: CDF over 9 non-null values
    # sorted: [1,1,1,1,2,2,3,3,3]
    data = [(1.0,)] * 4 + [(2.0,)] * 2 + [(3.0,)] * 3 + [(None,)] * 5
    d = spark.createDataFrame(data, "x double")
    got = {r.prob: (r.rank, r.value) for r in
           exact_quantiles(d, "x", [0.0, 0.4, 0.5, 0.45, 1.0]).collect()}
    assert got[0.0] == (1, 1.0)
    assert got[0.4] == (4, 1.0)   # ceil(0.4*9) = 4 -> still inside the 1s
    assert got[0.45] == (5, 2.0)  # ceil(4.05) = 5 -> first 2
    assert got[0.5] == (5, 2.0)
    assert got[1.0] == (9, 3.0)


def test_exact_quantiles_empty_validation_and_determinism(spark):
    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.stats import exact_quantiles

    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x", [0.5]).count() == 0
    allnull = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_quantiles(allnull, "x", [0.5]).count() == 0
    d = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    a = sorted(map(tuple, exact_quantiles(d, "x", [0.3, 0.7], num_partitions=2).collect()))
    b = sorted(map(tuple, exact_quantiles(d, "x", [0.3, 0.7], num_partitions=31).collect()))
    assert a == b
    with pytest.raises(TransformationError, match="prob"):
        exact_quantiles(d, "x", [])
    with pytest.raises(TransformationError, match="out of"):
        exact_quantiles(d, "x", [-0.1])
    with pytest.raises(TransformationError, match="not in schema"):
        exact_quantiles(d, "nope", [0.5])


def test_stats_adapter_quantiles_mode(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    tr = TRANSFORMER_REGISTRY["stats"]
    d = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    cfg = TransformationConfig(
        type="stats",
        options={"operation": "quantiles", "valueColumn": "x", "probs": "0.5,0.9"},
    )
    assert tr.validate(d, cfg).is_valid
    got = {r.prob: r.value for r in tr.transform(d, cfg, None).collect()}
    assert got == {0.5: 4.0, 0.9: 8.0}
    for bad in (
        {"operation": "quantiles", "valueColumn": "x"},
        {"operation": "quantiles", "valueColumn": "x", "probs": "2.0"},
        {"operation": "quantiles", "valueColumn": "x", "probs": "abc"},
        {"operation": "quantiles", "probs": "0.5"},
        {"operation": "quantiles", "valueColumn": "x", "probs": "0.5",
         "groupBy": "zz"},
    ):
        assert not tr.validate(
            d, TransformationConfig(type="stats", options=bad)
        ).is_valid


def test_exact_quantiles_grouped_matches_pandas(spark, sf_dir):
    from etl_spark_gradle_spark.operators.stats import exact_quantiles

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    probs = [0.25, 0.5, 0.9]
    got = {
        (r.l_returnflag, r.prob): (r.rank, r.value)
        for r in exact_quantiles(
            li, "l_extendedprice", probs, group_by=["l_returnflag"]
        ).collect()
    }
    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    n_checked = 0
    for flag, grp in pdf.groupby("l_returnflag"):
        vals = np.sort(grp.l_extendedprice.values)
        n = len(vals)
        for p in probs:
            rank = max(1, int(np.ceil(p * n)))
            assert got[(flag, p)] == (rank, float(vals[rank - 1])), (flag, p)
            n_checked += 1
    assert n_checked == 3 * len(probs)
    # grouped + ungrouped agree on a single-group frame
    one = li.where("l_returnflag = 'R'")
    g = {r.prob: (r.rank, r.value) for r in
         exact_quantiles(one, "l_extendedprice", probs,
                         group_by=["l_returnflag"]).collect()}
    u = {r.prob: (r.rank, r.value) for r in
         exact_quantiles(one, "l_extendedprice", probs).collect()}
    assert {p: g[p] for p in probs} == u


def test_mad_outliers_hand_computed(spark):
    from etl_spark_gradle_spark.operators.stats import mad_outliers

    rows = [("a", float(v)) for v in (1, 2, 3, 4, 100)] + [
        ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.g: r for r in mad_outliers(df, "v", group_by=["g"]).collect()}
    # group a: median(1,2,3,4,100)=3 (type-1 rank 3); |x-3|=[2,1,0,1,97],
    # MAD = median = 1 -> threshold 3*1.4826 = 4.4478 -> only 100 flags
    a = got["a"]
    assert a.median == 3.0 and a.mad == 1.0 and a.n == 5
    assert a.threshold == 3.0 * 1.4826 * 1.0
    assert a.n_outliers == 1
    # group b: constant majority -> median 5, MAD 0, strict > flags the 9
    b = got["b"]
    assert b.median == 5.0 and b.mad == 0.0 and b.n_outliers == 1


def test_mad_outliers_ungrouped_and_validation(spark):
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [(float(v),) for v in (10, 11, 12, 13, 14, 500)], ["v"]
    )
    (r,) = mad_outliers(df, "v").collect()
    # n=6: median rank ceil(3)=3 -> 12; dev [2,1,0,1,2,488] sorted
    # [0,1,1,2,2,488], rank 3 -> 1; threshold 4.4478 -> 488 flags
    assert r.n == 6 and r.median == 12.0 and r.mad == 1.0
    assert r.n_outliers == 1
    with _pytest.raises(TransformationError, match="value column"):
        mad_outliers(df, "nope")
    with _pytest.raises(TransformationError, match="k > 0"):
        mad_outliers(df, "v", k=0)
    with _pytest.raises(TransformationError, match="group column"):
        mad_outliers(df, "v", group_by=["missing"])


def test_stats_adapter_mad_outliers_mode(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    tr = TRANSFORMER_REGISTRY["stats"]
    d = spark.createDataFrame(
        [(float(v),) for v in (10, 11, 12, 13, 14, 500)], ["x"]
    )
    cfg = TransformationConfig(
        type="stats", options={"operation": "mad_outliers", "valueColumn": "x"}
    )
    assert tr.validate(d, cfg).is_valid
    (r,) = tr.transform(d, cfg, None).collect()
    assert r.median == 12.0 and r.mad == 1.0 and r.n_outliers == 1
    for bad in (
        {"operation": "mad_outliers"},
        {"operation": "mad_outliers", "valueColumn": "x", "k": "0"},
        {"operation": "mad_outliers", "valueColumn": "x", "scale": "nope"},
        {"operation": "mad_outliers", "valueColumn": "zz"},
    ):
        assert not tr.validate(
            d, TransformationConfig(type="stats", options=bad)
        ).is_valid


def test_quantile_clip_winsorizes_and_passes_nulls(spark):
    from etl_spark_gradle_spark.operators.stats import quantile_clip

    vals = [float(v) for v in range(1, 11)]  # 1..10
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "x double")
    # type-1 ranks over n=10: q0.2 -> rank 2 -> 2.0; q0.8 -> rank 8 -> 8.0
    out = {r.x: r.x_clipped for r in quantile_clip(df, "x", 0.2, 0.8).collect()}
    assert out[1.0] == 2.0 and out[2.0] == 2.0
    assert out[9.0] == 8.0 and out[10.0] == 8.0
    assert out[5.0] == 5.0
    assert out[None] is None  # nulls pass through, never clipped to q_lo


def test_quantile_clip_grouped_and_validation(spark):
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.stats import quantile_clip

    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 100.0), ("b", 200.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    got = {(r.g, r.x): r.clip for r in
           quantile_clip(df, "x", 0.2, 0.8, group_by=["g"],
                         output_col="clip").collect()}
    assert got[("a", 1.0)] == 2.0 and got[("a", 10.0)] == 8.0
    # group b: n=2 -> q0.2 rank 1 -> 100, q0.8 rank 2 -> 200 (no clip)
    assert got[("b", 100.0)] == 100.0 and got[("b", 200.0)] == 200.0
    with _pytest.raises(TransformationError, match="lo <= hi"):
        quantile_clip(df, "x", 0.9, 0.1)
    with _pytest.raises(TransformationError, match="value column"):
        quantile_clip(df, "nope")
    with _pytest.raises(TransformationError, match="group column"):
        quantile_clip(df, "x", group_by=["zz"])


def test_stats_adapter_quantile_clip_mode(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    tr = TRANSFORMER_REGISTRY["stats"]
    d = spark.createDataFrame([(float(v),) for v in range(1, 11)], ["x"])
    cfg = TransformationConfig(
        type="stats",
        options={"operation": "quantile_clip", "valueColumn": "x",
                 "lo": "0.2", "hi": "0.8"},
    )
    assert tr.validate(d, cfg).is_valid
    out = {r.x: r.x_clipped for r in tr.transform(d, cfg, None).collect()}
    assert out[1.0] == 2.0 and out[10.0] == 8.0
    for bad in (
        {"operation": "quantile_clip"},
        {"operation": "quantile_clip", "valueColumn": "x", "lo": "0.9", "hi": "0.1"},
        {"operation": "quantile_clip", "valueColumn": "x", "lo": "abc"},
    ):
        assert not tr.validate(
            d, TransformationConfig(type="stats", options=bad)
        ).is_valid


def test_exact_aggregate_functions_order_independent(spark):
    """sum_exact/avg_exact must return identical doubles for ANY
    partitioning (float sum over doubles is partition-order dependent —
    the exact variants accumulate in decimal and round-trip through a
    string)."""
    from etl_spark_gradle_spark.operators.relational import aggregate
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    rows = [(i % 3, 0.1 + i * 0.0001) for i in range(3000)]
    aggs = [
        AggregateExpr("v", "sum_exact", "s"),
        AggregateExpr("v", "avg_exact", "a"),
    ]
    results = []
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, ["g", "v"]).repartition(parts)
        got = {r.g: (r.s, r.a) for r in aggregate(df, ["g"], aggs).collect()}
        results.append(got)
    assert results[0] == results[1] == results[2]
    # and the exact sum equals the true rational sum rendered as double
    import decimal as _dec
    want = {}
    for g in (0, 1, 2):
        tot = sum((_dec.Decimal(str(round(0.1 + i * 0.0001, 6)))
                   for i in range(3000) if i % 3 == g), _dec.Decimal(0))
        n = sum(1 for i in range(3000) if i % 3 == g)
        want[g] = (float(str(tot)), float(str(tot)) / n)
    assert results[0] == want


# ---------------------------------------------------------------- discretize


def test_discretize_equal_freq_matches_rank_reference(spark):
    """Quantile binning vs a python type-1 reference: bin = number of
    exact i/bins quantile edges strictly below the value."""
    import math

    from etl_spark_gradle_spark.operators.stats import discretize

    vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(5)
    got = {
        r["x"]: r["x_bin"]
        for r in discretize(df, "x", bins=4).select("x", "x_bin").collect()
    }
    s = sorted(vals)
    n = len(s)
    edges = [s[max(1, math.ceil(i / 4 * n)) - 1] for i in (1, 2, 3)]
    for v in vals:
        assert got[v] == sum(1 for t in edges if v > t), (v, edges)


def test_discretize_equal_freq_duplicate_edges_collapse(spark):
    """Heavy duplicates -> equal adjacent edges; in-between bins are
    never assigned, deterministically (pandas qcut would raise)."""
    from etl_spark_gradle_spark.operators.stats import discretize

    df = spark.createDataFrame(
        [(5.0,)] * 30 + [(1.0,), (9.0,)], "x double"
    )
    rows = discretize(df, "x", bins=4).select("x", "x_bin").distinct().collect()
    by_val = {r["x"]: r["x_bin"] for r in rows}
    assert by_val[1.0] == 0
    assert by_val[5.0] == 0  # edges [5,5,5]: none strictly below 5.0
    assert by_val[9.0] == 3  # all three edges below


def test_discretize_equal_width_and_constant_group(spark):
    from etl_spark_gradle_spark.operators.stats import discretize

    df = spark.createDataFrame(
        [("a", 0.0), ("a", 2.5), ("a", 5.0), ("a", 9.99), ("a", 10.0),
         ("b", 7.0), ("b", 7.0), ("c", None)],
        "g string, x double",
    )
    got = {
        (r["g"], r["x"]): r["b"]
        for r in discretize(
            df, "x", bins=4, mode="equal_width", group_by=["g"], output_col="b"
        ).collect()
    }
    # group a: lo=0, hi=10, width=2.5
    assert got[("a", 0.0)] == 0
    assert got[("a", 2.5)] == 1
    assert got[("a", 5.0)] == 2
    assert got[("a", 9.99)] == 3
    assert got[("a", 10.0)] == 3  # clamped to bins-1
    assert got[("b", 7.0)] == 0  # constant group
    assert got[("c", None)] is None  # null value, all-null group


def test_discretize_grouped_equal_freq_and_nulls(spark):
    from etl_spark_gradle_spark.operators.stats import discretize

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 9)]
        + [("b", 100.0), ("b", 200.0), ("a", None)],
        "g string, x double",
    )
    out = discretize(df, "x", bins=2, group_by=["g"]).collect()
    got = {(r["g"], r["x"]): r["x_bin"] for r in out}
    assert got[("a", 1.0)] == 0 and got[("a", 4.0)] == 0
    assert got[("a", 5.0)] == 1 and got[("a", 8.0)] == 1
    assert got[("b", 100.0)] == 0 and got[("b", 200.0)] == 1
    assert got[("a", None)] is None
    assert len(out) == 11  # row count preserved


def test_discretize_validation_and_adapter(spark):
    import pytest as _pytest

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.stats import (
        DiscretizeTransformer,
        discretize,
    )
    from etl_spark_gradle_spark.plans.config import (
        RunContext,
        TransformationConfig,
    )

    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    with _pytest.raises(TransformationError, match="bins"):
        discretize(df, "x", bins=1)
    with _pytest.raises(TransformationError, match="mode"):
        discretize(df, "x", mode="kmeans")
    with _pytest.raises(TransformationError, match="not in schema"):
        discretize(df, "y")

    tf = DiscretizeTransformer()
    assert type(TRANSFORMER_REGISTRY["discretize"]) is DiscretizeTransformer
    cfg = TransformationConfig(
        type="discretize",
        options={"column": "x", "bins": "2", "outputColumn": "bucket"},
    )
    out = tf.transform(df, cfg, RunContext.create("t", spark))
    assert {r["bucket"] for r in out.collect()} == {0, 1}
    bad = tf.validate(df, TransformationConfig(type="discretize", options={}))
    assert not bad.is_valid


def test_discretize_and_clip_keep_null_group_rows(spark):
    """A NULL group key (the unmatched side of an upstream left join)
    is a legitimate group: its rows must get real bins/clip values, not
    NULLs (the plain on=[cols] join dropped them silently)."""
    from etl_spark_gradle_spark.operators.stats import discretize, quantile_clip

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 9)]
        + [(None, float(10 * i)) for i in range(1, 9)],
        "g string, x double",
    )
    bins = {
        (r["g"], r["x"]): r["x_bin"]
        for r in discretize(df, "x", bins=2, group_by=["g"]).collect()
    }
    assert bins[(None, 10.0)] == 0 and bins[(None, 80.0)] == 1
    clipped = {
        (r["g"], r["x"]): r["c"]
        for r in quantile_clip(
            df, "x", lo=0.25, hi=0.75, group_by=["g"], output_col="c"
        ).collect()
    }
    assert clipped[(None, 10.0)] == 20.0  # clipped up to the NULL group's q25
    assert clipped[(None, 80.0)] == 60.0  # clipped down to its q75


def test_discretize_reserved_column_guard(spark):
    import pytest as _pytest
    from pyspark.sql import functions as _F

    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.stats import discretize

    df = spark.createDataFrame([(1.0,)], "x double").withColumn(
        "_edges", _F.lit(1)
    )
    with _pytest.raises(TransformationError, match="reserved"):
        discretize(df, "x")


def test_exact_quantiles_linear_matches_numpy(spark):
    """interpolation='linear' == numpy type-7 (the numpy/pandas
    default), incl. duplicate-heavy data and grouped mode."""
    import numpy as np

    from etl_spark_gradle_spark.operators.stats import exact_quantiles

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.5]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(4)
    probs = [0.0, 0.25, 0.5, 0.77, 1.0]
    got = {
        r["prob"]: r["value"]
        for r in exact_quantiles(df, "x", probs, interpolation="linear").collect()
    }
    for p in probs:
        assert abs(got[p] - float(np.quantile(vals, p))) < 1e-12, p

    gdf = spark.createDataFrame(
        [("a", v) for v in vals] + [("b", 10.0), ("b", 20.0)],
        "g string, x double",
    )
    grows = exact_quantiles(
        gdf, "x", [0.5], group_by=["g"], interpolation="linear"
    ).collect()
    gm = {r["g"]: r["value"] for r in grows}
    assert abs(gm["a"] - float(np.quantile(vals, 0.5))) < 1e-12
    assert gm["b"] == 15.0  # midpoint of the two bracketing values

    import pytest as _pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError

    with _pytest.raises(TransformationError, match="interpolation"):
        exact_quantiles(df, "x", [0.5], interpolation="nearest")


def test_exact_quantiles_weighted_matches_reference(spark):
    """Weighted type-1: smallest value whose cumulative weight reaches
    p·W — python reference over exact micro-unit weights; grouped and
    ungrouped, zero/negative/null weights excluded."""
    import math

    import pytest as _pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.stats import exact_quantiles

    rows = [
        ("a", 10.0, 1.0), ("a", 20.0, 5.0), ("a", 30.0, 1.0),
        ("a", 5.0, 0.0), ("a", 7.0, -2.0), ("a", 9.0, None),
        ("b", 1.0, 0.25), ("b", 2.0, 0.75),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double").repartition(3)

    def ref(pairs, p):
        pairs = sorted((v, w) for v, w in pairs if w and w > 0)
        total = sum(int(w * 1_000_000) for _, w in pairs)
        target = max(1, math.ceil(p * total))
        cum = 0
        for v, w in pairs:
            cum += int(w * 1_000_000)
            if cum >= target:
                return v
        return pairs[-1][0]

    got = {
        (r["g"], r["prob"]): r["value"]
        for r in exact_quantiles(
            df, "v", [0.1, 0.5, 0.9], group_by=["g"], weight_col="w"
        ).collect()
    }
    for g in ("a", "b"):
        pairs = [(v, w) for gg, v, w in rows if gg == g]
        for p in (0.1, 0.5, 0.9):
            assert got[(g, p)] == ref(pairs, p), (g, p)
    # the heavy middle weight dominates group a's median
    assert got[("a", 0.5)] == 20.0

    with _pytest.raises(TransformationError, match="lower"):
        exact_quantiles(df, "v", [0.5], weight_col="w", interpolation="linear")
    with _pytest.raises(TransformationError, match="weight column"):
        exact_quantiles(df, "v", [0.5], weight_col="nope")

    # adapter surface
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import (
        RunContext,
        TransformationConfig,
    )

    out = TRANSFORMER_REGISTRY["stats"].transform(
        df,
        TransformationConfig(
            type="stats",
            options={"operation": "quantiles", "valueColumn": "v",
                     "probs": "0.5", "groupBy": "g", "weightColumn": "w"},
        ),
        RunContext.create("t", spark),
    )
    assert {(r["g"], r["value"]) for r in out.collect()} == {("a", 20.0), ("b", 2.0)}


def test_ecdf_matches_cume_dist_and_handles_null_groups(spark):
    """Row-level ECDF equals cume_dist within groups (ties included);
    NULL groups are legitimate; NULL values stay NULL; min-rank column;
    and the GLOBAL path (prefix-sum CDF) agrees across partitionings."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as _F

    from etl_spark_gradle_spark.operators.stats import ecdf

    rows = (
        [("a", float(v)) for v in [1, 2, 2, 3, 10]]
        + [(None, 5.0), (None, 7.0), ("a", None)]
    )
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        (r["g"], r["x"]): (r["ecdf"], r["rnk"])
        for r in ecdf(df, "x", group_by=["g"], rank_col="rnk").collect()
    }
    want = {
        (r["g"], r["x"]): r["cd"]
        for r in df.where("x IS NOT NULL")
        .withColumn("cd", _F.cume_dist().over(W.partitionBy("g").orderBy("x")))
        .collect()
    }
    for k, cd in want.items():
        assert abs(got[k][0] - cd) < 1e-15, k
    assert got[("a", 2.0)] == (0.6, 2)  # ties share cum, min-rank
    assert got[(None, 5.0)] == (0.5, 1)
    assert got[("a", None)][0] is None

    big = spark.createDataFrame(
        [(float(i % 100),) for i in range(5000)], "x double"
    )
    outs = []
    for parts in (2, 17):
        o = ecdf(big.repartition(parts), "x", num_partitions=7).collect()
        outs.append(sorted((r["x"], r["ecdf"]) for r in o))
    assert outs[0] == outs[1]
    assert ("g", 5000) not in outs[0]
    # x = 0 appears 50 times of 5000 -> F(0) = 0.01
    assert outs[0][0] == (0.0, 0.01)


def test_tv_distance_hand_computed(spark):
    from etl_spark_gradle_spark.operators.stats import tv_distance

    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 4, "c string")
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 8, "c string")
    # p = {x:.6, y:.4}; q = {x:.2, z:.8} -> TV = .5*(|.6-.2|+.4+.8) = 0.8
    row = tv_distance(a, b, "c").collect()[0]
    assert row["n_a"] == 10 and row["n_b"] == 10 and row["n_categories"] == 3
    assert abs(row["tv"] - 0.8) < 1e-15
    per = {r["category"]: r for r in tv_distance(a, b, "c", per_category=True).collect()}
    assert abs(per["x"]["tv_contrib"] - 0.2) < 1e-15
    assert abs(per["y"]["tv_contrib"] - 0.2) < 1e-15
    assert abs(per["z"]["tv_contrib"] - 0.4) < 1e-15
    # Bhattacharyya terms: only the shared category contributes
    assert abs(per["x"]["bc_contrib"] - (0.6 * 0.2) ** 0.5) < 1e-15
    assert per["y"]["bc_contrib"] == 0.0 and per["z"]["bc_contrib"] == 0.0


def test_tv_distance_identity_disjoint_and_empty(spark):
    from etl_spark_gradle_spark.operators.stats import tv_distance

    a = spark.createDataFrame([("x",), ("y",)], "c string")
    assert tv_distance(a, a, "c").collect()[0]["tv"] == 0.0
    b = spark.createDataFrame([("z",)], "c string")
    assert tv_distance(a, b, "c").collect()[0]["tv"] == 1.0
    empty = a.where("1=0")
    assert tv_distance(a, empty, "c").count() == 0  # empty-side guard
    assert tv_distance(empty, a, "c").count() == 0


def test_tv_distance_contributions_sum_to_total(spark, sf_dir):
    from etl_spark_gradle_spark.operators.stats import tv_distance
    from tests.conftest import load_table

    docs = load_table(spark, "documents", sf_dir)
    a, b = docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    total = tv_distance(a, b, "lang").collect()[0]["tv"]
    contribs = [r["tv_contrib"] for r in tv_distance(a, b, "lang", per_category=True).collect()]
    assert abs(sum(contribs) - total) < 1e-12
    assert 0.0 <= total <= 1.0


def test_drift_adapter_tv_mode(spark):
    from etl_spark_gradle_spark.operators.stats import DriftTransformer
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    a = spark.createDataFrame([("x",), ("y",)], "c string")
    b = spark.createDataFrame([("x",), ("x",)], "c string")
    b.createOrReplaceTempView("tv_other")
    cfg = TransformationConfig(
        type="drift",
        options={"otherView": "tv_other", "categoryColumn": "c", "statistic": "tv"},
    )
    out = DriftTransformer().transform(a, cfg, RunContext.create("t-tv", spark))
    assert out.columns == ["n_a", "n_b", "n_categories", "tv"]
    assert abs(out.collect()[0]["tv"] - 0.5) < 1e-15
    bad = TransformationConfig(
        type="drift",
        options={"otherView": "tv_other", "categoryColumn": "c", "statistic": "ks"},
    )
    assert not DriftTransformer().validate(a, bad).is_valid


def test_prefix_sums_deterministic_across_reexecutions(spark):
    """The _prefix_sums two-level scan must yield IDENTICAL results on
    every physical execution — including forced full recomputes — so a
    stage retry or lost cache block at scale cannot silently mix bucket
    boundaries between the cumsum and offsets subtrees (the hazard the
    old repartitionByRange-sampled design carried).  Bucket ids are now
    a pure expression over driver-collected split points, so N repeated
    actions on the SAME DataFrame object must hash identically."""
    import hashlib

    from etl_spark_gradle_spark.operators.stats import _prefix_sums

    base = spark.createDataFrame(
        [(float(i), (i * 7919) % 1000 + 1) for i in range(4000)],
        "v double, c long",
    ).repartition(13)
    out = _prefix_sums(base, "v", ["c"], num_partitions=7)

    def h(df):
        rows = sorted((r["v"], r["cum_c"]) for r in df.collect())
        return hashlib.sha256(repr(rows).encode()).hexdigest()

    hashes = {h(out) for _ in range(5)}
    assert len(hashes) == 1

    # forced recompute: fresh logical plan each round, same data
    fresh = {
        h(_prefix_sums(base, "v", ["c"], num_partitions=7)) for _ in range(3)
    }
    assert fresh == hashes

    # exactness: prefix sums equal a driver-side cumsum reference
    rows = sorted((r["v"], r["cum_c"]) for r in out.collect())
    run = 0
    want = []
    for i in range(4000):
        run += (i * 7919) % 1000 + 1
        want.append((float(i), run))
    assert rows == want


def test_ecdf_and_weighted_quantiles_hash_stable(spark):
    """Driver-gate stability: ecdf and weighted exact_quantiles (both
    riding _prefix_sums) must produce the same value-hash across ≥5
    executions in one session, including after unpersisting everything
    (forced-recompute variant of the CORRECTNESS_r06 ecdf flake)."""
    import hashlib

    from etl_spark_gradle_spark.operators.stats import ecdf, exact_quantiles

    df = spark.createDataFrame(
        [(float((i * 31) % 500), 1.0 + (i % 9)) for i in range(6000)],
        "x double, w double",
    ).repartition(11)

    def hash_df(frame):
        rows = sorted(repr(r.asDict()) for r in frame.collect())
        return hashlib.sha256("\n".join(rows).encode()).hexdigest()

    e_hashes, q_hashes = set(), set()
    for i in range(5):
        e_hashes.add(hash_df(ecdf(df, "x", num_partitions=7)))
        q_hashes.add(
            hash_df(
                exact_quantiles(
                    df, "x", [0.1, 0.5, 0.9], weight_col="w", num_partitions=7
                )
            )
        )
        if i == 2:  # forced recompute: drop every cached/checkpointed block
            spark.catalog.clearCache()
    assert len(e_hashes) == 1, e_hashes
    assert len(q_hashes) == 1, q_hashes


def test_trimmed_mean_matches_pandas_and_winsorize(spark):
    """Trimmed mean drops tails outside the exact [lo, hi] quantile
    band; winsorized mean clips them instead. Both verified against a
    direct pandas computation with the same type-1 band edges; NULL
    values and NULL groups handled."""
    import math

    from etl_spark_gradle_spark.operators.stats import trimmed_mean

    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("a", 10_000.0),          # tail outlier
        ("b", 5.0), ("b", None),  # null value excluded from n
        (None, 7.0),              # NULL group is a legitimate group
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in trimmed_mean(df, "v", 0.1, 0.9, ["g"]).collect()}

    vals = sorted(range(1, 101)) + [10_000]
    n = len(vals)
    qlo = vals[max(1, math.ceil(0.1 * n)) - 1]
    qhi = vals[max(1, math.ceil(0.9 * n)) - 1]
    band = [v for v in vals if qlo <= v <= qhi]
    assert out["a"].n == n and out["a"].n_used == len(band)
    assert (out["a"].q_lo, out["a"].q_hi) == (qlo, qhi)
    assert abs(out["a"].mean - sum(band) / len(band)) < 1e-9
    # the 10k outlier is OUTSIDE the band: trimmed mean unaffected
    assert out["a"].mean < 100
    assert out["b"].n == 1 and out["b"].mean == 5.0
    assert out[None].mean == 7.0

    w = {r.g: r for r in
         trimmed_mean(df, "v", 0.1, 0.9, ["g"], winsorize=True).collect()}
    clipped = [min(max(v, qlo), qhi) for v in vals]
    assert w["a"].n_used == n
    assert abs(w["a"].mean - sum(clipped) / n) < 1e-9

    import pytest as _pytest
    with _pytest.raises(Exception, match="0 <= lo <= hi <= 1"):
        trimmed_mean(df, "v", 0.9, 0.1, ["g"])


def test_quantile_normalize_matches_reference_distribution(spark):
    """quantile_normalize maps each value to the reference's type-1
    quantile at the value's percent rank: afterwards the column's
    empirical distribution equals the reference's. NULLs keep NULL;
    an all-null reference raises."""
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.stats import quantile_normalize

    # x uniform 1..10, ref = {100, 200, 300, 400, 500} each twice
    x = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)] + [(99, None)],
        "id long, v double",
    )
    ref = spark.createDataFrame(
        [(float(100 * k),) for k in range(1, 6) for _ in range(2)],
        "r double",
    )
    out = {r.id: r.v_qnorm
           for r in quantile_normalize(x, "v", ref, "r").collect()}
    # p(i) = i/10; rank = ceil(i/10 * 10) = i; ref value at rank i
    want = {i: float(100 * ((i + 1) // 2)) for i in range(1, 11)}
    assert {k: v for k, v in out.items() if k != 99} == want
    assert out[99] is None

    empty_ref = spark.createDataFrame([(None,)], "r double")
    with _pytest.raises(Exception, match="no non-null values"):
        quantile_normalize(x, "v", empty_ref, "r")

    with _pytest.raises(Exception, match="output column"):
        quantile_normalize(x.withColumn("v_qnorm", x.v), "v", ref, "r")


def test_impute_strategies_and_adapter(spark):
    """impute fills NULLs with per-group mean/median/deterministic
    mode/constant; all-null groups keep their NULLs; flag column
    records which rows were filled."""
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.stats import impute

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 1.0), ("a", None),
         ("b", 10.0), ("b", None), ("c", None)],
        "g string, v double",
    )

    def got(strategy, **kw):
        out = impute(df, "v", strategy, ["g"], flag_col="f", **kw)
        return sorted((r.g, r.v, r.f) for r in out.collect())

    assert got("mean")[2] == ("a", (1 + 3 + 1) / 3, True)
    assert got("median").count(("a", 1.0, True)) == 1
    assert got("mode").count(("a", 1.0, True)) == 1  # fill = mode 1.0
    # all-null group keeps NULL and is NOT flagged as imputed
    assert got("mean")[-1] == ("c", None, False)

    const = impute(df, "v", "constant", fill_value=-1.0)
    assert sorted(r.v for r in const.collect())[:2] == [-1.0, -1.0]

    with _pytest.raises(Exception, match="requires fill_value"):
        impute(df, "v", "constant")
    with _pytest.raises(Exception, match="strategy must be"):
        impute(df, "v", "nope")

    # deterministic mode tiebreak: equal counts -> smallest value
    tie = spark.createDataFrame(
        [("g", 5.0), ("g", 2.0), ("g", None)], "g string, v double"
    )
    assert impute(tie, "v", "mode", ["g"]).where(
        "v = 2.0"
    ).count() == 2

    # YAML adapter route
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    cfg = TransformationConfig(
        type="stats",
        options={"operation": "impute", "valueColumn": "v",
                 "strategy": "median", "groupBy": "g"},
    )
    out = TRANSFORMER_REGISTRY["stats"].transform(
        df, cfg, RunContext.create("t-imp", spark)
    )
    assert out.where("g = 'a' AND v IS NULL").count() == 0


def test_multiple_regression_matches_numpy(spark):
    """Two-feature OLS via exact-moment Cramer's rule equals numpy
    lstsq; collinear regressors and n < 3 yield NULL coefficients."""
    import numpy as np
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.stats import multiple_regression

    rng = [(float(i % 13), float((i * 7) % 5), ) for i in range(200)]
    rows = [
        ("g", x1, x2, round(3.0 + 2.5 * x1 - 1.25 * x2 + ((i * 31) % 9 - 4) * 0.25, 2))
        for i, (x1, x2) in enumerate(rng)
    ]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    r = multiple_regression(df, "y", ["x1", "x2"], ["g"]).collect()[0]
    X = np.column_stack(
        [np.ones(len(rows)), [a for _, a, _, _ in rows], [b for _, _, b, _ in rows]]
    )
    beta, *_ = np.linalg.lstsq(X, np.array([y for *_, y in rows]), rcond=None)
    assert r.intercept == _pytest.approx(beta[0], rel=1e-9)
    assert r.beta_x1 == _pytest.approx(beta[1], rel=1e-9)
    assert r.beta_x2 == _pytest.approx(beta[2], rel=1e-9)
    assert 0.9 < r.r2 <= 1.0

    # perfectly collinear regressors -> singular -> NULLs
    col = spark.createDataFrame(
        [("g", float(i), 2.0 * i, float(i)) for i in range(10)],
        "g string, x1 double, x2 double, y double",
    )
    rc = multiple_regression(col, "y", ["x1", "x2"], ["g"]).collect()[0]
    assert rc.intercept is None and rc.beta_x1 is None

    with _pytest.raises(Exception, match="2-regressor"):
        multiple_regression(df, "y", ["x1"], ["g"])


def test_benford_counts_and_chi2(spark):
    """Benford audit: leading digits from the micro-unit decimal
    string (no libm log10); exact counts; chi2 against the literal
    expected proportions; zero/null/sub-resolution values excluded."""
    from etl_spark_gradle_spark.operators.stats import _BENFORD_P, benford_test

    rows = [
        ("a", 123.45), ("a", 19.99), ("a", 0.5), ("a", 9000.0),
        ("a", None), ("a", 0.0), ("a", -234.5), ("a", 0.0000001),
        ("b", 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in benford_test(df, "v", ["g"]).collect()}
    a = out["a"]
    # digits: 123.45->1, 19.99->1, 0.5->5, 9000->9, -234.5->2; null,
    # zero, 1e-7 (below micro-unit resolution) excluded
    assert a.n == 5
    assert (a.d1, a.d2, a.d5, a.d9) == (2, 1, 1, 1)
    exp_chi = 0.0
    obs = {1: 2, 2: 1, 5: 1, 9: 1}
    for d in range(1, 10):
        e = 5 * _BENFORD_P[d - 1]
        diff = obs.get(d, 0) - e
        exp_chi = exp_chi + (diff * diff) / e
    assert abs(a.chi2 - exp_chi) < 1e-9
    assert out["b"].n == 1 and out["b"].d1 == 1

    # a benford-conforming sample scores lower chi2 than a flat one
    import math
    conforming = [(float(10 ** (i % 3)) * d, ) for d in range(1, 10)
                  for i in range(int(100 * math.log10(1 + 1 / d)))]
    flat = [(float(d * 100 + 7),) for d in range(1, 10) for _ in range(11)]
    cdf = spark.createDataFrame(conforming, "v double")
    fdf = spark.createDataFrame(flat, "v double")
    chi_c = benford_test(cdf, "v").collect()[0].chi2
    chi_f = benford_test(fdf, "v").collect()[0].chi2
    assert chi_c < chi_f


def test_multiple_regression_and_benford_yaml_adapters(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [("g", float(i), float(i % 4), 1.0 + 2.0 * i + 0.5 * (i % 4))
         for i in range(30)],
        "g string, x1 double, x2 double, y double",
    )
    t = TRANSFORMER_REGISTRY["stats"]
    cfg = TransformationConfig(
        type="stats",
        options={"operation": "multiple_regression", "yColumn": "y",
                 "xColumns": "x1,x2", "groupBy": "g"},
    )
    row = t.transform(df, cfg, RunContext.create("t-mr", spark)).collect()[0]
    import pytest as _pytest
    assert row.beta_x1 == _pytest.approx(2.0, rel=1e-9)
    assert row.beta_x2 == _pytest.approx(0.5, rel=1e-9)
    assert row.intercept == _pytest.approx(1.0, rel=1e-9)

    bad = TransformationConfig(
        type="stats",
        options={"operation": "multiple_regression", "yColumn": "y",
                 "xColumns": "x1"},
    )
    assert not t.validate(df, bad).is_valid

    bcfg = TransformationConfig(
        type="stats", options={"operation": "benford", "valueColumn": "y"},
    )
    brow = t.transform(df, bcfg, RunContext.create("t-bf", spark)).collect()[0]
    assert brow.n == 30 and brow.chi2 is not None


def test_welch_ttest_matches_numpy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = {
        r.l_returnflag: r
        for r in st.welch_ttest(
            li, "l_extendedprice", "l_linestatus", group_by=["l_returnflag"]
        ).collect()
    }
    pdf = li.select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    ).toPandas()
    # the engine works on the decimal(18,2) projection of the value
    pdf["v"] = np.floor(pdf["l_extendedprice"] * 100 + 0.5) / 100
    for flag, r in rows.items():
        g = pdf[pdf.l_returnflag == flag]
        a = g[g.l_linestatus == "F"]["v"].to_numpy()
        b = g[g.l_linestatus == "O"]["v"].to_numpy()
        if len(a) < 2 or len(b) < 2:
            continue
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(se2)
        dof = se2 * se2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert r.n_a == len(a) and r.n_b == len(b)
        assert abs(r.mean_a - a.mean()) < 1e-6
        assert abs(r.var_a - va) < max(1e-6 * va, 1e-6)
        assert abs(r.t_stat - t) < 1e-8 * max(1.0, abs(t))
        assert abs(r.df_welch - dof) < 1e-6 * dof


def test_welch_ttest_edges_and_validation(spark):
    # explicit sides, null values/sides ignored, n<2 -> NULL stats
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("b", 5.0), (None, 9.0)],
        "side string, v double",
    )
    r = st.welch_ttest(df, "v", "side").collect()[0]
    assert (r.n_a, r.n_b) == (2, 1)
    assert r.var_b is None and r.t_stat is None and r.df_welch is None
    assert abs(r.mean_a - 1.5) < 1e-12 and abs(r.mean_b - 5.0) < 1e-12
    # zero variance on both sides -> NULL t (se2 == 0)
    z = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)],
        "side string, v double",
    )
    rz = st.welch_ttest(z, "v", "side").collect()[0]
    assert rz.t_stat is None and rz.var_a == 0.0
    # explicit side values restrict the comparison
    three = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0), ("a", 2.0), ("b", 4.0)],
        "side string, v double",
    )
    re = st.welch_ttest(three, "v", "side", side_a="a", side_b="b").collect()[0]
    assert (re.n_a, re.n_b) == (2, 2)
    with pytest.raises(TransformationError, match="exactly"):
        st.welch_ttest(three, "v", "side")
    with pytest.raises(TransformationError, match="both"):
        st.welch_ttest(three, "v", "side", side_a="a")
    with pytest.raises(TransformationError, match="differ"):
        st.welch_ttest(three, "v", "side", side_a="a", side_b="a")
    with pytest.raises(TransformationError, match="not in input schema"):
        st.welch_ttest(three, "nope", "side")


def test_welch_ttest_yaml_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame(
        [("x", "a", 1.0), ("x", "a", 3.0), ("x", "b", 2.0), ("x", "b", 6.0)],
        "g string, side string, v double",
    )
    t = TRANSFORMER_REGISTRY["stats"]
    cfg = TransformationConfig(
        type="stats",
        options={"operation": "welch_ttest", "valueColumn": "v",
                 "sideColumn": "side", "groupBy": "g"},
    )
    assert t.validate(df, cfg).is_valid
    out = t.transform(df, cfg, None)
    assert set(out.columns) == {
        "g", "n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b",
        "t_stat", "df_welch",
    }
    assert out.count() == 1
    bad = TransformationConfig(
        type="stats",
        options={"operation": "welch_ttest", "valueColumn": "v",
                 "sideColumn": "side", "sideA": "a"},
    )
    assert not t.validate(df, bad).is_valid


class TestPropZtest:
    def test_matches_formula_and_handles_edges(self, spark):
        import math

        from etl_spark_gradle_spark.operators.stats import prop_ztest

        rows = (
            [("A", True)] * 120 + [("A", False)] * 80      # p_a = 0.6
            + [("B", True)] * 60 + [("B", False)] * 90     # p_b = 0.4
            + [("A", None)] * 7                            # excluded
        )
        df = spark.createDataFrame(rows, "v string, ok boolean").repartition(5)
        r = prop_ztest(df, "ok", "v").collect()[0]
        assert (r.n_a, r.x_a, r.n_b, r.x_b) == (200, 120, 150, 60)
        assert r.p_a == 120 / 200 and r.p_b == 60 / 150
        p = (120 + 60) / (200 + 150)
        se = math.sqrt(p * (1 - p) * (1 / 200 + 1 / 150))
        assert abs(r.z_stat - (0.6 - 0.4) / se) < 1e-12
        # degenerate pooled rate (all successes) -> NULL z
        const = spark.createDataFrame(
            [("A", 1)] * 5 + [("B", 1)] * 5, "v string, ok int"
        )
        assert prop_ztest(const, "ok", "v").collect()[0].z_stat is None
        # one side empty (explicit sides) -> NULL z, zero counts
        lone = spark.createDataFrame([("A", 1), ("A", 0)], "v string, ok int")
        r2 = prop_ztest(lone, "ok", "v", side_a="A", side_b="B").collect()[0]
        assert (r2.n_b, r2.x_b, r2.z_stat) == (0, 0, None)

    def test_grouped_validation_and_adapter(self, spark):
        import pytest as _pytest

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.relational import (
            TransformationError,
        )
        from etl_spark_gradle_spark.operators.stats import prop_ztest
        from etl_spark_gradle_spark.plans.config import (
            RunContext,
            TransformationConfig,
        )

        rows = [
            ("g1", "A", 1), ("g1", "A", 0), ("g1", "B", 0), ("g1", "B", 0),
            ("g2", "A", 1), ("g2", "B", 1), ("g2", "A", 0), ("g2", "B", 0),
        ]
        df = spark.createDataFrame(rows, "g string, v string, ok int")
        got = {
            r.g: (r.n_a, r.x_a, r.n_b, r.x_b)
            for r in prop_ztest(df, "ok", "v", group_by=["g"]).collect()
        }
        assert got == {"g1": (2, 1, 2, 0), "g2": (2, 1, 2, 1)}
        with _pytest.raises(TransformationError, match="both side_a"):
            prop_ztest(df, "ok", "v", side_a="A")
        three = spark.createDataFrame(
            [("A", 1), ("B", 0), ("C", 1)], "v string, ok int"
        )
        with _pytest.raises(TransformationError, match="exactly"):
            prop_ztest(three, "ok", "v")
        t = TRANSFORMER_REGISTRY["stats"]
        cfg = TransformationConfig(
            type="stats",
            options={"operation": "prop_ztest", "flagColumn": "ok",
                     "sideColumn": "v", "groupBy": "g"},
        )
        assert t.validate(df, cfg).is_valid
        out = t.transform(
            df, cfg, RunContext(pipeline_id="t", run_id="r", spark=spark)
        )
        assert out.count() == 2
        bad = TransformationConfig(
            type="stats", options={"operation": "prop_ztest"}
        )
        assert not t.validate(df, bad).is_valid


def test_quantile_normalize_yaml_adapter(spark):
    """Round-9 YAML surface completion: quantile_normalize gets a
    registry route (referenceTable via views, the negative_sample
    pattern) — output equals the direct operator call."""
    import types

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.stats import quantile_normalize
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame(
        [(float(v),) for v in (1, 2, 2, 5, 9)], "x double"
    )
    ref = spark.createDataFrame(
        [(float(v),) for v in (10, 20, 30, 40, 50)], "r double"
    )
    ref.createOrReplaceTempView("_qn_ref")
    t = TRANSFORMER_REGISTRY["quantile_normalize"]
    cfg = TransformationConfig(
        type="quantile_normalize",
        options={"valueColumn": "x", "referenceTable": "_qn_ref",
                 "referenceColumn": "r", "outputColumn": "xn"},
    )
    assert t.validate(df, cfg).is_valid
    got = sorted(
        (r["x"], r["xn"])
        for r in t.transform(df, cfg, types.SimpleNamespace(spark=spark))
        .collect()
    )
    want = sorted(
        (r["x"], r["xn"])
        for r in quantile_normalize(df, "x", ref, "r", out_col="xn")
        .collect()
    )
    assert got == want and {v for _, v in got} <= {10, 20, 30, 40, 50}
    bad = TransformationConfig(
        type="quantile_normalize", options={"valueColumn": "x"}
    )
    assert not t.validate(df, bad).is_valid


def test_spearman_matches_pure_python(spark):
    import collections
    import math
    import random

    from etl_spark_gradle_spark.operators.stats import spearman

    random.seed(11)
    pts = [(random.randint(0, 50) / 3.0, random.gauss(0, 1))
           for _ in range(400)]
    pts = [(x, x * 0.5 + e) for x, e in pts]
    pts += [(None, 1.0), (2.0, None)]
    df = spark.createDataFrame(pts, "x double, y double").repartition(8)
    r = spearman(df, "x", "y").collect()[0]
    clean = [(x, y) for x, y in pts if x is not None and y is not None]

    def avg_ranks(vs):
        c = collections.Counter(vs)
        out, cum = {}, 0
        for v in sorted(c):
            out[v] = cum + (c[v] + 1) / 2.0
            cum += c[v]
        return out

    rx = avg_ranks([x for x, _ in clean])
    ry = avg_ranks([y for _, y in clean])
    xs = [rx[x] for x, _ in clean]
    ys = [ry[y] for _, y in clean]
    n = len(clean)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert r["n"] == n
    assert r["rho"] == pytest.approx(rho, abs=1e-12)
    # monotone transform invariance: rho(x, exp(y)) == rho(x, y)
    import pyspark.sql.functions as F

    r2 = spearman(df.withColumn("y", F.exp("y")), "x", "y").collect()[0]
    assert r2["rho"] == pytest.approx(r["rho"], abs=1e-12)
    # degenerate: constant column -> NULL rho
    const = spark.createDataFrame([(1.0, 2.0), (2.0, 2.0)], "x double, y double")
    assert spearman(const, "x", "y").collect()[0]["rho"] is None


def test_fdr_bh_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import fdr_bh
    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
    )

    random.seed(4)
    tests = [(i, random.random()) for i in range(300)]
    tests += [(1000 + i, random.random() * 0.0005) for i in range(25)]
    tests += [(2000, None)]
    df = spark.createDataFrame(tests, "test_id long, p double").repartition(4)
    got = {r["test_id"]: r for r in
           fdr_bh(df, "p", "test_id", q=0.05).collect()}
    clean = sorted((p, i) for i, p in tests if p is not None)
    m = len(clean)
    k = 0
    for idx, (p, _) in enumerate(clean, start=1):
        if p * m <= idx * 0.05:
            k = idx
    want = {i for idx, (_, i) in enumerate(clean, start=1) if idx <= k}
    assert {i for i, r in got.items() if r["significant"]} == want
    assert all(got[i]["rank"] == idx and got[i]["m"] == m
               for idx, (_, i) in enumerate(clean, start=1))
    assert 2000 not in got  # NULL p excluded
    # the planted low-p block is discovered
    assert want >= {1000 + i for i in range(25)}
    # all-null-signal input: uniform ps, q tiny -> nothing significant
    nulls = spark.createDataFrame(
        [(i, 0.5 + i / 1000.0) for i in range(100)], "test_id long, p double"
    )
    out = fdr_bh(nulls, "p", "test_id", q=0.01).collect()
    assert not any(r["significant"] for r in out)
    with pytest.raises(TransformationError):
        fdr_bh(df, "p", "test_id", q=1.5)
    with pytest.raises(TransformationError):
        fdr_bh(df, "missing", "test_id")


def test_anova_f_matches_pure_python(spark):
    import random
    from decimal import Decimal

    from etl_spark_gradle_spark.operators.stats import anova_f
    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
    )

    random.seed(2)
    rows = []
    for lvl, mu in (("a", 10.0), ("b", 12.0), ("c", 10.5)):
        rows += [(lvl, round(mu + random.gauss(0, 1), 2))
                 for _ in range(60)]
    rows += [("a", None), (None, 5.0)]
    df = spark.createDataFrame(rows, "lvl string, x double").repartition(4)
    r = anova_f(df, "x", "lvl").collect()[0]
    # exact-decimal reference with the SAME ordered fold
    from collections import defaultdict

    data = defaultdict(list)
    for lvl, x in rows:
        if lvl is not None and x is not None:
            data[lvl].append(Decimal(repr(x)))
    N = sum(len(v) for v in data.values())
    k = len(data)
    gs = float(sum(sum(v) for v in data.values()))
    gsq = float(sum(x * x for v in data.values() for x in v))
    a = 0.0
    for lvl in sorted(data):
        s = float(sum(data[lvl]))
        a = a + (s * s) / len(data[lvl])
    ssb = a - gs * gs / N
    ssw = gsq - a
    fref = (ssb / (k - 1)) / (ssw / (N - k))
    assert r["n"] == N and r["k_levels"] == k
    assert r["ss_between"] == pytest.approx(ssb, abs=1e-9)
    assert r["f_stat"] == pytest.approx(fref, rel=1e-12)
    # identical group means -> F near 0; single level -> NULL
    flat = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)],
        "lvl string, x double",
    )
    rf = anova_f(flat, "x", "lvl").collect()[0]
    assert rf["f_stat"] == pytest.approx(0.0, abs=1e-12)
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "lvl string, x double")
    assert anova_f(one, "x", "lvl").collect()[0]["f_stat"] is None
    with pytest.raises(TransformationError):
        anova_f(df, "missing", "lvl")


def test_kruskal_wallis_matches_pure_python(spark):
    import collections
    import random

    from etl_spark_gradle_spark.operators.stats import kruskal_wallis
    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
    )

    random.seed(6)
    rows = []
    for lvl, mu in (("a", 10.0), ("b", 12.0), ("c", 10.5)):
        rows += [(lvl, round(mu + random.gauss(0, 1), 1))
                 for _ in range(70)]  # 1 dp -> heavy ties
    rows += [("a", None), (None, 3.0)]
    df = spark.createDataFrame(rows, "lvl string, x double").repartition(4)
    r = kruskal_wallis(df, "x", "lvl").collect()[0]
    clean = [(l, x) for l, x in rows if l is not None and x is not None]
    cnt = collections.Counter(x for _, x in clean)
    cum, avg_rank = 0, {}
    for v in sorted(cnt):
        avg_rank[v] = cum + (cnt[v] + 1) / 2.0
        cum += cnt[v]
    N = len(clean)
    groups = collections.defaultdict(list)
    for l, x in clean:
        groups[l].append(x)
    a = 0.0
    for l in sorted(groups):
        R = sum(avg_rank[x] for x in groups[l])
        a = a + (R * R) / len(groups[l])
    H = 12.0 / (N * (N + 1)) * a - 3 * (N + 1)
    C = 1 - sum(c ** 3 - c for c in cnt.values()) / (N ** 3 - N)
    assert r["n"] == N and r["k_levels"] == 3
    assert r["h"] == pytest.approx(H, rel=1e-12)
    assert r["h_adj"] == pytest.approx(H / C, rel=1e-12)
    # identical distributions -> H_adj near 0; all-tied values -> NULL
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)],
        "lvl string, x double",
    )
    rs = kruskal_wallis(same, "x", "lvl").collect()[0]
    assert abs(rs["h_adj"]) < 1e-9
    tied = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 5.0)], "lvl string, x double"
    )
    assert kruskal_wallis(tied, "x", "lvl").collect()[0]["h_adj"] is None
    with pytest.raises(TransformationError):
        kruskal_wallis(df, "missing", "lvl")
