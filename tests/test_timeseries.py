"""Time-series resample/gap-fill (operators/timeseries.py) and the
one-pass column profiler (quality.profile_columns)."""

from __future__ import annotations

import datetime as dt

import pytest

from etl_spark_gradle_spark.operators.timeseries import resample
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.plans.config import AggregateExpr
from etl_spark_gradle_spark.quality import profile_columns


def _series(spark):
    """One series with observations at t=0,60,300 s (gaps at 120,180,240)
    and a second series with a single observation."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base, 10.0),
        ("a", base + dt.timedelta(seconds=60), 20.0),
        ("a", base + dt.timedelta(seconds=300), 40.0),
        ("b", base + dt.timedelta(seconds=30), 7.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


AGG = [AggregateExpr("v", "avg", "v")]


def _grid(spark, fill):
    out = resample(_series(spark), "ts", 60, AGG, group_by=["k"], fill=fill)
    return {(r.k, r.bucket_ts): r for r in out.collect()}


def test_resample_emits_complete_grid_with_gap_marker(spark):
    rows = _grid(spark, "null")
    # series a: buckets 0..300 -> 6 rows; series b: 1 row
    assert len(rows) == 7
    a0 = min(b for (k, b) in rows if k == "a")
    gaps = [rows[("a", a0 + s * 60)] for s in (2, 3, 4)]
    assert all(r.n_obs == 0 and r.v is None for r in gaps)
    assert rows[("a", a0)].v == 10.0 and rows[("a", a0)].n_obs == 1
    assert rows[("b", a0 + 30 // 60)].n_obs == 1  # single-bucket series survives


def test_resample_zero_and_ffill(spark):
    z = _grid(spark, "zero")
    a0 = min(b for (k, b) in z if k == "a")
    assert z[("a", a0 + 120)].v == 0.0
    f = _grid(spark, "ffill")
    # gap buckets carry the last observed value (20.0 at t=60)
    for s in (2, 3, 4):
        assert f[("a", a0 + s * 60)].v == 20.0
    assert f[("a", a0 + 300)].v == 40.0


def test_resample_linear_interpolation_exact(spark):
    rows = _grid(spark, "linear")
    a0 = min(b for (k, b) in rows if k == "a")
    # between (60 s, 20.0) and (300 s, 40.0): slope = 20/240 per second
    for s in (2, 3, 4):
        t = s * 60
        want = 20.0 + (40.0 - 20.0) * ((t - 60) / (300 - 60))
        assert rows[("a", a0 + t)].v == pytest.approx(want, abs=1e-12)
    # observed buckets pass through untouched
    assert rows[("a", a0)].v == 10.0
    # single-observation series: nothing to bracket, edge stays itself
    (b_key,) = [key for key in rows if key[0] == "b"]
    assert rows[b_key].v == 7.0


def test_resample_origin_later_than_first_event_floors_correctly(spark):
    """An origin AFTER the earliest timestamp must still bucket every
    event to a grid cell that starts at-or-before it (true floor
    division, not truncate-toward-zero — ADVICE r4 medium)."""
    base = dt.datetime(2024, 1, 1)
    df = _series(spark)
    origin = int(base.timestamp()) + 70  # 70 s after the first event
    out = resample(df, "ts", 60, AGG, group_by=["k"], fill="null", origin=origin)
    rows = {(r.k, r.bucket_ts): r for r in out.collect()}
    base_s = int(base.timestamp())
    # grid is origin + k*60 => ... origin-120, origin-60, origin, ...
    # event at t=0 (70 s before origin) belongs to [origin-120, origin-60)
    assert rows[("a", origin - 120)].n_obs == 1
    assert rows[("a", origin - 120)].v == 10.0
    # event at t=60 (10 s before origin) belongs to [origin-60, origin)
    assert rows[("a", origin - 60)].v == 20.0
    # event at t=300 belongs to [origin+180, origin+240)
    assert rows[("a", origin + 180)].v == 40.0
    # every bucket start is at-or-before an event it contains, and
    # the grid is exactly aligned to origin mod 60
    assert all((b - origin) % 60 == 0 for (_, b) in rows)
    assert all(b <= base_s + 300 for (k, b) in rows if k == "a")


def test_resample_validation(spark):
    df = _series(spark)
    with pytest.raises(TransformationError, match="step_seconds"):
        resample(df, "ts", 0, AGG)
    with pytest.raises(TransformationError, match="fill"):
        resample(df, "ts", 60, AGG, fill="bogus")
    with pytest.raises(TransformationError, match="time column"):
        resample(df, "nope", 60, AGG)
    with pytest.raises(TransformationError, match="AggregateExpr"):
        resample(df, "ts", 60, [])


def test_resample_global_series(spark):
    out = resample(_series(spark), "ts", 60, AGG, fill="ffill")
    rows = sorted(out.collect(), key=lambda r: r.bucket_ts)
    assert len(rows) == 6  # one global series spanning 0..300
    assert rows[0].v == pytest.approx((10.0 + 7.0) / 2)  # both series in bucket 0


def test_resample_yaml_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    cfg = TransformationConfig(
        type="resample",
        options={"timeColumn": "ts", "stepSeconds": "60", "groupBy": "k",
                 "fill": "zero"},
        aggregations=(AggregateExpr("v", "sum", "total"),),
    )
    t = TRANSFORMER_REGISTRY["resample"]
    assert t.validate(_series(spark), cfg).is_valid
    out = t.transform(_series(spark), cfg, None)
    assert {r.total for r in out.collect() if r.n_obs == 0} == {0.0}
    bad = TransformationConfig(type="resample", options={"stepSeconds": "x"})
    assert not t.validate(_series(spark), bad).is_valid


def test_profile_columns_counts_and_extrema(spark):
    df = spark.createDataFrame(
        [(1, "aa", 1.5), (2, None, -2.0), (2, "bbbb", None)],
        ["id", "s", "x"],
    )
    rows = {r.column: r for r in profile_columns(df).collect()}
    assert rows["id"].n_rows == 3 and rows["id"].n_nulls == 0
    assert rows["id"].n_distinct == 2
    assert rows["id"].min_num == 1.0 and rows["id"].max_num == 2.0
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_len == 2 and rows["s"].max_len == 4
    assert rows["s"].avg_len == pytest.approx(3.0)
    assert rows["s"].min_num is None
    assert rows["x"].n_nulls == 1 and rows["x"].min_num == -2.0
    # one aggregation job: profile of k columns is still a single plan
    assert rows["x"].n_rows == 3


def test_profile_timestamp_epoch_micros(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(base,), (base + dt.timedelta(seconds=1),)], ["ts"]
    )
    r = profile_columns(df).collect()[0]
    assert r.max_num - r.min_num == 1_000_000.0  # micros


def test_profile_interval_dtype_is_not_numeric(spark):
    """Interval dtypes must not fall into the numeric min/max branch —
    the old prefix match on "int" caught "interval …" and produced an
    invalid interval→double cast (ADVICE r4)."""
    df = spark.sql("select interval '1' day as iv, 42 as x")
    rows = {r.column: r for r in profile_columns(df).collect()}
    assert rows["iv"].min_num is None and rows["iv"].max_num is None
    assert rows["iv"].n_nulls == 0
    assert rows["x"].min_num == 42.0  # real ints still profile


def test_profile_approx_distinct_and_validation(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(1000)], ["v"])
    r = profile_columns(df, distinct="approx").collect()[0]
    assert 8 <= r.n_distinct <= 12  # HLL estimate of 10
    with pytest.raises(ValueError, match="distinct"):
        profile_columns(df, distinct="bogus")
    with pytest.raises(ValueError, match="not in input schema"):
        profile_columns(df, columns=["nope"])


# ---------------------------------------------------------- merge_intervals


def test_merge_intervals_basic_touching_and_counts(spark):
    from etl_spark_gradle_spark.operators.timeseries import merge_intervals

    rows = [(1, 0, 10), (1, 10, 20), (1, 25, 30), (2, 0, 1)]
    d = spark.createDataFrame(rows, "k int, s int, e int")
    got = {
        (r.k, r.island_start, r.island_end, r.n_intervals)
        for r in merge_intervals(d, "s", "e", ["k"]).collect()
    }
    # touching intervals merge: [0,10]+[10,20] cover [0,20] with no hole
    assert got == {(1, 0, 20, 2), (1, 25, 30, 1), (2, 0, 1, 1)}


def test_merge_intervals_min_gap_bridges_small_holes(spark):
    from etl_spark_gradle_spark.operators.timeseries import merge_intervals

    d = spark.createDataFrame(
        [(1, 0, 10), (1, 14, 20), (1, 40, 50)], "k int, s int, e int"
    )
    got = {
        (r.island_start, r.island_end, r.n_intervals)
        for r in merge_intervals(d, "s", "e", ["k"], min_gap=5).collect()
    }
    assert got == {(0, 20, 2), (40, 50, 1)}


def test_merge_intervals_degenerate_and_nulls(spark):
    from etl_spark_gradle_spark.operators.timeseries import merge_intervals

    # (27, 5): end < start clamps to a point at 27 inside [25,30];
    # null start/end rows are dropped
    d = spark.createDataFrame(
        [(1, 25, 30), (1, 27, 5), (1, None, 99), (1, 99, None)],
        "k int, s int, e int",
    )
    got = [
        (r.island_start, r.island_end, r.n_intervals)
        for r in merge_intervals(d, "s", "e", ["k"]).collect()
    ]
    assert got == [(25, 30, 2)]


def test_merge_intervals_timestamps_with_seconds_gap(spark):
    from etl_spark_gradle_spark.operators.timeseries import merge_intervals

    d = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00", "2024-01-01 00:10:00"),
            ("u", "2024-01-01 00:10:30", "2024-01-01 00:20:00"),
            ("u", "2024-01-01 01:00:00", "2024-01-01 01:05:00"),
        ],
        "k string, s string, e string",
    ).selectExpr("k", "CAST(s AS TIMESTAMP) s", "CAST(e AS TIMESTAMP) e")
    out = merge_intervals(d, "s", "e", ["k"], min_gap=60).collect()
    spans = sorted(
        (str(r.island_start), str(r.island_end), r.n_intervals) for r in out
    )
    assert spans == [
        ("2024-01-01 00:00:00", "2024-01-01 00:20:00", 2),
        ("2024-01-01 01:00:00", "2024-01-01 01:05:00", 1),
    ]


def test_merge_intervals_matches_python_reference(spark):
    import random

    from etl_spark_gradle_spark.operators.timeseries import merge_intervals

    rng = random.Random(41)
    rows = [
        (rng.randint(1, 5), s, s + rng.randint(0, 40))
        for _ in range(400)
        for s in [rng.randint(0, 1000)]
    ]
    d = spark.createDataFrame(rows, "k int, s int, e int")
    got = {
        (r.k, r.island_start, r.island_end, r.n_intervals)
        for r in merge_intervals(d, "s", "e", ["k"]).collect()
    }
    want = set()
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        cur = None
        for s, e in sorted(ivs):
            if cur is None or s > cur[1]:
                if cur:
                    want.add((k, cur[0], cur[1], cur[2]))
                cur = [s, max(s, e), 1]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
        want.add((k, cur[0], cur[1], cur[2]))
    assert got == want


def test_intervals_adapter_validation_and_transform(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    tr = TRANSFORMER_REGISTRY["intervals"]
    d = spark.createDataFrame([(1, 0, 10), (1, 5, 20)], "k int, s int, e int")
    cfg = TransformationConfig(
        type="intervals",
        options={"startColumn": "s", "endColumn": "e", "groupBy": "k"},
    )
    assert tr.validate(d, cfg).is_valid
    out = tr.transform(d, cfg, None).collect()
    assert len(out) == 1 and out[0].n_intervals == 2
    for bad in (
        {"endColumn": "e"},
        {"startColumn": "s", "endColumn": "nope"},
        {"startColumn": "s", "endColumn": "e", "minGap": "-1"},
        {"startColumn": "s", "endColumn": "e", "groupBy": "zz"},
    ):
        assert not tr.validate(
            d, TransformationConfig(type="intervals", options=bad)
        ).is_valid
    with pytest.raises(TransformationError, match="invalid"):
        tr.transform(
            d, TransformationConfig(type="intervals", options={}), None
        )


# ---------------------------------------------------------------- cusum


def _py_cusum(xs, target, slack, res=6):
    import math

    scale = 10**res
    sp = sn = 0
    out = []
    for x in xs:
        sp = max(0, sp + math.floor((x - target - slack) * scale))
        sn = max(0, sn + math.floor((target - x - slack) * scale))
        out.append((sp / scale, sn / scale))
    return out


def test_cusum_matches_recursive_reference(spark):
    """The window prefix-sum identity must equal the literal max(0, ..)
    recursion, including a level shift that alarms."""
    from etl_spark_gradle_spark.operators.timeseries import cusum_changepoints

    xs = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 13.0, 13.2, 12.8, 13.1]
    df = spark.createDataFrame(
        [("s", i, x) for i, x in enumerate(xs)], "g string, t int, x double"
    ).repartition(4)
    got = (
        cusum_changepoints(
            df, "x", "t", threshold=4.0, series_by=["g"],
            target=10.0, slack=0.5,
        )
        .orderBy("t")
        .collect()
    )
    want = _py_cusum(xs, 10.0, 0.5)
    for row, (sp, sn) in zip(got, want):
        assert abs(row["cusum_pos"] - sp) < 1e-12, (row["t"], row["cusum_pos"], sp)
        assert abs(row["cusum_neg"] - sn) < 1e-12
        assert row["alarm"] == (sp > 4.0 or sn > 4.0)
    # the shift at t=6 must alarm within a few observations
    assert [r["t"] for r in got if r["alarm"]] == [7, 8, 9]


def test_cusum_downward_shift_and_default_target(spark):
    from etl_spark_gradle_spark.operators.timeseries import cusum_changepoints

    xs = [5.0] * 20 + [1.0] * 5
    df = spark.createDataFrame(
        [("s", i, x) for i, x in enumerate(xs)], "g string, t int, x double"
    )
    # default target = exact series mean = (100+5)/25 = 4.2
    got = (
        cusum_changepoints(df, "x", "t", threshold=6.0, series_by=["g"])
        .orderBy("t")
        .collect()
    )
    want = _py_cusum(xs, 4.2, 0.0)
    for row, (sp, sn) in zip(got, want):
        assert abs(row["cusum_pos"] - sp) < 1e-9
        assert abs(row["cusum_neg"] - sn) < 1e-9
    assert any(r["alarm"] and r["x"] == 1.0 for r in got)


def test_cusum_grouped_nulls_and_partition_determinism(spark):
    from etl_spark_gradle_spark.operators.timeseries import cusum_changepoints

    rows = []
    for g in ("a", "b"):
        base = 10.0 if g == "a" else 50.0
        for i in range(60):
            rows.append((g, i, base + (i % 7) - 3 + (20 if g == "a" and i > 40 else 0)))
    rows.append(("a", 100, None))  # dropped
    rows.append(("b", None, 1.0))  # dropped
    df = spark.createDataFrame(rows, "g string, t int, x double")

    outs = []
    for parts in (1, 5, 32):
        out = cusum_changepoints(
            df.repartition(parts), "x", "t", threshold=15.0, series_by=["g"]
        )
        outs.append(
            sorted(
                (r["g"], r["t"], r["cusum_pos"], r["cusum_neg"], r["alarm"])
                for r in out.collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 120  # null value + null time rows dropped
    # the injected level shift in series a alarms; series b never does
    assert any(g == "a" and a for g, t, p, n, a in outs[0])
    assert not any(g == "b" and a for g, t, p, n, a in outs[0])


def test_cusum_validation_and_adapter(spark):
    import pytest as _pytest

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.timeseries import (
        CusumTransformer,
        cusum_changepoints,
    )
    from etl_spark_gradle_spark.plans.config import (
        RunContext,
        TransformationConfig,
    )

    df = spark.createDataFrame([("s", 1, 1.0)], "g string, t int, x double")
    with _pytest.raises(TransformationError, match="threshold"):
        cusum_changepoints(df, "x", "t", threshold=0)
    with _pytest.raises(TransformationError, match="slack"):
        cusum_changepoints(df, "x", "t", threshold=1.0, slack=-1)
    with _pytest.raises(TransformationError, match="not in input schema"):
        cusum_changepoints(df, "zzz", "t", threshold=1.0)

    tf = CusumTransformer()
    assert type(TRANSFORMER_REGISTRY["changepoint"]) is CusumTransformer
    out = tf.transform(
        df,
        TransformationConfig(
            type="changepoint",
            options={
                "valueColumn": "x", "timeColumn": "t", "threshold": "2.5",
                "seriesBy": "g", "target": "0.0",
            },
        ),
        RunContext.create("t", spark),
    )
    row = out.collect()[0]
    assert row["cusum_pos"] == 1.0 and row["alarm"] is False
    bad = tf.validate(
        df, TransformationConfig(type="changepoint", options={"threshold": "x"})
    )
    assert not bad.is_valid


def test_cusum_null_series_key_nan_values_and_guards(spark):
    """NULL series keys are monitored like any series (in BOTH target
    modes — the defaulted-mean join is null-safe); NaN values are
    dropped like NULLs; reserved/validation guards fire."""
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.timeseries import (
        CusumTransformer,
        cusum_changepoints,
    )
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    rows = [(None, i, 10.0 + (5.0 if i >= 5 else 0.0)) for i in range(10)]
    rows += [("a", i, 10.0) for i in range(10)]
    rows += [("a", 100, float("nan"))]
    df = spark.createDataFrame(rows, "g string, t int, x double")

    for target in (None, 10.0):
        out = cusum_changepoints(
            df, "x", "t", threshold=3.0, series_by=["g"], target=target
        ).collect()
        by_key = {(r["g"], r["t"]): r for r in out}
        assert len(out) == 20  # NaN row dropped, NULL-series rows kept
        assert ("a", 100) not in by_key
        assert any(g is None and r["alarm"] for (g, t), r in by_key.items())

    with _pytest.raises(TransformationError, match="reserved"):
        cusum_changepoints(
            df.withColumnRenamed("x", "cusum_pos"), "cusum_pos", "t", threshold=1.0
        )
    res = CusumTransformer().validate(
        df,
        TransformationConfig(
            type="changepoint",
            options={
                "valueColumn": "x", "timeColumn": "t", "threshold": "2",
                "slack": "abc",
            },
        ),
    )
    assert not res.is_valid and any("slack" in e for e in res.errors)


# ---------------------------------------------------------------------------
# time_rollup (hierarchical continuous aggregate)
# ---------------------------------------------------------------------------


def test_time_rollup_levels_match_direct_groupby(spark, sf_dir):
    """Every coarser level — computed by re-aggregating the finer
    bucket table — must EQUAL a direct groupBy of the raw data at that
    level (the mergeability claim, checked value-for-value)."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.timeseries import time_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = time_rollup(
        ev, "ts", ["value"], levels=[3600, 21600, 86400],
        group_by=["event_type"],
    ).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r["level_seconds"], {})[
            (r["event_type"], r["bucket_ts"])
        ] = r
    assert set(by_level) == {3600, 21600, 86400}

    for step in (3600, 21600, 86400):
        direct = (
            ev.groupBy(
                "event_type",
                (
                    (F.unix_timestamp("ts") - F.pmod(F.unix_timestamp("ts"), F.lit(step)))
                ).alias("bucket_ts"),
            )
            .agg(
                F.count("value").alias("cnt"),
                F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )
            .collect()
        )
        got = by_level[step]
        assert len(direct) == len(got)
        for d in direct:
            r = got[(d["event_type"], d["bucket_ts"])]
            assert r["value_cnt"] == d["cnt"]
            assert abs(r["value_sum"] - float(d["s"])) < 1e-9
            assert r["value_min"] == d["mn"] and r["value_max"] == d["mx"]
            assert abs(r["value_avg"] - float(d["s"]) / d["cnt"]) < 1e-12


def test_time_rollup_null_values_and_validation(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.relational import TransformationError
    from etl_spark_gradle_spark.operators.timeseries import time_rollup

    df = spark.createDataFrame(
        [("2024-01-01 00:00:30", 1.5), ("2024-01-01 00:01:30", None),
         ("2024-01-01 00:02:30", 2.5)],
        "ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        (r["level_seconds"], r["bucket_ts"]): r
        for r in time_rollup(df, "ts", ["v"], levels=[60, 180]).collect()
    }
    # minute buckets: the null-valued bucket has cnt 0 and NULL stats
    base = 1704067200
    assert rows[(60, base)]["v_cnt"] == 1
    assert rows[(60, base + 60)]["v_cnt"] == 0
    assert rows[(60, base + 60)]["v_sum"] is None
    assert rows[(60, base + 60)]["v_avg"] is None
    # 3-minute rollup merges across the null bucket correctly
    top = rows[(180, base)]
    assert top["v_cnt"] == 2 and abs(top["v_sum"] - 4.0) < 1e-12
    assert top["v_min"] == 1.5 and top["v_max"] == 2.5

    with pytest.raises(TransformationError, match="divide the next"):
        time_rollup(df, "ts", ["v"], levels=[60, 90])
    with pytest.raises(TransformationError, match="ascending"):
        time_rollup(df, "ts", ["v"], levels=[120, 60])
    with pytest.raises(TransformationError, match="value column|column not in"):
        time_rollup(df, "ts", ["nope"], levels=[60])


def test_time_rollup_yaml_adapter(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame(
        [("2024-01-01 00:00:30", 1.0), ("2024-01-01 02:10:00", 3.0)],
        "ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tr = TRANSFORMER_REGISTRY["time_rollup"]
    cfg = TransformationConfig(
        type="time_rollup",
        options={"timeColumn": "ts", "valueColumns": "value",
                 "levels": "3600,7200"},
    )
    assert tr.validate(df, cfg).is_valid
    out = tr.transform(df, cfg, None)
    assert {r["level_seconds"] for r in out.collect()} == {3600, 7200}
    bad = TransformationConfig(
        type="time_rollup",
        options={"timeColumn": "ts", "valueColumns": "value", "levels": "60,90"},
    )
    assert not tr.validate(df, bad).is_valid


def test_rolling_median_exact_and_prob(spark):
    """Rolling median over the last N rows per key: interpolated
    median of the two middle order statistics, NULLs excluded from
    the window, type-1 quantile via prob, window narrower at the
    partition head."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.timeseries import rolling_median

    rows = [
        ("u1", 1, 10.0), ("u1", 2, 20.0), ("u1", 3, None),
        ("u1", 4, 40.0), ("u1", 5, 1000.0),
        ("u2", 1, 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "t", "v"
    )
    out = {
        (r.k, r.t): r.v_rolling_median
        for r in rolling_median(df, ["k"], "ts", "v", 3,
                                tiebreak=["t"]).collect()
    }
    assert out[("u1", 1)] == 10.0
    assert out[("u1", 2)] == 15.0            # (10+20)/2
    assert out[("u1", 3)] == 15.0            # NULL excluded, window={10,20}
    assert out[("u1", 4)] == 30.0            # {20,40} (3-row window, 1 null)
    assert out[("u1", 5)] == 520.0           # {40,1000}
    assert out[("u2", 1)] == 5.0

    p = {
        (r.k, r.t): r.v_rolling_q
        for r in rolling_median(df, ["k"], "ts", "v", 3,
                                tiebreak=["t"], prob=1.0).collect()
    }
    assert p[("u1", 5)] == 1000.0 and p[("u1", 2)] == 20.0

    import pytest as _pytest
    with _pytest.raises(Exception, match="window_rows > 0"):
        rolling_median(df, ["k"], "ts", "v", 0)


def test_rolling_median_yaml_adapter(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [("u", 1, 1.0), ("u", 2, 9.0), ("u", 3, 5.0)],
        "k string, t long, v double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "t", "v")
    cfg = TransformationConfig(
        type="rolling_median",
        options={
            "timeColumn": "ts", "valueColumn": "v", "windowRows": "2",
            "partitionBy": "k", "tiebreak": "t", "outputColumn": "rm",
        },
    )
    t = TRANSFORMER_REGISTRY["rolling_median"]
    out = {r.t: r.rm for r in
           t.transform(df, cfg, RunContext.create("t-rm", spark)).collect()}
    assert out == {1: 1.0, 2: 5.0, 3: 7.0}

    bad = TransformationConfig(type="rolling_median",
                               options={"timeColumn": "ts"})
    res = t.validate(df, bad)
    assert not res.is_valid


def test_trimmed_mean_yaml_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.sparkSession.createDataFrame(
        [("g", float(v)) for v in range(1, 11)], "g string, v double"
    ) if hasattr(spark, "sparkSession") else spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)], "g string, v double"
    )
    cfg = TransformationConfig(
        type="stats",
        options={"operation": "trimmed_mean", "valueColumn": "v",
                 "lo": "0.1", "hi": "0.9", "groupBy": "g"},
    )
    t = TRANSFORMER_REGISTRY["stats"]
    row = t.transform(df, cfg, RunContext.create("t-tm", spark)).collect()[0]
    assert row.n == 10 and row.q_lo == 1.0 and row.q_hi == 9.0
    assert abs(row.mean - sum(range(1, 10)) / 9) < 1e-9


def test_acf_matches_pandas(spark):
    import pandas as pd

    rng = __import__("random").Random(5)
    rows = []
    for g in ("s1", "s2"):
        v = 0.0
        for t in range(60):
            v = 0.7 * v + rng.uniform(-1, 1)
            rows.append((g, t, round(v, 6)))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    from etl_spark_gradle_spark.operators.timeseries import acf

    got = {
        (r.g, r.lag): r
        for r in acf(df, "t", "v", [1, 2, 7], group_by=["g"]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "t", "v"])
    for g in ("s1", "s2"):
        s = pdf[pdf.g == g].sort_values("t")["v"].reset_index(drop=True)
        for k in (1, 2, 7):
            r = got[(g, k)]
            assert r.n_pairs == 60 - k
            assert abs(r.acf_val - s.autocorr(k)) < 1e-9, (g, k)
    # lag-1 of an AR(0.7) series is strongly positive
    assert got[("s1", 1)].acf_val > 0.3


def test_acf_edges_and_validation(spark):
    from etl_spark_gradle_spark.operators.timeseries import acf
    from etl_spark_gradle_spark.operators.relational import TransformationError

    # constant series -> zero variance -> NULL; short series -> NULL
    df = spark.createDataFrame(
        [("c", t, 5.0) for t in range(10)] + [("s", 0, 1.0)],
        "g string, t int, v double",
    )
    got = {(r.g, r.lag): r for r in
           acf(df, "t", "v", [1], group_by=["g"]).collect()}
    assert got[("c", 1)].acf_val is None and got[("c", 1)].n_pairs == 9
    assert got[("s", 1)].acf_val is None and got[("s", 1)].n_pairs == 0
    # null values drop out of pairs; null order rows are excluded
    dfn = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 3.0), (3, 4.0), (None, 9.0)],
        "t int, v double",
    )
    r1 = acf(dfn, "t", "v", [1]).collect()[0]
    assert r1.n_pairs == 1  # only (t=3, t=2) pair has both sides
    with pytest.raises(TransformationError):
        acf(dfn, "t", "v", [])
    with pytest.raises(TransformationError):
        acf(dfn, "t", "v", [0])
    with pytest.raises(TransformationError):
        acf(dfn, "t", "v", [1, 1])
    with pytest.raises(TransformationError):
        acf(dfn, "nope", "v", [1])
    with pytest.raises(TransformationError):
        acf(dfn, "t", "v", [1], resolution=12)


def test_acf_yaml_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame(
        [(t, float(t % 3)) for t in range(12)], "t int, v double"
    )
    t = TRANSFORMER_REGISTRY["acf"]
    cfg = TransformationConfig(
        type="acf",
        options={"orderColumn": "t", "valueColumn": "v", "lags": "1,3"},
    )
    assert t.validate(df, cfg).is_valid
    out = {r.lag: r for r in t.transform(df, cfg, None).collect()}
    assert out[3].acf_val == pytest.approx(1.0)  # period-3 series
    assert set(out) == {1, 3}
    bad = TransformationConfig(type="acf", options={"orderColumn": "t"})
    assert not t.validate(df, bad).is_valid
    assert "acf" in t.lineage_step(cfg)


class TestOhlcTwap:
    def test_ohlc_hand_computed(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            # bucket 0: open=10 (t=5), high=40, low=10, close=25 (t=50)
            ("A", base + dt.timedelta(seconds=5), 10.0, 1),
            ("A", base + dt.timedelta(seconds=20), 40.0, 2),
            ("A", base + dt.timedelta(seconds=50), 25.0, 3),
            # bucket 60: single obs
            ("A", base + dt.timedelta(seconds=65), 7.0, 4),
            # simultaneous obs: tiebreak decides open/close
            ("B", base, 1.0, 6),
            ("B", base, 2.0, 5),
            # null value dropped entirely
            ("B", base + dt.timedelta(seconds=10), None, 7),
        ]
        df = spark.createDataFrame(
            rows, "g string, ts timestamp, v double, eid long"
        )
        from etl_spark_gradle_spark.operators.timeseries import ohlc_bars

        got = {
            (r.g, r.bucket_ts): (r.open, r.high, r.low, r.close, r.n_obs,
                                 r.mean)
            for r in ohlc_bars(
                df, "ts", "v", 60, "eid", group_by=["g"]
            ).collect()
        }
        b0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
        assert got[("A", b0)] == (10.0, 40.0, 10.0, 25.0, 3, 25.0)
        assert got[("A", b0 + 60)] == (7.0, 7.0, 7.0, 7.0, 1, 7.0)
        # eid 5 sorts before eid 6 at the same timestamp
        assert got[("B", b0)] == (2.0, 2.0, 1.0, 1.0, 2, 1.5)

    def test_ohlc_partition_independence_and_validation(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("A", base + dt.timedelta(seconds=i * 7), float((i * 13) % 31), i)
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "g string, ts timestamp, v double, eid long"
        )
        from etl_spark_gradle_spark.operators.timeseries import ohlc_bars

        ref = sorted(
            tuple(r)
            for r in ohlc_bars(
                df.repartition(1), "ts", "v", 120, "eid", group_by=["g"]
            ).collect()
        )
        for parts in (3, 16):
            got = sorted(
                tuple(r)
                for r in ohlc_bars(
                    df.repartition(parts), "ts", "v", 120, "eid",
                    group_by=["g"],
                ).collect()
            )
            assert got == ref
        with pytest.raises(TransformationError, match="bucket_seconds"):
            ohlc_bars(df, "ts", "v", 0, "eid")

    def test_twap_hand_computed(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            # A: 10 for 10s, 20 for 20s -> (100+400)/30 = 16.666...
            ("A", base, 10.0),
            ("A", base + dt.timedelta(seconds=10), 20.0),
            ("A", base + dt.timedelta(seconds=30), 30.0),
            # B: single sample -> NULL twap
            ("B", base, 99.0),
            # C: null value skipped -> step function 5 for 8s
            ("C", base, 5.0),
            ("C", base + dt.timedelta(seconds=4), None),
            ("C", base + dt.timedelta(seconds=8), 6.0),
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
        from etl_spark_gradle_spark.operators.timeseries import twap

        got = {
            r.g: (r.n_obs, r.span_micros, r.twap)
            for r in twap(df, "ts", "v", group_by=["g"]).collect()
        }
        assert got["A"] == (3, 30_000_000, (10.0 * 10_000_000 + 20.0 * 20_000_000) / 30_000_000)
        assert got["B"] == (1, None, None)
        assert got["C"] == (2, 8_000_000, 5.0)
        # the row mean would be 20 for A; twap weights the long 20s span
        assert abs(got["A"][2] - 16.666666666666668) < 1e-12

    def test_twap_partition_independence(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("A", base + dt.timedelta(seconds=(i * 37) % 1000), float(i % 17))
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
        from etl_spark_gradle_spark.operators.timeseries import twap

        vals = set()
        for parts in (1, 5, 32):
            rows_out = twap(
                df.repartition(parts), "ts", "v", group_by=["g"],
            ).collect()
            vals.add(rows_out[0].twap)
        assert len(vals) == 1  # exact decimal accumulation -> bit-equal

    def test_ohlc_twap_yaml_adapters(self, spark):
        import datetime as dt

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.plans.config import (
            RunContext,
            TransformationConfig,
        )

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("A", base, 1.0, 1), ("A", base + dt.timedelta(seconds=5), 2.0, 2)],
            "g string, ts timestamp, v double, eid long",
        )
        ctx = RunContext(pipeline_id="t", run_id="r", spark=spark)
        out = TRANSFORMER_REGISTRY["ohlc"].transform(
            df,
            TransformationConfig(
                type="ohlc",
                options={"timeColumn": "ts", "valueColumn": "v",
                         "tiebreakColumn": "eid", "bucketSeconds": 60,
                         "groupBy": "g"},
            ),
            ctx,
        )
        assert set(out.columns) == {
            "g", "bucket_ts", "open", "high", "low", "close", "n_obs", "mean"
        }
        bad = TransformationConfig(type="ohlc", options={"timeColumn": "ts"})
        assert not TRANSFORMER_REGISTRY["ohlc"].validate(df, bad).is_valid
        out2 = TRANSFORMER_REGISTRY["twap"].transform(
            df,
            TransformationConfig(
                type="twap",
                options={"timeColumn": "ts", "valueColumn": "v",
                         "groupBy": "g"},
            ),
            ctx,
        )
        assert {r.g: r.twap for r in out2.collect()} == {"A": 1.0}


class TestLagFeatures:
    def test_hand_computed_lags_and_deltas(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("A", base + dt.timedelta(seconds=i), float(v), i)
            for i, v in enumerate([10, 20, 40, 80])
        ] + [("B", base, 7.0, 0)]
        df = spark.createDataFrame(
            rows, "g string, ts timestamp, v double, eid long"
        )
        from etl_spark_gradle_spark.operators.timeseries import lag_features

        out = {
            (r.g, r.eid): (r.v_lag1, r.v_lag2, r.v_delta1, r.v_delta2)
            for r in lag_features(
                df, ["g"], "ts", "v", lags=[1, 2],
                tiebreak=["eid"], deltas=True,
            ).collect()
        }
        assert out[("A", 0)] == (None, None, None, None)
        assert out[("A", 1)] == (10.0, None, 10.0, None)
        assert out[("A", 2)] == (20.0, 10.0, 20.0, 30.0)
        assert out[("A", 3)] == (40.0, 20.0, 40.0, 60.0)
        # no cross-series leak: B's only row has no history
        assert out[("B", 0)] == (None, None, None, None)
        # row count preserved
        assert len(out) == 5

    def test_validation_and_adapter(self, spark):
        import datetime as dt

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.timeseries import lag_features
        from etl_spark_gradle_spark.plans.config import (
            RunContext,
            TransformationConfig,
        )

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("A", base, 1.0), ("A", base + dt.timedelta(seconds=1), 2.0)],
            "g string, ts timestamp, v double",
        )
        with pytest.raises(TransformationError, match="series_by"):
            lag_features(df, [], "ts", "v", [1])
        with pytest.raises(TransformationError, match="unique"):
            lag_features(df, ["g"], "ts", "v", [1, 1])
        with pytest.raises(TransformationError, match=">= 1"):
            lag_features(df, ["g"], "ts", "v", [0])
        clash = df.withColumn("v_lag1", df.v)
        with pytest.raises(TransformationError, match="already in schema"):
            lag_features(clash, ["g"], "ts", "v", [1])
        out = TRANSFORMER_REGISTRY["lag_features"].transform(
            df,
            TransformationConfig(
                type="lag_features",
                options={"seriesBy": "g", "timeColumn": "ts",
                         "valueColumn": "v", "lags": "1,3"},
            ),
            RunContext(pipeline_id="t", run_id="r", spark=spark),
        )
        assert {"v_lag1", "v_lag3"} <= set(out.columns)
        assert not TRANSFORMER_REGISTRY["lag_features"].validate(
            df, TransformationConfig(type="lag_features", options={})
        ).is_valid


class TestRollingZscore:
    def test_hand_computed_trailing_baseline(self, spark):
        import datetime as dt
        import math

        base = dt.datetime(2024, 1, 1)
        vals = [10.0, 12.0, 11.0, 50.0, 11.0]
        rows = [
            ("A", base + dt.timedelta(seconds=i), v, i)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "g string, ts timestamp, v double, eid long"
        )
        from etl_spark_gradle_spark.operators.timeseries import rolling_zscore

        got = {
            r.eid: r.v_rzscore
            for r in rolling_zscore(
                df, ["g"], "ts", "v", window_rows=3, tiebreak=["eid"]
            ).collect()
        }
        # rows 0 and 1 lack min_obs=2 baseline points
        assert got[0] is None and got[1] is None

        def ref(x, window):
            n = len(window)
            m = sum(window) / n
            var = (sum(w * w for w in window) / n - m * m) * (n / (n - 1))
            return (x - m) / math.sqrt(var)

        assert abs(got[2] - ref(11.0, [10.0, 12.0])) < 1e-9
        # the spike scores against [10,12,11] — and does NOT dilute
        # itself (excluded from its own baseline)
        assert abs(got[3] - ref(50.0, [10.0, 12.0, 11.0])) < 1e-9
        assert got[3] > 30
        # after the spike the baseline contains it -> negative score
        assert abs(got[4] - ref(11.0, [12.0, 11.0, 50.0])) < 1e-9

    def test_zero_variance_nulls_and_include_current(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("A", base + dt.timedelta(seconds=i), v, i)
            for i, v in enumerate([5.0, 6.0, 5.0, None, 7.0])
        ]
        df = spark.createDataFrame(
            rows, "g string, ts timestamp, v double, eid long"
        )
        from etl_spark_gradle_spark.operators.timeseries import rolling_zscore

        got = {
            r.eid: r.v_rzscore
            for r in rolling_zscore(
                df, ["g"], "ts", "v", window_rows=3, tiebreak=["eid"]
            ).collect()
        }
        assert got[3] is None        # NULL value -> NULL score
        # the NULL row never enters row 4's window: baseline is
        # [6.0, 5.0] (rows 1-2), variance > 0 -> a real score
        assert got[4] is not None
        # zero-variance baseline -> NULL sentinel, never +/-Inf
        const = spark.createDataFrame(
            [("A", base + dt.timedelta(seconds=i), v, i)
             for i, v in enumerate([5.0, 5.0, 5.0, 9.0])],
            "g string, ts timestamp, v double, eid long",
        )
        gz = {
            r.eid: r.v_rzscore
            for r in rolling_zscore(
                const, ["g"], "ts", "v", window_rows=3, tiebreak=["eid"]
            ).collect()
        }
        assert gz[3] is None
        inc = {
            r.eid: r.v_rzscore
            for r in rolling_zscore(
                df, ["g"], "ts", "v", window_rows=3, tiebreak=["eid"],
                include_current=True,
            ).collect()
        }
        # with the current row in its own window the spike self-dilutes
        assert inc[4] < got[4]
        with pytest.raises(TransformationError, match="window_rows"):
            rolling_zscore(df, ["g"], "ts", "v", 0, tiebreak=["eid"])
        with pytest.raises(TransformationError, match="min_obs"):
            rolling_zscore(df, ["g"], "ts", "v", 3, min_obs=1)

    def test_partition_independence_and_adapter(self, spark):
        import datetime as dt

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.timeseries import rolling_zscore
        from etl_spark_gradle_spark.plans.config import (
            RunContext,
            TransformationConfig,
        )

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("u%d" % (i % 5), base + dt.timedelta(seconds=i),
             float((i * 17) % 29), i)
            for i in range(400)
        ]
        df = spark.createDataFrame(
            rows, "g string, ts timestamp, v double, eid long"
        )
        ref = None
        for parts in (1, 16):
            got = sorted(
                (r.eid, r.v_rzscore)
                for r in rolling_zscore(
                    df.repartition(parts), ["g"], "ts", "v", 10,
                    tiebreak=["eid"],
                ).collect()
            )
            if ref is None:
                ref = got
            else:
                assert got == ref  # bit-equal: decimal window sums
        out = TRANSFORMER_REGISTRY["rolling_zscore"].transform(
            df,
            TransformationConfig(
                type="rolling_zscore",
                options={"partitionBy": "g", "timeColumn": "ts",
                         "valueColumn": "v", "windowRows": 10,
                         "tiebreak": "eid"},
            ),
            RunContext(pipeline_id="t", run_id="r", spark=spark),
        )
        assert "v_rzscore" in out.columns and out.count() == 400
        assert not TRANSFORMER_REGISTRY["rolling_zscore"].validate(
            df, TransformationConfig(type="rolling_zscore", options={})
        ).is_valid
