"""Funnel / cohort behavioral analytics (operators/events.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators import events as ev
from etl_spark_gradle_spark.operators.relational import TransformationError


@pytest.fixture(scope="module")
def clickstream(spark):
    rows = [
        # u1: full ordered funnel
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # u2: purchase BEFORE click -> stops at click... order matters
        (2, "view", "2024-01-01 10:00:00"),
        (2, "purchase", "2024-01-01 10:01:00"),
        (2, "click", "2024-01-01 10:02:00"),
        # u3: view only
        (3, "view", "2024-01-01 10:00:00"),
        # u4: click without view -> never enters
        (4, "click", "2024-01-01 10:00:00"),
        # u5: full funnel but too slow for a 1h window
        (5, "view", "2024-01-01 10:00:00"),
        (5, "click", "2024-01-01 10:30:00"),
        (5, "purchase", "2024-01-01 12:00:00"),
    ]
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"]).select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )


def test_funnel_order_and_window(spark, clickstream):
    steps = ["view", "click", "purchase"]
    free = {r.step: r.users for r in
            ev.funnel_counts(clickstream, "user_id", "event_type", "ts", steps).collect()}
    # u2's purchase precedes its click -> not an ordered conversion
    assert free == {"view": 4, "click": 3, "purchase": 2}

    bounded = {r.step: r.users for r in
               ev.funnel_counts(clickstream, "user_id", "event_type", "ts",
                                steps, within_seconds=3600).collect()}
    # u5's purchase lands at +2h -> outside the 1h window
    assert bounded == {"view": 4, "click": 3, "purchase": 1}


def test_funnel_steps_timestamps(spark, clickstream):
    reach = {r.user_id: r for r in
             ev.funnel_steps(clickstream, "user_id", "event_type", "ts",
                             ["view", "click", "purchase"]).collect()}
    assert str(reach[1].t3) == "2024-01-01 10:10:00"
    assert reach[2].t2 is not None and reach[2].t3 is None
    assert reach[3].t2 is None
    assert 4 not in reach
    with pytest.raises(TransformationError, match="at least 2"):
        ev.funnel_steps(clickstream, "user_id", "event_type", "ts", ["view"])


def test_cohort_retention_grid(spark):
    rows = [
        (1, "2024-01-01 08:00:00"),  # cohort 0
        (1, "2024-01-09 08:00:00"),  # active period 1
        (2, "2024-01-02 08:00:00"),  # cohort 0, never returns
        (3, "2024-01-10 08:00:00"),  # cohort 1
        (3, "2024-01-24 08:00:00"),  # active period 3 -> offset 2
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    grid = {(r.cohort_period, r.period_offset): r.users
            for r in ev.cohort_retention(df, "user_id", "ts").collect()}
    assert grid == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}
    with pytest.raises(TransformationError, match="period_days"):
        ev.cohort_retention(df, "user_id", "ts", period_days=0)


def test_transition_matrix(spark):
    rows = [
        (1, "a", "2024-01-01 10:00:00", 1),
        (1, "b", "2024-01-01 10:01:00", 2),
        (1, "a", "2024-01-01 10:02:00", 3),
        (2, "a", "2024-01-01 10:00:00", 4),
        (2, "b", "2024-01-01 10:01:00", 5),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "eid"]).select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"), "eid"
    )
    got = {(r.from_type, r.to_type): (r.transitions, round(r.probability, 6))
           for r in ev.transition_matrix(df, "user_id", "event_type", "ts",
                                         tiebreak_col="eid").collect()}
    # a->b twice (u1, u2), b->a once (u1); P(a->b)=1.0, P(b->a)=1.0
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}
    with pytest.raises(TransformationError, match="not in input schema"):
        ev.transition_matrix(df, "user_id", "nope", "ts")


def test_event_yaml_adapters(spark, clickstream):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    ctx = RunContext.create("t", spark)
    fun = TRANSFORMER_REGISTRY["funnel"]
    cfg = TransformationConfig(
        type="funnel",
        options={
            "userColumn": "user_id", "typeColumn": "event_type",
            "timeColumn": "ts", "steps": "view,click,purchase",
            "withinSeconds": "3600",
        },
    )
    got = {r.step: r.users for r in fun.transform(clickstream, cfg, ctx).collect()}
    assert got == {"view": 4, "click": 3, "purchase": 1}
    assert not fun.validate(
        clickstream, TransformationConfig(type="funnel", options={"steps": "a"})
    ).is_valid

    coh = TRANSFORMER_REGISTRY["cohort"]
    out = coh.transform(
        clickstream,
        TransformationConfig(
            type="cohort", options={"userColumn": "user_id", "timeColumn": "ts"}
        ),
        ctx,
    )
    assert out.count() >= 1

    tr = TRANSFORMER_REGISTRY["transitions"]
    out = tr.transform(
        clickstream,
        TransformationConfig(
            type="transitions",
            options={"userColumn": "user_id", "typeColumn": "event_type",
                     "timeColumn": "ts"},
        ),
        ctx,
    )
    assert out.count() >= 1


def test_market_basket_pairs(spark):
    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"),
        (4, "lonely"),
        (5, "x"), (5, "x"),  # duplicate item in one basket counts once
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {(r.item_a, r.item_b): r.baskets
           for r in ev.market_basket_pairs(df, "basket", "item").collect()}
    assert got == {("x", "y"): 3, ("x", "z"): 1, ("y", "z"): 1}
    sup = {(r.item_a, r.item_b): r.baskets
           for r in ev.market_basket_pairs(df, "basket", "item",
                                           min_support=2).collect()}
    assert sup == {("x", "y"): 3}
    top = ev.market_basket_pairs(df, "basket", "item", top_k=1).collect()
    assert [(top[0].item_a, top[0].item_b)] == [("x", "y")]
    with pytest.raises(TransformationError, match="min_support"):
        ev.market_basket_pairs(df, "basket", "item", min_support=0)


def test_market_basket_yaml_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y")], ["basket", "item"]
    )
    t = TRANSFORMER_REGISTRY["market_basket"]
    out = t.transform(
        df,
        TransformationConfig(
            type="market_basket",
            options={"basketColumn": "basket", "itemColumn": "item"},
        ),
        RunContext.create("t", spark),
    )
    assert [(r.item_a, r.item_b, r.baskets) for r in out.collect()] == [("x", "y", 2)]
    assert not t.validate(
        df, TransformationConfig(type="market_basket", options={})
    ).is_valid


class TestTopPaths:
    def test_hand_computed_paths(self, spark):
        from etl_spark_gradle_spark.operators.events import top_paths

        rows = [
            # u1: a > b > c   u2: a > b > c   u3: b > a
            ("u1", "a", 1, 10), ("u1", "b", 2, 11), ("u1", "c", 3, 12),
            ("u2", "a", 1, 20), ("u2", "b", 2, 21), ("u2", "c", 3, 22),
            ("u3", "b", 1, 30), ("u3", "a", 2, 31),
        ]
        df = spark.createDataFrame(rows, "u string, t string, ts long, eid long")
        out = top_paths(df, "u", "t", "ts", "eid", max_steps=5, k=10).collect()
        assert [(r.path, r.n_users) for r in out] == [("a>b>c", 2), ("b>a", 1)]
        assert abs(out[0].share - 2 / 3) < 1e-15

    def test_max_steps_truncates_and_tiebreak_orders(self, spark):
        from etl_spark_gradle_spark.operators.events import top_paths

        rows = [  # same ts: event id must break the tie -> x before y
            ("u", "x", 5, 1), ("u", "y", 5, 2), ("u", "z", 6, 3),
        ]
        df = spark.createDataFrame(rows, "u string, t string, ts long, eid long")
        out = top_paths(df, "u", "t", "ts", "eid", max_steps=2, k=5).collect()
        assert [(r.path, r.n_users) for r in out] == [("x>y", 1)]

    def test_null_type_and_time_excluded(self, spark):
        from etl_spark_gradle_spark.operators.events import top_paths

        rows = [("u", None, 1, 1), ("u", "a", None, 2), ("u", "b", 3, 3)]
        df = spark.createDataFrame(rows, "u string, t string, ts long, eid long")
        out = top_paths(df, "u", "t", "ts", "eid").collect()
        assert [(r.path, r.n_users) for r in out] == [("b", 1)]

    def test_deterministic_top_k_ties(self, spark):
        from etl_spark_gradle_spark.operators.events import top_paths

        rows = [("u1", "a", 1, 1), ("u2", "b", 1, 2), ("u3", "c", 1, 3)]
        df = spark.createDataFrame(rows, "u string, t string, ts long, eid long")
        out = top_paths(df, "u", "t", "ts", "eid", k=2).collect()
        # all counts tie at 1: path asc decides -> a, b
        assert [r.path for r in out] == ["a", "b"]

    def test_validation_and_adapter(self, spark):
        import pytest as _pytest

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.events import top_paths
        from etl_spark_gradle_spark.operators.relational import TransformationError
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

        df = spark.createDataFrame([("u", "a", 1, 1)], "u string, t string, ts long, eid long")
        with _pytest.raises(TransformationError, match="max_steps"):
            top_paths(df, "u", "t", "ts", "eid", max_steps=0)
        with _pytest.raises(TransformationError, match="not in input schema"):
            top_paths(df, "u", "t", "ts", "nope")
        assert "top_paths" in TRANSFORMER_REGISTRY
        cfg = TransformationConfig(
            type="top_paths",
            options={"userColumn": "u", "typeColumn": "t",
                     "timeColumn": "ts", "tiebreakColumn": "eid", "k": "3"},
        )
        out = TRANSFORMER_REGISTRY["top_paths"].transform(
            df, cfg, RunContext.create("t-paths", spark)
        )
        assert out.columns == ["path", "n_users", "share"]
        bad = TransformationConfig(type="top_paths", options={})
        assert not TRANSFORMER_REGISTRY["top_paths"].validate(df, bad).is_valid


class TestRollingActive:
    def test_hand_computed_window(self, spark):
        from pyspark.sql import functions as F

        from etl_spark_gradle_spark.operators.events import rolling_active

        rows = [
            ("u1", "1970-01-01 05:00:00"), ("u2", "1970-01-01 23:00:00"),
            ("u1", "1970-01-02 01:00:00"), ("u3", "1970-01-04 12:00:00"),
            (None, "1970-01-01 00:00:00"), ("u9", None),
        ]
        df = spark.createDataFrame(rows, "u string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = {r.day // 86400: r.active_users for r in
               rolling_active(df, "u", "ts", window_days=2).collect()}
        # trailing-2: d0 {u1,u2}; d1 {u1,u2}; d2 {u1}; d3 {u3}
        assert out == {0: 2, 1: 2, 2: 1, 3: 1}

    def test_window_one_is_plain_dau_and_gaps_zero_filled(self, spark):
        from pyspark.sql import functions as F

        from etl_spark_gradle_spark.operators.events import rolling_active

        rows = [("a", "1970-01-01 01:00:00"), ("b", "1970-01-05 01:00:00")]
        df = spark.createDataFrame(rows, "u string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = {r.day // 86400: r.active_users for r in
               rolling_active(df, "u", "ts", window_days=1).collect()}
        assert out == {0: 1, 1: 0, 2: 0, 3: 0, 4: 1}

    def test_matches_bruteforce_on_events(self, spark, sf_dir):
        from tests.conftest import load_table
        from etl_spark_gradle_spark.operators.events import rolling_active

        from pyspark.sql import functions as F

        ev = load_table(spark, "events", sf_dir)
        if dict(ev.dtypes)["ts"] == "bigint":  # nanos-shipped testdata
            ev = ev.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        got = {r.day: r.active_users for r in
               rolling_active(ev, "user_id", "ts", window_days=3).collect()}
        pdf = ev.select("user_id", "ts").toPandas().dropna()
        pdf["d"] = (pdf["ts"].astype("int64") // 1_000_000_000 // 86400).astype("int64")
        days = range(int(pdf["d"].min()), int(pdf["d"].max()) + 1)
        want = {
            d * 86400: pdf[(pdf["d"] >= d - 2) & (pdf["d"] <= d)]["user_id"].nunique()
            for d in days
        }
        assert got == {k: int(v) for k, v in want.items()}

    def test_validation_and_adapter(self, spark):
        import pytest as _pytest

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.events import rolling_active
        from etl_spark_gradle_spark.operators.relational import TransformationError
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("u", "1970-01-01 00:00:00")], "u string, ts string")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        with _pytest.raises(TransformationError, match="window_days"):
            rolling_active(df, "u", "ts", window_days=0)
        with _pytest.raises(TransformationError, match="not in input schema"):
            rolling_active(df, "nope", "ts")
        assert "rolling_active" in TRANSFORMER_REGISTRY
        cfg = TransformationConfig(
            type="rolling_active",
            options={"userColumn": "u", "timeColumn": "ts", "windowDays": "7"},
        )
        out = TRANSFORMER_REGISTRY["rolling_active"].transform(
            df, cfg, RunContext.create("t-ra", spark)
        )
        assert out.columns == ["day", "active_users"]
        bad = TransformationConfig(type="rolling_active", options={"windowDays": "x"})
        assert not TRANSFORMER_REGISTRY["rolling_active"].validate(df, bad).is_valid


def test_top_paths_separator_in_type_does_not_collide(spark):
    """['a>b'] and ['a','b'] must stay distinct paths: the separator
    inside a type is escaped, keeping the path string a total function
    of the journey (review finding)."""
    from etl_spark_gradle_spark.operators.events import top_paths

    rows = [
        ("u1", "a>b", 1, 1),           # one-step journey of type 'a>b'
        ("u2", "a", 1, 2), ("u2", "b", 2, 3),  # two-step journey a, b
    ]
    df = spark.createDataFrame(rows, "u string, t string, ts long, eid long")
    out = sorted((r.path, r.n_users) for r in top_paths(df, "u", "t", "ts", "eid").collect())
    assert out == [("a>b", 1), ("a\\>b", 1)]


def test_association_rules_metrics(spark):
    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"),
        (4, "lonely"),  # single-item basket: counts in totals, no pairs
        (5, "x"), (5, "x"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.antecedent, r.consequent): r
        for r in ev.association_rules(df, "basket", "item").collect()
    }
    # 5 baskets total; x in {1,2,3,5} = 4, y in 3, z in 1, lonely in 1
    assert set(got) == {
        ("x", "y"), ("y", "x"), ("x", "z"), ("z", "x"), ("y", "z"), ("z", "y")
    }
    xy = got[("x", "y")]
    assert (xy.pair_baskets, xy.antecedent_baskets,
            xy.consequent_baskets, xy.n_baskets) == (3, 4, 3, 5)
    assert xy.support == 3.0 / 5.0
    assert xy.confidence == 3.0 / 4.0
    assert xy.lift == (3.0 / 4.0) / (3.0 / 5.0)
    yx = got[("y", "x")]
    assert yx.confidence == 3.0 / 3.0  # every y-basket also holds x
    assert yx.lift == (3.0 / 3.0) / (4.0 / 5.0)
    zy = got[("z", "y")]
    assert zy.support == 1.0 / 5.0 and zy.confidence == 1.0
    # min_support prunes pairs before the rule closure
    pruned = {
        (r.antecedent, r.consequent)
        for r in ev.association_rules(
            df, "basket", "item", min_support=2
        ).collect()
    }
    assert pruned == {("x", "y"), ("y", "x")}
    # top_k keeps the highest-lift rules deterministically
    top = ev.association_rules(df, "basket", "item", top_k=2).collect()
    assert len(top) == 2
    assert all(r.lift >= 1.0 for r in top)


def test_association_rules_yaml_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import (
        RunContext,
        TransformationConfig,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a")],
        ["basket", "item"],
    )
    cfg = TransformationConfig(
        type="market_basket",
        options={
            "basketColumn": "basket",
            "itemColumn": "item",
            "rules": True,
        },
    )
    out = TRANSFORMER_REGISTRY["market_basket"].transform(
        df, cfg, RunContext(pipeline_id="t", run_id="r", spark=spark)
    )
    rows = {(r.antecedent, r.consequent): r for r in out.collect()}
    assert rows[("b", "a")].confidence == 1.0
    assert set(out.columns) == {
        "antecedent", "consequent", "pair_baskets", "antecedent_baskets",
        "consequent_baskets", "n_baskets", "support", "confidence", "lift",
    }


def _sess_df(spark):
    rows = [
        # user A: events at 0, 10, 25, 100, 130 with gap 20 ->
        # sessions {0,10,25?}: 25-10=15 <= 20 stays; 100-25=75 > 20 new;
        # 130-100=30 > 20 new  => sessions [0,10,25], [100], [130]
        ("A", 0, 1), ("A", 10, 2), ("A", 25, 3),
        ("A", 100, 4), ("A", 130, 5),
        # user B: boundary case — gap EXACTLY 20 stays in session
        ("B", 0, 6), ("B", 20, 7), ("B", 41, 8),
        # dropped rows
        (None, 5, 9), ("C", None, 10),
    ]
    return spark.createDataFrame(rows, "u string, t long, eid long")


def test_sessionize_events_and_sessions(spark):
    out = {
        (r.u, r.eid): (r.session_seq, r.event_seq)
        for r in ev.sessionize(
            _sess_df(spark), "u", "t", gap_seconds=20, tiebreak_col="eid"
        ).collect()
    }
    assert out == {
        ("A", 1): (1, 1), ("A", 2): (1, 2), ("A", 3): (1, 3),
        ("A", 4): (2, 1), ("A", 5): (3, 1),
        ("B", 6): (1, 1), ("B", 7): (1, 2), ("B", 8): (2, 1),
    }
    sess = {
        (r.u, r.session_seq): (r.n_events, r.start_units, r.end_units,
                               r.duration)
        for r in ev.sessionize(
            _sess_df(spark), "u", "t", gap_seconds=20,
            tiebreak_col="eid", output="sessions",
        ).collect()
    }
    assert sess[("A", 1)] == (3, 0, 25, 25.0)
    assert sess[("A", 2)] == (1, 100, 100, 0.0)
    assert sess[("B", 1)] == (2, 0, 20, 20.0)
    assert sess[("B", 2)] == (1, 41, 41, 0.0)


def test_sessionize_timestamp_units_and_partition_independence(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("A", base, 1),
        ("A", base + dt.timedelta(seconds=1800), 2),   # exactly gap: stays
        ("A", base + dt.timedelta(seconds=3601), 3),   # 1801s after #2: new
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, eid long")
    for parts in (1, 7):
        got = {
            r.eid: r.session_seq
            for r in ev.sessionize(
                df.repartition(parts), "u", "ts", 1800, "eid"
            ).collect()
        }
        assert got == {1: 1, 2: 1, 3: 2}
    sess = ev.sessionize(
        df, "u", "ts", 1800, "eid", output="sessions"
    ).collect()
    d = {r.session_seq: r.duration_seconds for r in sess}
    assert d == {1: 1800.0, 2: 0.0}
    with pytest.raises(TransformationError, match="gap_seconds"):
        ev.sessionize(df, "u", "ts", 0, "eid")
    with pytest.raises(TransformationError, match="output"):
        ev.sessionize(df, "u", "ts", 10, "eid", output="bogus")


def test_debounce_keeps_first_of_burst(spark):
    rows = [
        # chattering burst: fires every 5s for 30s — only the first
        # survives even though the burst outlasts the 10s gap in total
        ("A", "click", 0, 1), ("A", "click", 5, 2), ("A", "click", 10, 3),
        ("A", "click", 15, 4), ("A", "click", 24, 5),
        ("A", "click", 50, 6),          # 20s after the last raw -> kept
        ("A", "view", 1, 7),            # independent key
        ("B", "click", 2, 8),
        ("B", "click", 13, 9),          # 11 > 10 -> kept
        ("B", None, 3, 10),             # null key dropped
    ]
    df = spark.createDataFrame(rows, "u string, et string, t long, eid long")
    kept = sorted(
        r.eid
        for r in ev.debounce(
            df, ["u", "et"], "t", gap_seconds=10, tiebreak_col="eid"
        ).collect()
    )
    assert kept == [1, 6, 7, 8, 9]
    with pytest.raises(TransformationError, match="not in input schema"):
        ev.debounce(df, ["missing"], "t", 10, "eid")


def test_sessionize_debounce_yaml_adapters(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import (
        RunContext,
        TransformationConfig,
    )

    df = _sess_df(spark)
    ctx = RunContext(pipeline_id="t", run_id="r", spark=spark)
    s_cfg = TransformationConfig(
        type="sessionize",
        options={"userColumn": "u", "timeColumn": "t",
                 "tiebreakColumn": "eid", "gapSeconds": 20,
                 "output": "sessions"},
    )
    out = TRANSFORMER_REGISTRY["sessionize"].transform(df, s_cfg, ctx)
    assert set(out.columns) == {
        "u", "session_seq", "n_events", "start_units", "end_units",
        "duration",
    }
    bad = TransformationConfig(type="sessionize", options={"userColumn": "u"})
    assert not TRANSFORMER_REGISTRY["sessionize"].validate(df, bad).is_valid
    d_cfg = TransformationConfig(
        type="debounce",
        options={"keyColumns": "u", "timeColumn": "t",
                 "tiebreakColumn": "eid", "gapSeconds": 15},
    )
    kept = TRANSFORMER_REGISTRY["debounce"].transform(df, d_cfg, ctx)
    assert kept.count() >= 1
