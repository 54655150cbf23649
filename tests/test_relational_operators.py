"""Unit tests for relational operators, mirroring the reference's
expected-value style (SURVEY §5 layer 2; exact fixtures from FIXTURES.md §7)."""

from __future__ import annotations

import datetime

import pytest

from etl_spark_gradle_spark.operators.relational import (
    TransformationError,
    aggregate,
    filter_rows,
    join_view,
    map_columns,
    parse_map_expressions,
    rank_rows,
    window_aggregate,
)
from etl_spark_gradle_spark.plans.config import AggregateExpr


@pytest.fixture()
def sales(spark):
    # AggregationTransformerSpec.scala:40-77 fixture: 4 rows -> 3 groups
    return spark.createDataFrame(
        [
            ("2025-01-01", "product1", 100.0),
            ("2025-01-01", "product1", 150.0),
            ("2025-01-01", "product2", 200.0),
            ("2025-01-02", "product1", 120.0),
        ],
        ["date", "product", "amount"],
    )


class TestAggregation:
    def test_three_groups_with_expected_values(self, sales):
        out = aggregate(
            sales,
            ["date", "product"],
            [
                AggregateExpr("amount", "sum", "total_amount"),
                AggregateExpr("amount", "avg", "avg_amount"),
                AggregateExpr("*", "count", "cnt"),
            ],
        )
        rows = {(r["date"], r["product"]): r for r in out.collect()}
        assert len(rows) == 3
        target = rows[("2025-01-01", "product1")]
        assert target["total_amount"] == 250.0
        assert target["avg_amount"] == 125.0
        assert target["cnt"] == 2

    def test_global_aggregation(self, sales):
        out = aggregate(sales, [], [AggregateExpr("amount", "sum", "s")])
        assert out.collect()[0]["s"] == 570.0

    def test_collect_set(self, sales):
        out = aggregate(sales, ["date"], [AggregateExpr("product", "collect_set", "products")])
        by_date = {r["date"]: sorted(r["products"]) for r in out.collect()}
        assert by_date["2025-01-01"] == ["product1", "product2"]

    def test_unknown_function_rejected(self, sales):
        with pytest.raises(TransformationError):
            aggregate(sales, ["date"], [AggregateExpr("amount", "frobnicate", "x")]).collect()


class TestFilter:
    def test_complex_predicate(self, spark):
        # FilterTransformerSpec.scala:37-100 style
        df = spark.createDataFrame(
            [("alice", 34, "active"), ("bob", 28, "active"), ("carol", 40, "inactive")],
            ["username", "age", "status"],
        )
        out = filter_rows(df, "age > 30 AND status = 'active'")
        assert [r["username"] for r in out.collect()] == ["alice"]

    def test_empty_condition_rejected(self, spark):
        df = spark.range(1)
        with pytest.raises(TransformationError):
            filter_rows(df, "  ")


class TestMap:
    def test_concat_cast_arithmetic(self, spark):
        # MapTransformerSpec.scala:37-100 style
        df = spark.createDataFrame(
            [("Jane", "Doe", "4200.5")], ["first_name", "last_name", "salary"]
        )
        out = map_columns(
            df,
            [
                ("full_name", "concat(first_name, ' ', last_name)"),
                ("salary_int", "CAST(salary AS INT)"),
                ("double_salary", "salary_int * 2"),  # later exprs see earlier aliases
            ],
        )
        row = out.collect()[0]
        assert row["full_name"] == "Jane Doe"
        assert row["salary_int"] == 4200
        assert row["double_salary"] == 8400

    def test_parse_expressions_respects_nested_commas(self):
        pairs = parse_map_expressions(
            "full_name:concat(first_name, ', ', last_name),age_int:CAST(age AS INT)"
        )
        assert pairs == [
            ("full_name", "concat(first_name, ', ', last_name)"),
            ("age_int", "CAST(age AS INT)"),
        ]

    def test_malformed_rejected(self):
        with pytest.raises(TransformationError):
            parse_map_expressions("no_colon_here")


class TestJoin:
    @pytest.fixture()
    def sides(self, spark):
        # JoinTransformerSpec.scala:41-52 fixture: keys {1,2,3} x {1,2,4}
        left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "name"])
        right = spark.createDataFrame(
            [(1, "a@x.com"), (2, "b@x.com"), (4, "d@x.com")], ["id", "email"]
        )
        right.createOrReplaceTempView("emails")
        return left

    def test_join_type_cardinalities(self, spark, sides):
        # inner=2, left=3, right=3, full=4 (JoinTransformerSpec.scala:39-110)
        expected = {"inner": 2, "left": 3, "right": 3, "full": 4}
        for jt, n in expected.items():
            out = join_view(sides, spark, "emails", "id", "id", jt)
            assert out.count() == n, jt

    def test_column_dedup_keeps_left(self, spark, sides):
        out = join_view(sides, spark, "emails", "id", "id", "inner")
        assert out.columns == ["id", "name", "email"]  # right 'id' dropped

    def test_select_columns_projection(self, spark, sides):
        out = join_view(sides, spark, "emails", "id", "id", "inner", select_columns=["name", "email"])
        assert out.columns == ["name", "email"]

    def test_bad_join_type(self, spark, sides):
        with pytest.raises(TransformationError):
            join_view(sides, spark, "emails", "id", "id", "cross")


class TestWindowing:
    @pytest.fixture()
    def events(self, spark):
        # WindowingTransformerSpec.scala:42-76 fixture: 10:00/10:05/10:15/10:20
        ts = datetime.datetime
        return spark.createDataFrame(
            [
                (ts(2025, 1, 1, 10, 0), "metric_a", 1),
                (ts(2025, 1, 1, 10, 5), "metric_a", 2),
                (ts(2025, 1, 1, 10, 15), "metric_a", 3),
                (ts(2025, 1, 1, 10, 20), "metric_b", 4),
            ],
            ["timestamp", "event", "value"],
        )

    def test_tumbling_two_windows_for_metric_a(self, events):
        out = window_aggregate(
            events,
            "timestamp",
            "10 minutes",
            [AggregateExpr("value", "sum", "total")],
            group_by=["event"],
        )
        rows = out.collect()
        a_windows = [r for r in rows if r["event"] == "metric_a"]
        assert len(a_windows) == 2  # QuickstartScenario2Spec.scala:263-296 semantics
        totals = {r["window"]["start"].minute: r["total"] for r in a_windows}
        assert totals == {0: 3, 10: 3}

    def test_sliding_requires_slide(self, events):
        with pytest.raises(TransformationError):
            window_aggregate(
                events, "timestamp", "10 minutes", [AggregateExpr("value", "sum", "s")],
                window_type="sliding",
            )

    def test_session_window(self, events):
        out = window_aggregate(
            events,
            "timestamp",
            "6 minutes",
            [AggregateExpr("value", "count", "n")],
            window_type="session",
        )
        # 10:00+10:05 chain into one session; 10:15+10:20 into another
        assert sorted(r["n"] for r in out.collect()) == [2, 2]


class TestRanking:
    def test_top_k_per_partition(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 5), ("a", 3), ("b", 9), ("b", 2)], ["k", "v"]
        )
        out = rank_rows(df, ["k"], ["v DESC"], top_k=2)
        got = {(r["k"], r["v"]): r["rank"] for r in out.collect()}
        assert got == {("a", 5): 1, ("a", 3): 2, ("b", 9): 1, ("b", 2): 2}
