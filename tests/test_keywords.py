"""Keyword tagging: automaton correctness (nested/overlapping
patterns), expr↔automaton engine parity, null/case handling, and the
YAML transformer contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.keywords import (
    AhoCorasick,
    KeywordTagTransformer,
    keyword_matches,
)
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig
from tests.conftest import load_table


class TestAhoCorasick:
    def test_nested_and_overlapping_patterns_all_reported(self):
        ac = AhoCorasick(["a", "ab", "b", "bc", "abc"])
        assert ac.find_set("abc") == {"a", "ab", "b", "bc", "abc"}

    def test_dict_suffix_links(self):
        # 'hers' ends with 'ers'? no — but 'she' contains 'he' via
        # suffix: the textbook case one-pass regex alternation misses
        ac = AhoCorasick(["he", "she", "his", "hers"])
        assert ac.find_set("ushers") == {"she", "he", "hers"}

    def test_no_match(self):
        assert AhoCorasick(["xyz"]).find_set("abcabc") == set()

    def test_repeated_occurrences_reported_once(self):
        assert AhoCorasick(["ab"]).find_set("ababab") == {"ab"}


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents")


PHRASES = ["the", "data", "model", "no-such-phrase-zz", "of the"]


class TestKeywordMatches:
    def test_engine_parity(self, docs):
        a = keyword_matches(docs, "text", PHRASES, id_cols=["doc_id"], engine="expr")
        b = keyword_matches(
            docs, "text", PHRASES, id_cols=["doc_id"], engine="automaton"
        )
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_matches_are_true_substrings(self, spark, docs):
        out = keyword_matches(docs, "text", PHRASES, id_cols=["doc_id"])
        joined = out.join(docs.select("doc_id", "text"), "doc_id")
        bad = joined.where(~F.col("text").contains(F.col("keyword"))).count()
        assert bad == 0

    def test_nonmatching_docs_absent(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world"), (2, "nothing here"), (3, None)],
            "id long, body string",
        )
        out = keyword_matches(df, "body", ["world", "zebra"], id_cols=["id"])
        assert [(r.id, r.keyword) for r in out.collect()] == [(1, "world")]

    def test_null_text_both_engines(self, spark):
        df = spark.createDataFrame([(1, None), (2, "ab")], "id long, body string")
        for eng in ("expr", "automaton"):
            out = keyword_matches(df, "body", ["ab"], id_cols=["id"], engine=eng)
            assert [(r.id, r.keyword) for r in out.collect()] == [(2, "ab")]

    def test_lowercase_folding(self, spark):
        df = spark.createDataFrame([(1, "Hello WORLD")], "id long, body string")
        for eng in ("expr", "automaton"):
            out = keyword_matches(
                df, "body", ["world"], id_cols=["id"], lowercase=True, engine=eng
            )
            assert out.count() == 1, eng

    def test_auto_engine_switches_on_dictionary_size(self, spark):
        df = spark.createDataFrame([(1, "w0 w1 w2")], "id long, body string")
        big = [f"w{i}" for i in range(300)]  # > _EXPR_MAX → automaton
        out = keyword_matches(df, "body", big, id_cols=["id"])
        assert out.count() == 3

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, body string")
        with pytest.raises(TransformationError, match="non-empty"):
            keyword_matches(df, "body", [], id_cols=["id"])
        with pytest.raises(TransformationError, match="duplicate"):
            keyword_matches(df, "body", ["a", "a"], id_cols=["id"])
        with pytest.raises(TransformationError, match="not in schema"):
            keyword_matches(df, "nope", ["a"])
        with pytest.raises(TransformationError, match="empty string"):
            keyword_matches(df, "body", ["a", ""], id_cols=["id"])

    def test_expr_path_has_no_shuffle(self, docs):
        out = keyword_matches(docs, "text", PHRASES, id_cols=["doc_id"], engine="expr")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestKeywordTagTransformer:
    def test_yaml_path(self, spark, docs):
        cfg = TransformationConfig(
            type="keyword_tag",
            options={
                "column": "text",
                "phrases": "the,data,model",
                "idColumns": "doc_id",
            },
        )
        out = KeywordTagTransformer().transform(
            docs, cfg, RunContext.create("t-kw", spark)
        )
        assert out.columns == ["doc_id", "keyword"]
        assert out.count() > 0

    def test_validation_errors(self, spark, docs):
        cfg = TransformationConfig(type="keyword_tag", options={"engine": "bogus"})
        res = KeywordTagTransformer().validate(docs, cfg)
        assert not res.is_valid
        joined = "; ".join(res.errors)
        assert "column" in joined and "phrases" in joined and "engine" in joined

    def test_registered(self):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

        assert "keyword_tag" in TRANSFORMER_REGISTRY


def test_case_folded_duplicates_refused(spark):
    """With lowercase=True, 'The' and 'the' fold to one needle; left
    in, the expr path's literal array would emit the match twice while
    the automaton's output set dedups — so the fold-duplicate is
    refused up front."""
    import pytest as _pytest

    from etl_spark_gradle_spark.operators.keywords import keyword_matches
    from etl_spark_gradle_spark.operators.relational import TransformationError

    df = spark.createDataFrame([(1, "the thing")], "id long, body string")
    with _pytest.raises(TransformationError, match="lowercase folding"):
        keyword_matches(df, "body", ["The", "the"], id_cols=["id"], lowercase=True)
    # without folding the same dictionary is two distinct phrases
    out = keyword_matches(df, "body", ["The", "the"], id_cols=["id"])
    assert [r.keyword for r in out.collect()] == ["the"]
