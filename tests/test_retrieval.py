"""TF-IDF / BM25 retrieval operators (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest

from etl_spark_gradle_spark.operators import retrieval as rt
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog ate the cat food"),
            (3, "quantum chromodynamics lattice"),
            (4, "cat cat cat"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )


def test_bm25_matches_python_reference_bitwise(spark, tiny_docs):
    query = ["cat", "the"]
    got = {r.doc_id: r.bm25 for r in
           rt.bm25_scores(tiny_docs, "doc_id", "text", query).collect()}
    corpus = {
        r.doc_id: [t for t in r.text.lower().split() if t]
        for r in tiny_docs.collect()
        if r.text.strip()
    }
    want = rt.py_bm25(corpus, query)
    assert set(got) == set(want)
    for d in want:
        # identical formula + operand order -> bit-identical doubles
        assert got[d] == want[d], (d, got[d], want[d])


def test_bm25_ranking_properties(spark, tiny_docs):
    # doc 4 is pure "cat" spam: highest cat tf but BM25's saturation +
    # shortness norm keeps it comparable; doc 3 matches nothing
    rows = rt.bm25_scores(tiny_docs, "doc_id", "text", ["cat"]).collect()
    ids = {r.doc_id for r in rows}
    assert 3 not in ids and 5 not in ids
    assert ids == {1, 2, 4}
    by_id = {r.doc_id: r for r in rows}
    assert by_id[4].sum_tf == 3 and by_id[4].doc_len == 3
    # rare-term idf dominates: "lattice" only in doc 3
    rare = rt.bm25_scores(tiny_docs, "doc_id", "text", ["lattice"]).collect()
    assert [r.doc_id for r in rare] == [3]


def test_bm25_top_k_plans_take_ordered(spark, tiny_docs):
    import io
    from contextlib import redirect_stdout

    out = rt.bm25_scores(tiny_docs, "doc_id", "text", ["cat"], top_k=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()
    assert len(out.collect()) == 2


def test_tfidf_vectors_and_min_df(spark, tiny_docs):
    vecs = rt.tfidf_vectors(tiny_docs, "doc_id", "text")
    rows = {(r.doc_id, r.term): r for r in vecs.collect()}
    n_docs = 5  # N counts all docs (the empty one has no terms but is a doc)
    cat = rows[(4, "cat")]
    assert cat.tf == 3 and cat.df == 3
    assert cat.tfidf == 3.0 * math.log(n_docs / 3.0)
    # min_df prunes hapax terms
    pruned = rt.tfidf_vectors(tiny_docs, "doc_id", "text", min_df=2)
    terms = {r.term for r in pruned.collect()}
    assert "lattice" not in terms and "cat" in terms


def test_bm25_validation_and_yaml_adapter(spark, tiny_docs):
    with pytest.raises(TransformationError, match="query term"):
        rt.bm25_scores(tiny_docs, "doc_id", "text", [])

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["bm25"]
    ctx = RunContext.create("t", spark)
    cfg = TransformationConfig(
        type="bm25",
        options={"idColumn": "doc_id", "queryTerms": "cat,the", "topK": "3"},
    )
    assert t.validate(tiny_docs, cfg).is_valid
    out = t.transform(tiny_docs, cfg, ctx)
    assert out.count() == 3
    bad = t.validate(
        tiny_docs, TransformationConfig(type="bm25", options={"idColumn": "doc_id"})
    )
    assert not bad.is_valid
