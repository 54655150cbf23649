"""decontaminate — GPT-3-style train/eval n-gram collision screening
(operators/corpus.py)."""

from __future__ import annotations

import pytest

from etl_spark_gradle_spark.operators.corpus import decontaminate
from etl_spark_gradle_spark.operators.relational import TransformationError


def _frames(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark pipelines"),
            (3, "THE QUICK BROWN FOX jumps somewhere else entirely"),
            (4, "short doc"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a quick brown fox jumps far"), (101, "spark pipelines rock")],
        "eval_id long, body string",
    )
    return train, ev


def test_decontaminate_report_matches_and_clean(spark):
    train, ev = _frames(spark)
    kw = dict(
        id_col="doc_id", text_col="text",
        eval_id_col="eval_id", eval_text_col="body", n=4,
    )
    report = {r["doc_id"]: r for r in
              decontaminate(train, ev, **kw).collect()}
    # doc 1 shares 'quick brown fox jumps'; doc 3 shares it too
    # (case-insensitive); doc 2 shares no 4-gram ('spark pipelines' is
    # only 2 tokens of overlap); doc 4 is shorter than n
    assert set(report) == {1, 3}
    assert report[1]["overlapping_ngrams"] == 1
    assert report[1]["eval_docs_hit"] == 1
    matches = decontaminate(train, ev, mode="matches", **kw).collect()
    assert {(m["doc_id"], m["eval_id"]) for m in matches} == {
        (1, 100), (3, 100)
    }
    clean = decontaminate(train, ev, mode="clean", **kw)
    assert set(r["doc_id"] for r in clean.collect()) == {2, 4, 5}
    assert clean.columns == train.columns  # frame passes through intact
    # min_hits above the overlap -> nothing flagged
    assert decontaminate(train, ev, min_hits=2, **kw).count() == 0


def test_decontaminate_plan_broadcasts_eval(spark):
    import io
    from contextlib import redirect_stdout

    train, ev = _frames(spark)
    d = decontaminate(train, ev, id_col="doc_id", text_col="text",
                      eval_id_col="eval_id", eval_text_col="body", n=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        d.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_validation(spark):
    train, ev = _frames(spark)
    with pytest.raises(TransformationError):
        decontaminate(train, ev, id_col="doc_id", text_col="text",
                      eval_text_col="body", n=0)
    with pytest.raises(TransformationError):
        decontaminate(train, ev, id_col="doc_id", text_col="text",
                      eval_text_col="body", mode="purge")
    with pytest.raises(TransformationError):
        decontaminate(train, ev, id_col="missing", text_col="text")


def test_decontaminate_adapter_via_view(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    train, ev = _frames(spark)
    ev.createOrReplaceTempView("eval_set_v")

    class Ctx:
        pass

    ctx = Ctx()
    ctx.spark = spark
    t = TRANSFORMER_REGISTRY["decontaminate"]
    cfg = TransformationConfig(
        type="decontaminate",
        options={"evalView": "eval_set_v", "idColumn": "doc_id",
                 "textColumn": "text", "evalIdColumn": "eval_id",
                 "evalTextColumn": "body", "n": "4", "mode": "clean"},
    )
    assert t.validate(train, cfg).is_valid
    out = t.transform(train, cfg, ctx)
    assert set(r["doc_id"] for r in out.collect()) == {2, 4, 5}
    bad = TransformationConfig(
        type="decontaminate",
        options={"idColumn": "doc_id", "textColumn": "text"},
    )
    assert not t.validate(train, bad).is_valid
