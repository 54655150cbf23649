"""Trainable BPE tokenizer (operators/bpe.py): exactness vs a pure-
Python reference, determinism, losslessness, and the YAML adapter."""

from __future__ import annotations

import re

import pytest

from etl_spark_gradle_spark.operators.bpe import (
    BpeTokenizeTransformer,
    bpe_encode_word,
    bpe_tokenize,
    train_bpe,
)
from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig


# -- pure-python reference (independent of the module under test) ----------


def _ref_train(texts, num_merges):
    freqs = {}
    for t in texts:
        for w in re.split(r"[ \t\n\f\r]+", t.lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    words = {tuple(w): c for w, c in freqs.items()}
    merges = []
    for _ in range(num_merges):
        pc = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        nw = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + c
        words = nw
    return merges


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker brown foxes jumped over lazy dogs",
    "pack my box with five dozen liquor jugs",
    "the the the quick quick brown",
]


def test_train_matches_reference_merges(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["id", "text"])
    model = train_bpe(df, "text", num_merges=20)
    assert [tuple(m) for m in model["merges"]] == _ref_train(CORPUS, 20)
    assert len(model["merges"]) > 0
    # training is deterministic run-to-run
    model2 = train_bpe(df, "text", num_merges=20)
    assert model == model2


def test_tokenize_matches_reference_tokens(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["id", "text"])
    model = train_bpe(df, "text", num_merges=15)
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    out = {r.id: r for r in bpe_tokenize(df, "id", "text", model["merges"]).collect()}
    for i, t in enumerate(CORPUS):
        expected = []
        for w in re.split(r"[ \t\n\f\r]+", t.lower()):
            if w:
                expected.extend(bpe_encode_word(w, ranks))
        assert out[i].tokens == expected, t
        assert out[i].n_tokens == len(expected)
        # lossless: tokens partition the non-whitespace characters
        assert out[i].n_chars == len(re.sub(r"[ \t\n\f\r]+", "", t.lower()))
        assert "".join(out[i].tokens) == re.sub(r"[ \t\n\f\r]+", "", t.lower())


def test_merges_actually_compress(spark):
    """More merges -> fewer tokens; zero merges -> character count."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["id", "text"])
    model = train_bpe(df, "text", num_merges=30)
    with_m = bpe_tokenize(df, "id", "text", model["merges"])
    no_m = bpe_tokenize(df, "id", "text", [])
    tm = sum(r.n_tokens for r in with_m.collect())
    t0 = sum(r.n_tokens for r in no_m.collect())
    assert tm < t0
    assert all(r.n_tokens == r.n_chars for r in no_m.collect())


def test_unseen_chars_stay_single_tokens(spark):
    df = spark.createDataFrame([(0, "aaa bbb aaa bbb")], ["id", "text"])
    model = train_bpe(df, "text", num_merges=5)
    new = spark.createDataFrame([(1, "aaa zzz✓")], ["id", "text"])
    row = bpe_tokenize(new, "id", "text", model["merges"]).collect()[0]
    assert "".join(row.tokens) == "aaazzz✓"
    assert "aaa" in row.tokens  # learned merge applies
    assert row.n_chars == 7


def test_bpe_validation(spark):
    df = spark.createDataFrame([("x", "t")], ["id", "text"])
    with pytest.raises(ValueError, match="integral"):
        bpe_tokenize(df, "id", "text", [])


def test_bpe_yaml_adapter(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["id", "text"])
    ctx = RunContext(pipeline_id="t", run_id="t", spark=spark)
    cfg = TransformationConfig(
        type="bpe_tokenize",
        options={"idColumn": "id", "textColumn": "text", "numMerges": "10"},
    )
    out = BpeTokenizeTransformer().transform(df, cfg, ctx)
    assert out.count() == len(CORPUS)
    assert set(out.columns) == {"id", "tokens", "n_tokens", "n_chars"}
