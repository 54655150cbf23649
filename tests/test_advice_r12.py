"""Regression tests for the ADVICE r12 findings: cochran_armitage's
truthy flag contract, aalen_johansen's fractional-cause rejection,
tfidf's NULL-id document universe, the experiment-readout gate's
not_null contract, and fdr_bh(by)'s harmonic-constant grain."""

from __future__ import annotations

import math

import pytest

from etl_spark_gradle_spark.operators.relational import TransformationError


def test_cochran_armitage_truthy_flag_contract(spark):
    """ADVICE r12 (medium): a 0/2-coded flag used to be summed RAW
    into r_pos (r_pos > n, garbage t_num) while the score sum only
    counted flag == 1. Truthy cast must make 0/2, 0/1, boolean, and
    'true'/'false' string codings all agree."""
    from etl_spark_gradle_spark.operators.stats import cochran_armitage

    rows01 = [
        (1.0, 0), (1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1), (3.0, 1),
    ]
    base = cochran_armitage(
        spark.createDataFrame(rows01, "dose double, flag int"),
        "dose",
        "flag",
    ).collect()[0]
    assert base["n"] == 6
    assert base["r_pos"] == 3
    assert base["r_pos"] <= base["n"]
    assert base["z_trend"] is not None and base["z_trend"] > 0

    # 0/2 coding (the mis-coded-arm hazard): same truth values
    rows02 = [(d, f * 2) for d, f in rows01]
    enc2 = cochran_armitage(
        spark.createDataFrame(rows02, "dose double, flag int"),
        "dose",
        "flag",
    ).collect()[0]
    assert enc2["r_pos"] == base["r_pos"]
    assert enc2["t_num"] == base["t_num"]
    assert enc2["z_trend"] == pytest.approx(base["z_trend"], abs=0)

    # boolean and 'true'/'false' string codings: same result, no
    # silent NULLing
    rows_b = [(d, bool(f)) for d, f in rows01]
    encb = cochran_armitage(
        spark.createDataFrame(rows_b, "dose double, flag boolean"),
        "dose",
        "flag",
    ).collect()[0]
    assert encb["r_pos"] == base["r_pos"]
    assert encb["z_trend"] == pytest.approx(base["z_trend"], abs=0)

    rows_s = [(d, "true" if f else "false") for d, f in rows01]
    encs = cochran_armitage(
        spark.createDataFrame(rows_s, "dose double, flag string"),
        "dose",
        "flag",
    ).collect()[0]
    assert encs["r_pos"] == base["r_pos"]
    assert encs["z_trend"] == pytest.approx(base["z_trend"], abs=0)


def test_aalen_johansen_rejects_fractional_cause(spark):
    """ADVICE r12 (low): a double cause column stringifies 0.0 as
    '0.0', so censored rows silently counted as a competing cause and
    every CIF inflated. Fractional/decimal cause types must raise."""
    from etl_spark_gradle_spark.operators.timeseries import aalen_johansen

    dbl = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 1.0), (3.0, 2.0)], "t double, cause double"
    )
    with pytest.raises(TransformationError, match="cause column"):
        aalen_johansen(dbl, "t", "cause")

    from decimal import Decimal

    dec = spark.createDataFrame(
        [(1.0, Decimal("0.00")), (2.0, Decimal("1.00"))],
        "t double, cause decimal(10,2)",
    )
    with pytest.raises(TransformationError, match="cause column"):
        aalen_johansen(dec, "t", "cause")

    # integer and string codes keep working, and the censored-0 rows
    # really are treated as censoring (no cause '0' in the output)
    ok = spark.createDataFrame(
        [(1, 0), (2, 1), (2, 1), (3, 0), (4, 2)], "t int, cause int"
    )
    out = aalen_johansen(ok, "t", "cause").collect()
    assert out, "integer causes must still work"
    assert all(r["cause"] != "0" for r in out)


def test_tfidf_null_ids_excluded_from_universe(spark):
    """ADVICE r12 (low): NULL doc ids tokenized into df while N
    (count_distinct) excluded them — df could exceed N, ln(N/df) went
    negative, and a doc_id=NULL group appeared. NULL-id rows must be
    dropped before tokenizing, from every doc_term_stats consumer."""
    from etl_spark_gradle_spark.operators.retrieval import (
        doc_term_stats,
        tfidf_top_terms,
        tfidf_vectors,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha gamma"),
            (None, "alpha beta gamma delta"),
        ],
        "id int, text string",
    )
    stats = doc_term_stats(docs, "id", "text").collect()
    assert all(r["doc_id"] is not None for r in stats)

    top = tfidf_top_terms(docs, "id", "text", k=5).collect()
    assert all(r["doc_id"] is not None for r in top)
    # alpha appears in both real docs: df == N == 2, idf exactly 0 —
    # with the NULL doc leaking in, df was 3 > N and tfidf negative
    alpha = [r for r in top if r["term"] == "alpha"]
    assert alpha and all(r["df"] == 2 for r in alpha)
    assert all(r["tfidf"] >= 0.0 for r in top)

    vecs = tfidf_vectors(docs, "id", "text").collect()
    assert all(r["doc_id"] is not None for r in vecs)
    assert all(r["tfidf"] >= -1e-12 for r in vecs)


def test_experiment_readout_gate_enforces_not_null():
    """ADVICE r12 (low): the publishable-gate's 'x IS NULL OR ...'
    disjunctions passed the exact undefined case the pipeline comment
    claims to refuse. The checks must be plain not_null so an
    undefined χ²/OR actually gates."""
    import yaml

    with open("/root/repo/pipelines/experiment-readout.yaml") as f:
        cfg = yaml.safe_load(f)
    gate = next(
        t for t in cfg["transformations"] if t["name"] == "publishable-gate"
    )
    checks = gate["options"]["checks"]
    assert "not_null:or_mh" in checks
    assert "not_null:cmh_chi2" in checks
    assert "IS NULL OR" not in checks


def test_fdr_by_harmonic_grain(spark):
    """ADVICE r12 (low): the BY harmonic constant used 1e9-grain
    terms (5e-10 per-term drift, underflow past rank 2e9). Now 1e15
    grain: per-term error <= 5e-16, so c(m) matches the float
    harmonic sum to ~1e-12 at test sizes, and the plan must carry the
    1e15 literal (locks the grain against silent regression)."""
    from etl_spark_gradle_spark.operators.stats import fdr_bh

    m = 200
    rows = [(i, (i * 37 % m + 0.5) / m) for i in range(1, m + 1)]
    df = spark.createDataFrame(rows, "test_id int, p double")
    out = fdr_bh(df, "p", "test_id", q=0.10, method="by")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "1.0E15" in plan or "1e15" in plan.lower(), (
        "BY harmonic terms must quantize at the 1e15 grain"
    )
    res = {r["test_id"]: r for r in out.collect()}
    # pure-python BY reference
    ps = sorted((p, i) for i, p in rows)
    c_m = sum(1.0 / r for r in range(1, m + 1))
    k = 0
    for r, (p, _) in enumerate(ps, start=1):
        if p * m * c_m <= r * 0.10:
            k = r
    for r, (p, i) in enumerate(ps, start=1):
        assert res[i]["significant"] == (r <= k), (
            f"rank {r} p={p}: expected significant={r <= k}"
        )
