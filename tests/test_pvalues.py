"""p-value columns for the hypothesis-test family (VERDICT r11 ask
#4): chi_square, anova_f (and brown_forsythe via inheritance),
kruskal_wallis, cochran_armitage, mantel_haenszel, logrank_test.

The implementations are FROZEN closed-form approximations (A&S
26.2.17 normal tail; χ² k=1 via the normal form, k=2 exact
exp(-x/2), k>=3 Wilson–Hilferty; F via Paulson) quantized to 9 dp —
chosen over a driver-side numpy close so the DuckDB oracle replays
them exactly (oracle-gated, not rows-only). These tests lock the
approximations against independently-computed reference tails."""

from __future__ import annotations

import math

import pytest

# Reference upper-tail values computed once with mpmath/scipy
# elsewhere and FROZEN here (the container has neither; these are
# textbook-checkable numbers).
#   chi2 sf: P(chi2_k > x)
_CHI2_REFS = [
    # (x, k, exact_sf, tol)
    (3.841458820694124, 1, 0.05, 1e-6),     # the 95th pct of chi2(1)
    (6.634896601021215, 1, 0.01, 1e-6),
    (5.991464547107979, 2, 0.05, 1e-12),    # k=2 is exact exp(-x/2)
    (9.21034037197618, 2, 0.01, 1e-12),
    (7.814727903251179, 3, 0.05, 2e-3),     # Wilson–Hilferty band
    (11.070497693516351, 5, 0.05, 2e-3),
    (18.307038053275146, 10, 0.05, 2e-3),
]
#   F sf: P(F_{d1,d2} > x) = 0.05 at the tabled 95th percentiles
_F_REFS = [
    # Paulson band: ~1e-2 worst-case absolute at small dof (the
    # measured errors at these points: +1.1e-3, -7.4e-3, +9e-4)
    (4.964602743730711, 1, 9, 0.05, 2e-3),
    (3.0061181627358736, 4, 20, 0.05, 8e-3),
    (2.2899849812691906, 5, 100, 0.05, 2e-3),
]
#   normal two-sided: 2*P(Z > |z|)
_Z_REFS = [
    (1.959963984540054, 0.05, 5e-7),
    (2.5758293035489004, 0.01, 5e-7),
    (0.0, 1.0, 5e-7),
]


def _spark_eval(spark, expr_col):
    return spark.range(1).select(expr_col.alias("v")).collect()[0]["v"]


def test_chi2_sf_against_reference(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.stats import _pq, chi2_sf

    for x, k, sf, tol in _CHI2_REFS:
        got = _spark_eval(
            spark, _pq(chi2_sf(F.lit(float(x)), F.lit(int(k))))
        )
        assert got == pytest.approx(sf, abs=tol), (x, k, got, sf)


def test_f_sf_against_reference(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.stats import _pq, f_sf

    for x, d1, d2, sf, tol in _F_REFS:
        got = _spark_eval(
            spark,
            _pq(f_sf(F.lit(float(x)), F.lit(int(d1)), F.lit(int(d2)))),
        )
        assert got == pytest.approx(sf, abs=tol), (x, d1, d2, got, sf)


def test_norm_sf_two_sided_against_reference(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.stats import _pq, norm_sf

    for z, p, tol in _Z_REFS:
        got = _spark_eval(
            spark, _pq(F.lit(2.0) * norm_sf(F.abs(F.lit(float(z)))))
        )
        assert got == pytest.approx(p, abs=tol), (z, got, p)


def test_norm_sf_negative_reflection(spark):
    """sf(-z) must equal 1 - sf(z) exactly (the CASE reflection), and
    sf must be monotone decreasing."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.stats import norm_sf

    pos = _spark_eval(spark, norm_sf(F.lit(1.5)))
    neg = _spark_eval(spark, norm_sf(F.lit(-1.5)))
    assert neg == pytest.approx(1.0 - pos, abs=1e-15)
    vals = [
        _spark_eval(spark, norm_sf(F.lit(z)))
        for z in (-2.0, -0.5, 0.0, 0.5, 2.0)
    ]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_operators_publish_p_value(spark):
    """Every member of the test family now carries p_value, NULL
    exactly when the statistic is NULL, in [0, 1] otherwise — and the
    values are sane on a constructed dataset with a real effect."""
    from etl_spark_gradle_spark.operators.stats import (
        anova_f,
        brown_forsythe,
        chi_square,
        cochran_armitage,
        kruskal_wallis,
        mantel_haenszel,
    )
    from etl_spark_gradle_spark.operators.timeseries import logrank_test

    # strong dose-response: p should be tiny
    rows = [(float(d), 1 if (d * 7 + i) % 10 < d * 3 else 0)
            for d in (1, 2, 3) for i in range(30)]
    ca = cochran_armitage(
        spark.createDataFrame(rows, "dose double, flag int"),
        "dose",
        "flag",
    ).collect()[0]
    assert ca["p_value"] is not None and 0.0 <= ca["p_value"] <= 1.0
    two_sided = ca["p_value"]

    # independence table with association
    chi_rows = [("a", "x")] * 30 + [("a", "y")] * 10 + \
               [("b", "x")] * 10 + [("b", "y")] * 30
    chi = chi_square(
        spark.createDataFrame(chi_rows, "u string, v string"), "u", "v"
    ).collect()[0]
    assert chi["dof"] == 1
    assert chi["p_value"] is not None and chi["p_value"] < 0.001

    # ANOVA with separated group means
    a_rows = [(float(g * 10 + (i % 5)), str(g)) for g in (1, 2, 3)
              for i in range(20)]
    av = anova_f(
        spark.createDataFrame(a_rows, "x double, g string"), "x", "g"
    ).collect()[0]
    assert av["p_value"] is not None and av["p_value"] < 0.001
    bf = brown_forsythe(
        spark.createDataFrame(a_rows, "x double, g string"), "x", "g"
    ).collect()[0]
    assert "p_value" in bf.asDict()

    kw = kruskal_wallis(
        spark.createDataFrame(a_rows, "x double, g string"), "x", "g"
    ).collect()[0]
    assert kw["p_value"] is not None and kw["p_value"] < 0.001

    mh_rows = [(e, o, s) for s in ("s1", "s2")
               for e in (0, 1) for o in (0, 1)
               for _ in range(10 + 25 * (e == o))]
    mh = mantel_haenszel(
        spark.createDataFrame(mh_rows, "e int, o int, s string"),
        "e",
        "o",
        "s",
    ).collect()[0]
    assert mh["p_value"] is not None and mh["p_value"] < 0.01

    lr_rows = [(i % 20 + 1, 1, "a") for i in range(40)] + \
              [(i % 20 + 30, 1, "b") for i in range(40)]
    lr = logrank_test(
        spark.createDataFrame(lr_rows, "t int, ev int, side string"),
        "t",
        "ev",
        "side",
    ).collect()[0]
    assert lr["p_value"] is not None and lr["p_value"] < 0.001

    # NULL statistic -> NULL p (single level: no test)
    degen = anova_f(
        spark.createDataFrame(
            [(1.0, "only"), (2.0, "only")], "x double, g string"
        ),
        "x",
        "g",
    ).collect()[0]
    assert degen["f_stat"] is None and degen["p_value"] is None


def test_chi2_two_sided_identity(spark):
    """cochran_armitage's two-sided normal p and chi2_sf at k=1 agree
    on z² — the family's internal consistency (both are the same
    tail through different doors)."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.stats import (
        _pq,
        chi2_sf,
        norm_sf,
    )

    for z in (0.5, 1.0, 1.96, 3.0):
        a = _spark_eval(
            spark, _pq(F.lit(2.0) * norm_sf(F.abs(F.lit(z))))
        )
        b = _spark_eval(
            spark, _pq(chi2_sf(F.lit(z * z), F.lit(1)))
        )
        assert a == pytest.approx(b, abs=2e-9), (z, a, b)
