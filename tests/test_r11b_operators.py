"""Round-11 continuation operators (roc_curve, mcc, fleiss_kappa,
nelson_aalen) vs pure-python references."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from etl_spark_gradle_spark.operators.evaluation import (
    fleiss_kappa,
    mcc,
    roc_curve,
)
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.operators.timeseries import nelson_aalen
from etl_spark_gradle_spark.plans.config import TransformationConfig


def _cfg(type_, **options):
    return TransformationConfig(type=type_, options=options)


def _unpartitioned_windows(df) -> int:
    import json

    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    return sum(
        1 for nd in nodes
        if nd.get("class", "").endswith(".Window")
        and not nd.get("partitionSpec")
    )


# ------------------------------------------------------------------ roc


def test_roc_curve_matches_pure_python(spark):
    import random

    random.seed(23)
    rows = [(round(random.random(), 2), random.randint(0, 1))
            for _ in range(400)]
    rows += [(0.5, 1), (0.5, 0), (None, 1), (0.3, None)]
    df = spark.createDataFrame(rows, "score double, label int").repartition(4)
    d = roc_curve(df, "score", "label")
    out = {r["threshold"]: r for r in d.collect()}
    clean = [(s, l) for s, l in rows if s is not None and l is not None]
    P = sum(l for _, l in clean)
    N = len(clean) - P
    assert set(out) == set(s for s, _ in clean)
    for t in sorted(set(s for s, _ in clean)):
        tp = sum(l for s, l in clean if s >= t)
        fp = sum(1 - l for s, l in clean if s >= t)
        r = out[t]
        assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (
            tp, fp, N - fp, P - tp
        )
        assert r["tpr"] == pytest.approx(tp / P, abs=1e-15)
        assert r["fpr"] == pytest.approx(fp / N, abs=1e-15)
        assert r["youden_j"] == pytest.approx(tp / P - fp / N, abs=1e-12)
    # tpr and fpr are monotone nonincreasing in threshold; lowest
    # threshold classifies everything positive
    ts = sorted(out)
    tprs = [out[t]["tpr"] for t in ts]
    fprs = [out[t]["fpr"] for t in ts]
    assert all(a >= b for a, b in zip(tprs, tprs[1:]))
    assert all(a >= b for a, b in zip(fprs, fprs[1:]))
    assert out[ts[0]]["tpr"] == 1.0 and out[ts[0]]["fpr"] == 1.0
    # distributed: only _prefix_sums' bounded offsets window is global
    assert _unpartitioned_windows(d) <= 1


def test_roc_curve_auc_consistency(spark):
    """Trapezoidal area under the roc_curve table must agree with the
    exact Mann-Whitney auc operator (ties handled by the trapezoid
    through the tie block -- the textbook identity)."""
    import random

    from etl_spark_gradle_spark.operators.evaluation import auc

    random.seed(31)
    rows = [(round(random.random(), 1), random.randint(0, 1))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "score double, label int")
    pts = sorted(
        ((r["fpr"], r["tpr"]) for r in
         roc_curve(df, "score", "label").collect()),
    )
    pts = [(0.0, 0.0)] + pts  # the "classify nothing" corner
    area = sum(
        (x2 - x1) * (y1 + y2) / 2.0
        for (x1, y1), (x2, y2) in zip(pts, pts[1:])
    )
    want = auc(df, "score", "label").collect()[0]["auc"]
    assert area == pytest.approx(want, abs=1e-12)


# ------------------------------------------------------------------ mcc


def _py_mcc(pairs):
    tp = sum(1 for y, p in pairs if y and p)
    fp = sum(1 for y, p in pairs if not y and p)
    tn = sum(1 for y, p in pairs if not y and not p)
    fn = sum(1 for y, p in pairs if y and not p)
    denom = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    if denom == 0:
        return (tp, fp, tn, fn, None)
    return (tp, fp, tn, fn, (tp * tn - fp * fn) / math.sqrt(denom))


def test_mcc_matches_pure_python(spark):
    import random

    random.seed(7)
    pairs = [(random.randint(0, 1), random.randint(0, 1))
             for _ in range(500)]
    df = spark.createDataFrame(pairs, "label int, pred int")
    r = mcc(df, "label", "pred").collect()[0]
    tp, fp, tn, fn, want = _py_mcc(pairs)
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (tp, fp, tn, fn)
    assert r["n"] == len(pairs)
    assert r["mcc"] == pytest.approx(want, abs=1e-15)
    assert -1.0 <= r["mcc"] <= 1.0


def test_mcc_degenerate_and_grouped_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    rows = [
        ("a", 1, 1), ("a", 1, 0), ("a", 0, 1), ("a", 0, 0),
        ("b", 1, 1), ("b", 1, 1),  # all-positive labels: NULL mcc
    ]
    df = spark.createDataFrame(rows, "g string, label int, pred int")
    out = {r["g"]: r for r in
           mcc(df, "label", "pred", ["g"]).collect()}
    assert out["a"]["mcc"] == pytest.approx(0.0, abs=1e-15)
    assert out["b"]["mcc"] is None  # zero tn+fn marginal -> undefined
    # perfect predictor
    perf = spark.createDataFrame(
        [(1, 1), (0, 0), (1, 1), (0, 0)], "label int, pred int"
    )
    assert mcc(perf, "label", "pred").collect()[0]["mcc"] == 1.0
    # inverted predictor
    inv = spark.createDataFrame(
        [(1, 0), (0, 1), (1, 0), (0, 1)], "label int, pred int"
    )
    assert mcc(inv, "label", "pred").collect()[0]["mcc"] == -1.0

    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = _cfg("evaluation", operation="mcc", labelColumn="label",
              predictionColumn="pred", groupBy="g")
    assert t.validate(df, ok).is_valid
    assert t.transform(df, ok, None).count() == 2
    bad = _cfg("evaluation", operation="mcc", labelColumn="nope",
               predictionColumn="pred")
    assert not t.validate(df, bad).is_valid


# --------------------------------------------------------- fleiss kappa


def _py_fleiss(ratings, n=None):
    """ratings: list of (item, category). Returns the operator's
    output tuple for the inferred-or-pinned panel size."""
    cells = Counter(ratings)
    item_tot = Counter()
    for (i, _), c in cells.items():
        item_tot[i] += c
    if n is None:
        n = max(item_tot.values())
    kept = {i for i, tot in item_tot.items() if tot == n}
    dropped = len(item_tot) - len(kept)
    N = len(kept)
    s1 = sum(
        c * (c - 1) for (i, _), c in cells.items() if i in kept
    )
    cj = Counter()
    for (i, j), c in cells.items():
        if i in kept:
            cj[j] += c
    sc2 = sum(v * v for v in cj.values())
    p_bar = s1 / (N * n * (n - 1)) if N else None
    p_e = sc2 / (N * n) ** 2 if N else None
    kappa = (
        (p_bar - p_e) / (1 - p_e)
        if N and p_e is not None and p_e < 1.0
        else None
    )
    return N, dropped, n, len(cj), p_bar, p_e, kappa


def test_fleiss_kappa_textbook_example(spark):
    """The classic Fleiss (1971) 10-item / 14-rater / 5-category
    psychiatric-diagnosis table: kappa ~= 0.21."""
    table = [
        [0, 0, 0, 0, 14], [0, 2, 6, 4, 2], [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0], [2, 2, 8, 1, 1], [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0], [2, 5, 3, 2, 2], [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ]
    ratings = [
        (i, f"c{j}")
        for i, row in enumerate(table)
        for j, c in enumerate(row)
        for _ in range(c)
    ]
    df = spark.createDataFrame(ratings, "item int, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    N, dropped, n, ncat, p_bar, p_e, kappa = _py_fleiss(ratings)
    assert (r["n_items"], r["n_items_dropped"], r["n_raters"],
            r["n_categories"]) == (10, 0, 14, 5)
    assert r["p_bar"] == pytest.approx(p_bar, abs=1e-15)
    assert r["p_e"] == pytest.approx(p_e, abs=1e-15)
    assert r["kappa"] == pytest.approx(kappa, abs=1e-15)
    assert r["kappa"] == pytest.approx(0.20993070442195522, abs=1e-9)


def test_fleiss_kappa_unequal_panels_dropped_and_pinned_n(spark):
    ratings = (
        [(1, "a"), (1, "a"), (1, "b")]      # 3 raters
        + [(2, "b"), (2, "b"), (2, "b")]    # 3 raters
        + [(3, "a"), (3, "b")]              # 2 raters -> dropped at n=3
    )
    df = spark.createDataFrame(ratings, "item int, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    N, dropped, n, ncat, p_bar, p_e, kappa = _py_fleiss(ratings)
    assert (r["n_items"], r["n_items_dropped"]) == (2, 1) == (N, dropped)
    assert r["kappa"] == pytest.approx(kappa, abs=1e-15)
    # pinning n=2 keeps only item 3 instead
    r2 = fleiss_kappa(df, "item", "cat", n_raters=2).collect()[0]
    assert (r2["n_items"], r2["n_items_dropped"]) == (1, 2)
    with pytest.raises(TransformationError, match="n_raters >= 2"):
        fleiss_kappa(df, "item", "cat", n_raters=1)


def test_fleiss_kappa_grouped_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    ratings = [
        ("g", 1, "a"), ("g", 1, "a"), ("g", 2, "a"), ("g", 2, "b"),
        ("h", 1, "x"), ("h", 1, "x"), ("h", 2, "x"), ("h", 2, "x"),
    ]
    df = spark.createDataFrame(ratings, "grp string, item int, cat string")
    out = {r["grp"]: r for r in
           fleiss_kappa(df, "item", "cat", ["grp"]).collect()}
    ge = _py_fleiss([(i, c) for g, i, c in ratings if g == "g"])
    assert out["g"]["kappa"] == pytest.approx(ge[6], abs=1e-15)
    # group h: every rating identical -> p_e = 1 -> NULL kappa
    assert out["h"]["kappa"] is None
    assert out["h"]["p_bar"] == 1.0

    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = _cfg("evaluation", operation="fleiss_kappa", itemColumn="item",
              categoryColumn="cat", groupBy="grp")
    assert t.validate(df, ok).is_valid
    assert t.transform(df, ok, None).count() == 2
    bad = _cfg("evaluation", operation="fleiss_kappa", itemColumn="item",
               categoryColumn="cat", nRaters="one")
    assert not t.validate(df, bad).is_valid
    bad2 = _cfg("evaluation", operation="fleiss_kappa", itemColumn="item",
                categoryColumn="cat", nRaters="1")
    assert not t.validate(df, bad2).is_valid


# --------------------------------------------------------- nelson-aalen


def _na_python(data):
    dd, cc = Counter(), Counter()
    for t, e in data:
        (dd if e else cc)[t] += 1
    times = sorted(set(dd) | set(cc))
    n = len(data)
    cum_rm = hq = vq = 0
    exp = []
    for t in times:
        d, c = dd.get(t, 0), cc.get(t, 0)
        n_risk = n - cum_rm
        cum_rm += d + c
        if d > 0:
            hq += round(d / n_risk * 1e9)
            vq += round(d / (n_risk * n_risk) * 1e15)
        exp.append((t, n_risk, d, c, hq / 1e9, vq / 1e15))
    return exp


def test_nelson_aalen_matches_pure_python(spark):
    data = [(3, 1), (5, 1), (5, 0), (8, 1), (8, 1), (10, 0),
            (12, 1), (15, 0)]
    df = spark.createDataFrame(data, "dur int, ev int")
    got = [
        (r["t"], r["n_risk"], r["n_event"], r["n_censored"],
         r["cum_hazard"], r["var_hazard"])
        for r in nelson_aalen(df, "dur", "ev").collect()
    ]
    assert got == _na_python(data)
    # cumulative hazard is nonnegative and monotone nondecreasing
    hz = [h for *_, h, _ in got]
    assert hz[0] >= 0 and all(a <= b for a, b in zip(hz, hz[1:]))
    # H ~= -ln(S): cross-check against kaplan_meier on the same data
    from etl_spark_gradle_spark.operators.timeseries import kaplan_meier

    km = {r["t"]: r["survival"]
          for r in kaplan_meier(df, "dur", "ev").collect()}
    for t, _, d, _, h, _ in got:
        if km[t] > 0:
            # NA >= -ln(KM) is the classical inequality... actually
            # H_NA <= -ln(S_KM) with equality as d/n -> 0
            assert h <= -math.log(km[t]) + 1e-9


def test_nelson_aalen_grouped_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    data = [(3, 1), (5, 1), (5, 0), (8, 1)]
    df = spark.createDataFrame(
        [("g", t, e) for t, e in data] + [("h", 2, 0)],
        "grp string, dur int, ev int",
    )
    rows = nelson_aalen(df, "dur", "ev", group_by=["grp"]).collect()
    g = [(r["t"], r["cum_hazard"]) for r in rows if r["grp"] == "g"]
    assert g == [(t, h) for t, _, _, _, h, _ in _na_python(data)]
    h_rows = [(r["t"], r["n_risk"], r["cum_hazard"]) for r in rows
              if r["grp"] == "h"]
    assert h_rows == [(2, 1, 0.0)]  # censored only: hazard stays 0

    t = TRANSFORMER_REGISTRY["kaplan_meier"]
    out = t.transform(
        df,
        _cfg("kaplan_meier", durationColumn="dur", eventColumn="ev",
             groupBy="grp", estimator="nelson_aalen"),
        None,
    )
    assert "cum_hazard" in out.columns and out.count() == len(rows)
    res = t.validate(
        df, _cfg("kaplan_meier", durationColumn="dur", eventColumn="ev",
                 estimator="cox")
    )
    assert not res.is_valid


def test_nelson_aalen_property_vs_pure_python(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=15),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def check(data):
        df = spark.createDataFrame(data, "dur int, ev int")
        got = [
            (r["t"], r["n_risk"], r["n_event"], r["n_censored"],
             r["cum_hazard"], r["var_hazard"])
            for r in nelson_aalen(df, "dur", "ev").collect()
        ]
        assert got == _na_python(data)

    check()


# ----------------------------------------------------- stats additions


def test_tukey_hsd_matches_pure_python(spark):
    import itertools
    import random

    from etl_spark_gradle_spark.operators.stats import tukey_hsd

    random.seed(11)
    data = []
    shift = {"a": 0.0, "b": 5.0, "c": 5.5, "d": -2.0}
    for lvl, off in shift.items():
        data += [(lvl, round(random.gauss(10 + off, 3), 2))
                 for _ in range(random.randint(20, 40))]
    df = spark.createDataFrame(data, "lvl string, x double")
    got = {(r["lvl_a"], r["lvl_b"]): r
           for r in tukey_hsd(df, "x", "lvl").collect()}
    # pure python reference
    by = {}
    for lvl, x in data:
        by.setdefault(lvl, []).append(round(x, 2))
    N = sum(len(v) for v in by.values())
    k = len(by)
    ssw = sum(
        sum(x * x for x in v) - sum(v) ** 2 / len(v)
        for v in by.values()
    )
    mse = ssw / (N - k)
    assert set(got) == set(
        tuple(sorted(p)) for p in itertools.combinations(by, 2)
    )
    for (la, lb), r in got.items():
        ma = sum(by[la]) / len(by[la])
        mb = sum(by[lb]) / len(by[lb])
        se = math.sqrt(mse / 2 * (1 / len(by[la]) + 1 / len(by[lb])))
        assert r["n_a"] == len(by[la]) and r["n_b"] == len(by[lb])
        assert r["mean_a"] == pytest.approx(ma, rel=1e-12)
        assert r["diff"] == pytest.approx(ma - mb, abs=1e-9)
        assert r["q_stat"] == pytest.approx(abs(ma - mb) / se, rel=1e-9)
    # the planted big separations dominate
    assert got[("a", "b")]["q_stat"] > got[("b", "c")]["q_stat"]


def test_cronbach_alpha_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import cronbach_alpha

    random.seed(5)
    rows = []
    for _ in range(60):
        base = random.gauss(0, 2)
        rows.append(tuple(
            round(base + random.gauss(0, 1), 2) for _ in range(3)
        ))
    rows.append((1.0, None, 2.0))  # listwise-deleted
    df = spark.createDataFrame(rows, "a double, b double, c double")
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    clean = [t for t in rows if None not in t]
    n = len(clean)

    def var(xs):
        s = sum(xs)
        return (n * sum(x * x for x in xs) - s * s) / (n * (n - 1))

    items = sum(var([t[i] for t in clean]) for i in range(3))
    tot = var([sum(t) for t in clean])
    want = 3 / 2 * (1 - items / tot)
    assert r["n"] == n and r["k_items"] == 3
    assert r["item_var_sum"] == pytest.approx(items, rel=1e-12)
    assert r["total_var"] == pytest.approx(tot, rel=1e-12)
    assert r["alpha"] == pytest.approx(want, rel=1e-12)
    # correlated items -> reliability comfortably positive
    assert r["alpha"] > 0.5
    with pytest.raises(TransformationError, match="at least two"):
        cronbach_alpha(df, ["a"])


def test_cohens_d_matches_pure_python_and_adapter(spark):
    import random

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.stats import cohens_d

    random.seed(3)
    rows = [("x", round(random.gauss(10, 2), 2)) for _ in range(40)]
    rows += [("y", round(random.gauss(12, 2), 2)) for _ in range(50)]
    df = spark.createDataFrame(rows, "side string, v double")
    r = cohens_d(df, "v", "side").collect()[0]  # sides auto: x, y
    xs = [v for s, v in rows if s == "x"]
    ys = [v for s, v in rows if s == "y"]

    def mv(vals):
        n = len(vals)
        m = sum(vals) / n
        v = (n * sum(x * x for x in vals) - sum(vals) ** 2) / (n * (n - 1))
        return n, m, v

    na, ma, va = mv(xs)
    nb, mb, vb = mv(ys)
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    d = (ma - mb) / math.sqrt(sp2)
    g = d * (1 - 3 / (4 * (na + nb) - 9))
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["pooled_var"] == pytest.approx(sp2, rel=1e-12)
    assert r["d"] == pytest.approx(d, rel=1e-12)
    assert r["g"] == pytest.approx(g, rel=1e-12)

    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="cohens_d", valueColumn="v",
              sideColumn="side")
    assert t.validate(df, ok).is_valid
    assert t.transform(df, ok, None).count() == 1
    bad = _cfg("stats", operation="cohens_d", valueColumn="v",
               sideColumn="side", sideA="x")  # sideB missing
    assert not t.validate(df, bad).is_valid
    ok2 = _cfg("stats", operation="tukey_hsd", valueColumn="v",
               sideColumn="side")
    assert not t.validate(df, ok2).is_valid  # factorColumn missing
    ok3 = _cfg("stats", operation="cronbach_alpha", itemColumns="v")
    assert not t.validate(df, ok3).is_valid  # needs >= 2 items


def _py_cochran_q(rows):
    k = len(rows[0])
    clean = [r for r in rows if None not in r]
    n = len(clean)
    C = [sum(r[j] for r in clean) for j in range(k)]
    R = [sum(r) for r in clean]
    num = k * sum(c * c for c in C) - sum(C) ** 2
    den = k * sum(R) - sum(x * x for x in R)
    q = (k - 1) * num / den if den > 0 else None
    return n, k, q


def test_cochran_q_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import cochran_q

    random.seed(13)
    rows = [tuple(random.randint(0, 1) for _ in range(3))
            for _ in range(200)]
    rows.append((1, None, 0))  # listwise-deleted
    df = spark.createDataFrame(rows, "a int, b int, c int")
    r = cochran_q(df, ["a", "b", "c"]).collect()[0]
    n, k, want = _py_cochran_q(rows)
    assert (r["n"], r["k_treatments"], r["df"]) == (n, 3, 2)
    assert r["q_stat"] == pytest.approx(want, rel=1e-15)
    # k=2 must collapse to the UNCORRECTED McNemar chi2
    from etl_spark_gradle_spark.operators.stats import mcnemar_test

    two = [(a, b) for a, b, _ in rows if a is not None and b is not None]
    df2 = spark.createDataFrame(two, "a int, b int")
    q2 = cochran_q(df2, ["a", "b"]).collect()[0]["q_stat"]
    m2 = mcnemar_test(df2, "a", "b", correction=False).collect()[0][
        "chi2_mcnemar"
    ]
    assert q2 == pytest.approx(m2, rel=1e-12)
    with pytest.raises(TransformationError, match="at least two"):
        cochran_q(df, ["a"])


def _py_ad2(xs, ys):
    """Pure-python Scholz-Stephens A2akN (k=2, midrank/tie form) with
    the operator's nano-quantization."""
    na, nb = len(xs), len(ys)
    N = na + nb
    from collections import Counter

    cx, cy = Counter(xs), Counter(ys)
    vals = sorted(set(xs) | set(ys))
    cum_a = cum_b = 0
    sq = 0
    for v in vals:
        ca, cb = cx.get(v, 0), cy.get(v, 0)
        cum_a += ca
        cum_b += cb
        t = ca + cb
        ua = 2 * cum_a - ca
        ub = 2 * cum_b - cb
        vv = 2 * (cum_a + cum_b) - t
        den = vv * (2 * N - vv) - N * t
        if den > 0:
            ga = N * ua - na * vv
            gb = N * ub - nb * vv
            term = ((N - 1) / N) * (t / N) * (
                ga * ga / (na * den) + gb * gb / (nb * den)
            )
            sq += round(term * 1e9)
    return sq / 1e9


def test_anderson_darling_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import (
        anderson_darling_drift,
    )

    random.seed(19)
    xs = [round(random.gauss(0, 1), 1) for _ in range(300)]
    ys = [round(random.gauss(0.8, 1.3), 1) for _ in range(250)]
    da = spark.createDataFrame([(v,) for v in xs], "v double")
    db = spark.createDataFrame([(v,) for v in ys], "v double")
    r = anderson_darling_drift(da, db, "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (300, 250)
    assert r["n_values"] == len(set(xs) | set(ys))
    assert r["a2"] == pytest.approx(_py_ad2(xs, ys), abs=1e-9)
    # a planted shift must read clearly above the H0 expectation of 1
    assert r["a2"] > 5.0
    # identical samples -> exactly 0 (every midrank gap vanishes)
    same = anderson_darling_drift(da, da, "v").collect()[0]
    assert same["a2"] == 0.0
    # H0 (same distribution, independent draws): A2 stays small
    zs = [round(random.gauss(0, 1), 1) for _ in range(300)]
    dz = spark.createDataFrame([(v,) for v in zs], "v double")
    h0 = anderson_darling_drift(da, dz, "v").collect()[0]
    assert h0["a2"] < 4.0
    # tail sensitivity: fatter tails, same mean/median -> AD fires
    ws = [round(random.gauss(0, 3), 1) for _ in range(300)]
    dw = spark.createDataFrame([(v,) for v in ws], "v double")
    tails = anderson_darling_drift(da, dw, "v").collect()[0]
    assert tails["a2"] > 5.0
    # distributed plan: only the bounded offsets window is global
    assert _unpartitioned_windows(
        anderson_darling_drift(da, db, "v")
    ) <= 1


def test_drift_adapter_anderson_darling(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    t = TRANSFORMER_REGISTRY["drift"]
    bad = _cfg("drift", otherView="x", valueColumn="v",
               statistic="anderson")
    assert not t.validate(df, bad).is_valid
    ok = _cfg("drift", otherView="x", valueColumn="v",
              statistic="anderson_darling")
    assert t.validate(df, ok).is_valid


def _py_w1(xs, ys):
    """Pure-python W1 with the operator's quantization."""
    from collections import Counter

    na, nb = len(xs), len(ys)
    cx, cy = Counter(xs), Counter(ys)
    vals = sorted(set(xs) | set(ys))
    ca = cb = 0
    sq = 0
    for v, nv in zip(vals, vals[1:] + [None]):
        ca += cx.get(v, 0)
        cb += cy.get(v, 0)
        if nv is not None:
            dnum = abs(ca * nb - cb * na)
            term = (nv - v) * (dnum / (na * nb))
            sq += round(term * 1e9)
    return sq / 1e9


def test_wasserstein_matches_pure_python_and_shift(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import wasserstein_drift

    random.seed(29)
    xs = [round(random.gauss(0, 1), 1) for _ in range(300)]
    ys = [round(random.gauss(0, 1) + 2.5, 1) for _ in range(250)]
    da = spark.createDataFrame([(v,) for v in xs], "v double")
    db = spark.createDataFrame([(v,) for v in ys], "v double")
    r = wasserstein_drift(da, db, "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (300, 250)
    assert r["w1"] == pytest.approx(_py_w1(xs, ys), abs=1e-9)
    # a pure location shift of delta has W1 ~= delta (the defining
    # property KS caps at 1 and cannot express)
    assert 2.0 < r["w1"] < 3.0
    # identical samples -> exactly 0
    assert wasserstein_drift(da, da, "v").collect()[0]["w1"] == 0.0
    # scale equivariance: W1(c*X, c*Y) = c * W1(X, Y) up to quant grain
    from pyspark.sql import functions as F

    r3 = wasserstein_drift(
        da.select((F.col("v") * 3).alias("v")),
        db.select((F.col("v") * 3).alias("v")),
        "v",
    ).collect()[0]
    assert r3["w1"] == pytest.approx(3 * r["w1"], abs=1e-6)
    # plan: within-bucket lead + two bounded windows (offsets table +
    # next-nonempty-bucket firsts)
    assert _unpartitioned_windows(wasserstein_drift(da, db, "v")) <= 2


def test_drift_adapter_wasserstein(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    t = TRANSFORMER_REGISTRY["drift"]
    ok = _cfg("drift", otherView="x", valueColumn="v",
              statistic="wasserstein")
    assert t.validate(df, ok).is_valid


def test_classifier_quality_report_pipeline_yaml(spark, sf_dir, tmp_path,
                                                 monkeypatch):
    """The shipped pipelines/classifier-quality-report.yaml runs
    end-to-end: threshold -> per-segment MCC -> range gate -> parquet."""
    from etl_spark_gradle_spark.plans.config import load_pipeline_yaml
    from etl_spark_gradle_spark.plans.executor import PipelineExecutor

    out = str(tmp_path / "report")
    monkeypatch.setenv("LINEITEM_SRC", f"{sf_dir}/lineitem.parquet")
    monkeypatch.setenv("REPORT_OUT", out)
    cfg = load_pipeline_yaml("pipelines/classifier-quality-report.yaml")
    metrics = PipelineExecutor().execute(cfg, spark)
    assert metrics.records_loaded > 0
    rep = spark.read.parquet(out)
    rows = {r["l_linestatus"]: r for r in rep.collect()}
    assert set(rows) == {"F", "O"}
    for r in rows.values():
        assert r["n"] == r["tp"] + r["fp"] + r["tn"] + r["fn"]
        assert r["mcc"] is None or -1.0 <= r["mcc"] <= 1.0


def _py_friedman(rows):
    """Pure-python tie-corrected Friedman over k-column rows."""
    clean = [r for r in rows if None not in r]
    k = len(clean[0])
    n = len(clean)
    R = [0.0] * k
    A = 0.0
    for r in clean:
        for j in range(k):
            less = sum(1 for l in range(k) if r[l] < r[j])
            eq = sum(1 for l in range(k) if r[l] == r[j])
            rank = less + (eq + 1) / 2.0
            R[j] += rank
            A += rank * rank
    C = n * k * (k + 1) ** 2 / 4.0
    num = sum(x * x for x in R) - n * C
    den = A - C
    return n, (k - 1) * num / den if den > 0 else None


def test_friedman_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import friedman

    random.seed(37)
    rows = []
    for _ in range(150):
        base = random.gauss(0, 1)
        # treatment b systematically higher; deliberate ties via 1dp
        rows.append((
            round(base + random.gauss(0, 0.5), 1),
            round(base + 0.4 + random.gauss(0, 0.5), 1),
            round(base + random.gauss(0, 0.5), 1),
        ))
    rows.append((1.0, None, 2.0))  # listwise-deleted
    df = spark.createDataFrame(rows, "a double, b double, c double")
    r = friedman(df, ["a", "b", "c"]).collect()[0]
    n, want = _py_friedman(rows)
    assert (r["n"], r["k_treatments"], r["df"]) == (n, 3, 2)
    assert r["chi2_friedman"] == pytest.approx(want, rel=1e-12)
    assert r["chi2_friedman"] > 5.99  # the planted effect detects
    # all-tied rows -> NULL (zero denominator)
    tied = spark.createDataFrame(
        [(1.0, 1.0, 1.0), (2.0, 2.0, 2.0)], "a double, b double, c double"
    )
    assert friedman(tied, ["a", "b", "c"]).collect()[0][
        "chi2_friedman"
    ] is None
    with pytest.raises(TransformationError, match="at least two"):
        friedman(df, ["a"])
    # adapter
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="friedman", valueColumns="a,b,c")
    assert t.validate(df, ok).is_valid
    assert t.transform(df, ok, None).count() == 1
    assert not t.validate(
        df, _cfg("stats", operation="friedman", valueColumns="a")
    ).is_valid


def _py_mrr(rows, k=None):
    """rows: (query, score, rel, id). Operator-quantized MRR."""
    from collections import defaultdict

    by = defaultdict(list)
    for q, s, r, i in rows:
        if s is not None and r is not None:
            by[q].append((s, i, r))
    sq = hit = 0
    for q, items in by.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        first = next(
            (idx + 1 for idx, (_, _, r) in enumerate(items) if r), None
        )
        if first is not None and (k is None or first <= k):
            hit += 1
            sq += round(1e9 / first)
    n = len(by)
    return n, hit, (sq / 1e9) / n if n else None


def test_mrr_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.evaluation import mrr

    random.seed(47)
    rows = []
    for q in range(60):
        for i in range(random.randint(3, 15)):
            rows.append((q, round(random.random(), 2),
                         int(random.random() < 0.15), q * 100 + i))
    rows.append((99, None, 1, 9900))   # null score excluded
    rows.append((98, 0.5, None, 9800))  # null rel excluded -> query 98
    # has no clean rows at all and vanishes from the denominator
    df = spark.createDataFrame(
        rows, "q int, score double, rel int, id int"
    )
    r = mrr(df, "q", "score", "rel", id_col="id").collect()[0]
    n, hit, want = _py_mrr(rows)
    assert (r["n_queries"], r["n_hit"]) == (n, hit)
    assert r["mrr"] == pytest.approx(want, abs=1e-9)
    # @k cap: beyond-k first hits score 0 but stay in the denominator
    r3 = mrr(df, "q", "score", "rel", k=3, id_col="id").collect()[0]
    n3, hit3, want3 = _py_mrr(rows, k=3)
    assert (r3["n_queries"], r3["n_hit"]) == (n3, hit3)
    assert r3["mrr"] == pytest.approx(want3, abs=1e-9)
    assert r3["mrr"] <= r["mrr"] + 1e-12
    # a perfect ranking scores exactly 1
    perf = spark.createDataFrame(
        [(1, 0.9, 1, 1), (1, 0.1, 0, 2), (2, 0.8, 1, 3)],
        "q int, score double, rel int, id int",
    )
    assert mrr(perf, "q", "score", "rel").collect()[0]["mrr"] == 1.0
    with pytest.raises(TransformationError, match="k >= 1"):
        mrr(df, "q", "score", "rel", k=0)
    # adapter
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = _cfg("evaluation", operation="mrr", queryColumn="q",
              scoreColumn="score", relevanceColumn="rel", k="3")
    assert t.validate(df, ok).is_valid
    assert t.transform(df, ok, None).collect()[0]["mrr"] == pytest.approx(
        want3, abs=1e-9
    )


def test_mrr_adapter_validates_k_and_id(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame(
        [(1, 0.5, 1, 1)], "q int, score double, rel int, id int"
    )
    t = TRANSFORMER_REGISTRY["evaluation"]
    for bad_opts in (
        {"k": "zero"},
        {"k": "0"},
        {"idColumn": "nope"},
    ):
        cfg = _cfg("evaluation", operation="mrr", queryColumn="q",
                   scoreColumn="score", relevanceColumn="rel", **bad_opts)
        assert not t.validate(df, cfg).is_valid, bad_opts
    # k omitted entirely is valid (uncapped MRR)
    ok = _cfg("evaluation", operation="mrr", queryColumn="q",
              scoreColumn="score", relevanceColumn="rel")
    assert t.validate(df, ok).is_valid


# ------------------------------------------------- drift family r11c


def _py_kuiper(xs, ys):
    na, nb = len(xs), len(ys)
    cx, cy = Counter(xs), Counter(ys)
    ca = cb = 0
    dp = dm = 0
    for v in sorted(set(xs) | set(ys)):
        ca += cx.get(v, 0)
        cb += cy.get(v, 0)
        s = ca * nb - cb * na
        dp = max(dp, s)
        dm = max(dm, -s)
    return dp, dm, (dp + dm) / (na * nb)


def _py_cvm(xs, ys):
    """Pure-python two-sample CvM criterion with the operator's
    quantization and operand order."""
    na, nb = len(xs), len(ys)
    nn = float(na + nb)
    cx, cy = Counter(xs), Counter(ys)
    ca = cb = 0
    sq = 0
    for v in sorted(set(xs) | set(ys)):
        ca += cx.get(v, 0)
        cb += cy.get(v, 0)
        t = float(cx.get(v, 0) + cy.get(v, 0))
        g = abs(ca * nb - cb * na) / (na * nb)
        sq += round(t * g * g * (na * nb) / (nn * nn) * 1e9)
    return sq / 1e9


def _py_energy(xs, ys):
    na, nb = len(xs), len(ys)
    cx, cy = Counter(xs), Counter(ys)
    vals = sorted(set(xs) | set(ys))
    ca = cb = 0
    sq = 0
    for v, nv in zip(vals, vals[1:] + [None]):
        ca += cx.get(v, 0)
        cb += cy.get(v, 0)
        if nv is not None:
            g = abs(ca * nb - cb * na) / (na * nb)
            sq += round(2.0 * (nv - v) * g * g * 1e9)
    return sq / 1e9


def test_kuiper_matches_pure_python_and_variance_drift(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import (
        kuiper_drift, ks_drift,
    )

    random.seed(31)
    xs = [round(random.gauss(0, 1), 1) for _ in range(300)]
    ys = [round(random.gauss(0, 2.2), 1) for _ in range(260)]
    da = spark.createDataFrame([(v,) for v in xs], "v double")
    db = spark.createDataFrame([(v,) for v in ys], "v double")
    r = kuiper_drift(da, db, "v").collect()[0]
    dp, dm, v = _py_kuiper(xs, ys)
    assert (r["n_a"], r["n_b"]) == (300, 260)
    assert r["n_values"] == len(set(xs) | set(ys))
    assert (int(r["d_plus_num"]), int(r["d_minus_num"])) == (dp, dm)
    assert r["kuiper_v"] == pytest.approx(v, abs=1e-15)
    # the defining property: variance drift produces BOTH a positive
    # and a negative lobe in F_a - F_b; V reads their sum where KS
    # reads only the larger one
    ks = ks_drift(da, db, "v").collect()[0]
    assert int(r["d_plus_num"]) > 0 and int(r["d_minus_num"]) > 0
    assert r["kuiper_v"] > ks["ks_d"] * 1.5
    assert r["kuiper_v"] >= ks["ks_d"]
    # identical samples -> exactly 0; V bounded by 2
    same = kuiper_drift(da, da, "v").collect()[0]
    assert same["kuiper_v"] == 0.0
    assert r["kuiper_v"] <= 2.0
    # empty side -> empty frame (the ks_drift contract)
    empty = spark.createDataFrame([], "v double")
    assert kuiper_drift(da, empty, "v").count() == 0
    # distributed: only the bounded offsets window is global
    assert _unpartitioned_windows(kuiper_drift(da, db, "v")) <= 1


def test_cramer_von_mises_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import (
        cramer_von_mises_drift,
    )

    random.seed(37)
    xs = [round(random.gauss(0, 1), 1) for _ in range(300)]
    ys = [round(random.gauss(0.9, 1.1), 1) for _ in range(250)]
    da = spark.createDataFrame([(v,) for v in xs], "v double")
    db = spark.createDataFrame([(v,) for v in ys], "v double")
    r = cramer_von_mises_drift(da, db, "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (300, 250)
    assert r["n_values"] == len(set(xs) | set(ys))
    assert r["cvm_t"] == pytest.approx(_py_cvm(xs, ys), abs=1e-9)
    # a planted shift reads far above the H0 expectation of ~1/6
    assert r["cvm_t"] > 2.0
    # identical samples -> exactly 0
    assert cramer_von_mises_drift(da, da, "v").collect()[0][
        "cvm_t"
    ] == 0.0
    # H0 (independent draws, same distribution): T stays near 1/6
    zs = [round(random.gauss(0, 1), 1) for _ in range(300)]
    dz = spark.createDataFrame([(v,) for v in zs], "v double")
    assert cramer_von_mises_drift(da, dz, "v").collect()[0][
        "cvm_t"
    ] < 1.0
    # scale INVARIANT (rank-based): T(3X, 3Y) == T(X, Y) exactly
    from pyspark.sql import functions as F

    r3 = cramer_von_mises_drift(
        da.select((F.col("v") * 3).alias("v")),
        db.select((F.col("v") * 3).alias("v")),
        "v",
    ).collect()[0]
    assert r3["cvm_t"] == r["cvm_t"]
    assert _unpartitioned_windows(
        cramer_von_mises_drift(da, db, "v")
    ) <= 1


def test_energy_distance_matches_pure_python_and_scaling(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import (
        energy_distance_drift, wasserstein_drift,
    )

    random.seed(41)
    xs = [round(random.gauss(0, 1), 1) for _ in range(300)]
    ys = [round(random.gauss(2.5, 1), 1) for _ in range(250)]
    da = spark.createDataFrame([(v,) for v in xs], "v double")
    db = spark.createDataFrame([(v,) for v in ys], "v double")
    r = energy_distance_drift(da, db, "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (300, 250)
    assert r["energy"] == pytest.approx(_py_energy(xs, ys), abs=1e-9)
    # a clear location shift reads large; squared gaps never exceed
    # the linear ones scaled by the peak gap: E <= 2 * W1
    w1 = wasserstein_drift(da, db, "v").collect()[0]["w1"]
    assert r["energy"] > 1.0
    assert r["energy"] <= 2 * w1 + 1e-9
    # identical samples -> exactly 0
    assert energy_distance_drift(da, da, "v").collect()[0][
        "energy"
    ] == 0.0
    # scale EQUIVARIANT: E(3X, 3Y) = 3 * E(X, Y) up to quant grain
    from pyspark.sql import functions as F

    r3 = energy_distance_drift(
        da.select((F.col("v") * 3).alias("v")),
        db.select((F.col("v") * 3).alias("v")),
        "v",
    ).collect()[0]
    assert r3["energy"] == pytest.approx(3 * r["energy"], abs=1e-6)
    # plan: within-bucket lead + two bounded windows
    assert _unpartitioned_windows(
        energy_distance_drift(da, db, "v")
    ) <= 2


def test_drift_adapter_r11c_statistics(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    t = TRANSFORMER_REGISTRY["drift"]
    for stat in ("kuiper", "cramer_von_mises", "energy"):
        ok = _cfg("drift", otherView="x", valueColumn="v",
                  statistic=stat)
        assert t.validate(df, ok).is_valid, stat
    bad = _cfg("drift", otherView="x", valueColumn="v",
               statistic="cvm")
    assert not t.validate(df, bad).is_valid


# --------------------------------------------------------- pettitt


def _py_pettitt(rows):
    """Brute-force O(n^2) Pettitt over (t, v) pairs."""
    srt = sorted(rows)
    n = len(srt)
    K, arg, uarg = -1, None, None
    for t in range(1, n + 1):
        u = sum(
            (0 if srt[j][1] == srt[i][1]
             else (1 if srt[j][1] > srt[i][1] else -1))
            for i in range(t) for j in range(t, n)
        )
        if abs(u) > K:
            K, arg, uarg = abs(u), srt[t - 1][0], u
    return K, arg, uarg


def test_pettitt_matches_brute_force(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import pettitt_test

    random.seed(43)
    rows = [
        (float(t), round(random.gauss(0 if t < 120 else 2.0, 1), 1))
        for t in range(200)
    ]
    rows += [(5.0, None), (None, 1.0)]  # excluded
    df = spark.createDataFrame(rows, "t double, v double").repartition(4)
    r = pettitt_test(df, "t", "v").collect()[0]
    clean = [p for p in rows if p[0] is not None and p[1] is not None]
    K, arg, uarg = _py_pettitt(clean)
    assert r["n"] == len(clean)
    assert int(r["k_num"]) == K
    assert int(r["u_num"]) == uarg
    assert r["change_at"] == arg
    assert r["k_frac"] == pytest.approx(
        K * 4.0 / len(clean) ** 2, abs=1e-12
    )
    # the planted split at t=120 must be located within a few points
    assert 110.0 <= r["change_at"] <= 130.0
    # a clean half-split step change saturates k_frac at ~1
    step = spark.createDataFrame(
        [(float(t), 0.0 if t < 50 else 10.0) for t in range(100)],
        "t double, v double",
    )
    s = pettitt_test(step, "t", "v").collect()[0]
    assert int(s["k_num"]) == 50 * 50
    assert s["k_frac"] == pytest.approx(1.0, abs=1e-12)
    assert s["change_at"] == 49.0
    # H0 (no shift): k_frac stays small
    h0 = spark.createDataFrame(
        [(float(t), round(random.gauss(0, 1), 1)) for t in range(300)],
        "t double, v double",
    )
    assert pettitt_test(h0, "t", "v").collect()[0]["k_frac"] < 0.4
    # distributed plan: both prefix-sum scans partition on _pid
    assert _unpartitioned_windows(pettitt_test(df, "t", "v")) <= 2


def test_pettitt_tied_times_and_types(spark):
    from etl_spark_gradle_spark.operators.stats import pettitt_test

    # tied timestamps: splits only at distinct-time boundaries; the
    # brute force over the time-sorted list evaluates every row split
    # but mid-tie splits can only LOWER |U| when the tie carries equal
    # values, so boundary evaluation finds the same K here
    rows = [(1.0, 5.0), (1.0, 5.0), (2.0, 1.0), (3.0, 1.5), (3.0, 0.5)]
    r = pettitt_test(
        spark.createDataFrame(rows, "t double, v double"), "t", "v"
    ).collect()[0]
    # U after t=1 boundary (prefix = both 5.0 rows): every suffix value
    # is smaller -> U = -(2*3) = -6
    assert int(r["u_num"]) == -6
    assert int(r["k_num"]) == 6
    assert r["change_at"] == 1.0
    # timestamps work (monotone numeric view for the argmax)
    ts = spark.createDataFrame(
        [("2024-01-0%d 00:00:00" % d, float(d >= 5)) for d in
         range(1, 10)],
        "t string, v double",
    ).selectExpr("CAST(t AS TIMESTAMP) t", "v")
    rt = pettitt_test(ts, "t", "v").collect()[0]
    assert str(rt["change_at"]).startswith("2024-01-04")
    # string time column -> clean error
    bad = spark.createDataFrame([("a", 1.0)], "t string, v double")
    with pytest.raises(TransformationError, match="ordered axis"):
        pettitt_test(bad, "t", "v")
    # empty input -> empty frame
    empty = spark.createDataFrame([], "t double, v double")
    assert pettitt_test(empty, "t", "v").count() == 0


def test_pettitt_stats_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame([(1.0, 2.0)], "t double, v double")
    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="pettitt", xColumn="t", yColumn="v")
    assert t.validate(df, ok).is_valid
    out = t.transform(df, ok, None)
    assert out.columns == ["n", "k_num", "u_num", "change_at", "k_frac"]
    for bad in (
        _cfg("stats", operation="pettitt", xColumn="t"),
        _cfg("stats", operation="pettitt", xColumn="t", yColumn="nope"),
        _cfg("stats", operation="pettitt", xColumn="t", yColumn="v",
             groupBy="t"),
    ):
        assert not t.validate(df, bad).is_valid


# -------------------------------------------------- weighted kappa


def _py_weighted_kappa(rows, quad=True):
    def _key(c):
        try:
            return (0, float(c), c)
        except ValueError:
            return (1, 0.0, c)

    cls = sorted({str(a) for a, _ in rows} | {str(b) for _, b in rows},
                 key=_key)
    d = {c: i + 1 for i, c in enumerate(cls)}
    n = len(rows)
    O = Counter((str(a), str(b)) for a, b in rows)
    R = Counter(str(a) for a, _ in rows)
    C = Counter(str(b) for _, b in rows)

    def w(i, j):
        g = abs(d[i] - d[j])
        return g * g if quad else g

    wo = sum(w(i, j) * c for (i, j), c in O.items())
    we = sum(w(i, j) * R[i] * C[j] for i in cls for j in cls)
    return n * wo, we, (we - n * wo) / we if we else None


def test_weighted_kappa_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.evaluation import (
        cohens_kappa, weighted_kappa,
    )

    random.seed(47)
    rows = []
    for _ in range(500):
        a = random.randint(1, 5)
        b = min(5, max(1, a + random.choice([-2, -1, 0, 0, 0, 1])))
        rows.append((a, b))
    rows += [(None, 3), (2, None)]  # excluded
    df = spark.createDataFrame(rows, "a int, b int").repartition(4)
    clean = [p for p in rows if None not in p]
    for weights, quad in (("quadratic", True), ("linear", False)):
        r = weighted_kappa(df, "a", "b", weights=weights).collect()[0]
        wo, we, k = _py_weighted_kappa(clean, quad)
        assert r["n"] == len(clean)
        assert r["n_classes"] == 5
        assert (int(r["wo_num"]), int(r["we_num"])) == (wo, we)
        assert r["kappa_w"] == pytest.approx(k, abs=1e-15)
    # quadratic forgives near-misses more than linear: kappa_q >
    # kappa_l for this ±1/±2-dominated confusion
    kq = weighted_kappa(df, "a", "b").collect()[0]["kappa_w"]
    kl = weighted_kappa(df, "a", "b", weights="linear").collect()[0][
        "kappa_w"
    ]
    assert kq > kl
    # perfect agreement -> kappa_w = 1 exactly (wo = 0)
    perfect = spark.createDataFrame(
        [(i % 5, i % 5) for i in range(100)], "a int, b int"
    )
    p = weighted_kappa(perfect, "a", "b").collect()[0]
    assert int(p["wo_num"]) == 0 and p["kappa_w"] == 1.0
    # single class on both sides -> we = 0 -> NULL kappa
    degen = spark.createDataFrame([(1, 1)] * 5, "a int, b int")
    assert weighted_kappa(degen, "a", "b").collect()[0][
        "kappa_w"
    ] is None
    # binary labels: weighted == plain Cohen's kappa exactly, both
    # weightings (all nonzero gaps are 1)
    brows = [(random.randint(0, 1), random.randint(0, 1))
             for _ in range(300)]
    bdf = spark.createDataFrame(brows, "a int, b int")
    plain = cohens_kappa(bdf, "a", "b").collect()[0]["kappa"]
    for weights in ("quadratic", "linear"):
        assert weighted_kappa(bdf, "a", "b", weights=weights).collect()[
            0
        ]["kappa_w"] == pytest.approx(plain, abs=1e-15)
    # invalid weighting -> clean error
    with pytest.raises(TransformationError, match="quadratic|linear"):
        weighted_kappa(df, "a", "b", weights="cubic")


def test_weighted_kappa_grouped_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.evaluation import (
        weighted_kappa,
    )

    rows = [("x", 1, 1), ("x", 1, 2), ("x", 2, 2), ("x", 3, 3),
            ("y", 1, 3), ("y", 3, 1), ("y", 2, 2), ("y", 1, 1)]
    df = spark.createDataFrame(rows, "g string, a int, b int")
    out = {r["g"]: r for r in
           weighted_kappa(df, "a", "b", group_by=["g"]).collect()}
    assert set(out) == {"x", "y"}
    for g in ("x", "y"):
        sub = [(a, b) for gg, a, b in rows if gg == g]
        wo, we, k = _py_weighted_kappa(sub, True)
        # ranks are GLOBAL (classes 1..3 present in both groups here,
        # so per-group spine == global spine)
        assert (int(out[g]["wo_num"]), int(out[g]["we_num"])) == (wo, we)
        assert out[g]["kappa_w"] == pytest.approx(k, abs=1e-15)
    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = _cfg("evaluation", operation="weighted_kappa",
              raterAColumn="a", raterBColumn="b", weights="linear",
              groupBy="g")
    assert t.validate(df, ok).is_valid
    res = t.transform(df, ok, None)
    assert res.columns == ["g", "n", "n_classes", "wo_num", "we_num",
                           "kappa_w"]
    bad = _cfg("evaluation", operation="weighted_kappa",
               raterAColumn="a", raterBColumn="b", weights="cubic")
    assert not t.validate(df, bad).is_valid


# ------------------------------------------------ hosmer-lemeshow


def _py_hl(rows, B=10, lo=0.0, hi=1.0):
    """Pure-python HL with the operator's bin arithmetic: bins come
    from floor() of the ROUNDED IEEE quotient (what Spark and DuckDB
    both compute) — python's // floor-divides the true quotient and
    puts boundary values like 0.5 one bin lower."""
    from decimal import Decimal

    bint = {}
    for p, y in rows:
        b = min(max(math.floor((p - lo) / ((hi - lo) / B)), 0), B - 1)
        n, pos, sp = bint.get(b, (0, 0, Decimal(0)))
        bint[b] = (n + 1, pos + y,
                   sp + Decimal(str(p)).quantize(Decimal("0.01")))
    hl, skipped = 0.0, 0
    for b in sorted(bint):
        n, pos, sp = bint[b]
        e, o, ng = float(sp), float(pos), float(n)
        if e > 0 and ng - e > 0:
            hl += (o - e) * (o - e) * ng / (e * (ng - e))
        else:
            skipped += 1
    return hl, len(bint), skipped


def test_hosmer_lemeshow_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.evaluation import (
        hosmer_lemeshow,
    )

    random.seed(53)
    rows = []
    for _ in range(2000):
        p = round(random.random(), 2)
        rows.append((p, 1 if random.random() < p else 0))
    rows += [(None, 1), (0.5, None)]
    df = spark.createDataFrame(
        rows, "score double, label int"
    ).repartition(4)
    r = hosmer_lemeshow(df, "score", "label").collect()[0]
    clean = [p for p in rows if None not in p]
    hl, nb, sk = _py_hl(clean)
    assert r["n"] == len(clean)
    assert (r["n_bins"], r["n_bins_skipped"]) == (nb, sk)
    assert r["dof"] == nb - sk - 2
    assert r["hl_stat"] == pytest.approx(hl, abs=1e-12)
    # a calibrated model stays near its dof; a badly miscalibrated one
    # explodes (scores say p but labels fire at 0.3*p)
    assert r["hl_stat"] < 30.0
    bad = [(p, 1 if random.random() < 0.3 * p else 0)
           for p, _ in clean]
    bdf = spark.createDataFrame(bad, "score double, label int")
    rb = hosmer_lemeshow(bdf, "score", "label").collect()[0]
    assert rb["hl_stat"] == pytest.approx(_py_hl(bad)[0], abs=1e-9)
    assert rb["hl_stat"] > 100.0
    # degenerate: every score 0 in one bin -> that bin skipped; with
    # only 1 usable bin dof < 1 -> NULL statistic
    degen = spark.createDataFrame(
        [(0.0, 0)] * 10 + [(0.5, 1)] * 10, "score double, label int"
    )
    rd = hosmer_lemeshow(degen, "score", "label").collect()[0]
    assert rd["n_bins_skipped"] >= 1
    assert rd["hl_stat"] is None and rd["dof"] is None
    # validation errors
    with pytest.raises(TransformationError, match="bins"):
        hosmer_lemeshow(df, "score", "label", bins=0)
    with pytest.raises(TransformationError, match="hi > lo"):
        hosmer_lemeshow(df, "score", "label", lo=1.0, hi=0.0)


def test_hosmer_lemeshow_grouped_and_adapter(spark):
    import random

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.evaluation import (
        hosmer_lemeshow,
    )

    random.seed(59)
    rows = []
    for g in ("a", "b"):
        mult = 1.0 if g == "a" else 0.4
        for _ in range(800):
            p = round(random.random(), 2)
            rows.append((g, p, 1 if random.random() < mult * p else 0))
    df = spark.createDataFrame(rows, "g string, score double, label int")
    out = {r["g"]: r for r in
           hosmer_lemeshow(df, "score", "label",
                           group_by=["g"]).collect()}
    for g in ("a", "b"):
        sub = [(p, y) for gg, p, y in rows if gg == g]
        hl, nb, sk = _py_hl(sub)
        assert out[g]["hl_stat"] == pytest.approx(hl, abs=1e-10)
    # the miscalibrated group reads far above the calibrated one
    assert out["b"]["hl_stat"] > 3 * out["a"]["hl_stat"]
    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = _cfg("evaluation", operation="hosmer_lemeshow",
              scoreColumn="score", labelColumn="label", bins="10",
              groupBy="g")
    assert t.validate(df, ok).is_valid
    res = t.transform(df, ok, None)
    assert res.columns == ["g", "n", "n_bins", "n_bins_skipped",
                           "dof", "hl_stat"]
    for bad in (
        _cfg("evaluation", operation="hosmer_lemeshow",
             scoreColumn="score", labelColumn="label", bins="zero"),
        _cfg("evaluation", operation="hosmer_lemeshow",
             scoreColumn="score", labelColumn="label", lo="1.0",
             hi="0.5"),
        _cfg("evaluation", operation="hosmer_lemeshow",
             scoreColumn="score"),
    ):
        assert not t.validate(df, bad).is_valid


# --------------------------------------------- concordance index


def test_concordance_index_matches_brute_force(spark):
    import random

    from etl_spark_gradle_spark.operators.evaluation import (
        concordance_index,
    )

    random.seed(61)
    rows = []
    for _ in range(400):
        s = random.randint(0, 9)
        t = max(1, int(random.expovariate((s + 1) / 20.0)))
        rows.append((min(t, 60), 1 if random.random() < 0.7 else 0, s))
    rows += [(None, 1, 1), (5, None, 1), (5, 1, None)]
    df = spark.createDataFrame(
        rows, "dur int, ev int, score int"
    ).repartition(4)
    r = concordance_index(df, "dur", "ev", "score").collect()[0]
    clean = [p for p in rows if None not in p]
    P = conc = disc = tied = 0
    for ta, ea, sa in clean:
        if not ea:
            continue
        for tb, _, sb in clean:
            if ta < tb:
                P += 1
                if sa > sb:
                    conc += 1
                elif sa < sb:
                    disc += 1
                else:
                    tied += 1
    assert r["n"] == len(clean)
    assert (int(r["comparable"]), int(r["concordant"]),
            int(r["discordant"]), int(r["tied_score"])) == (
        P, conc, disc, P - conc - disc)
    assert r["c_index"] == pytest.approx(
        (2 * conc + tied) / (2 * P), abs=1e-15
    )
    # a risk score that drives shorter durations discriminates
    assert r["c_index"] > 0.65
    # perfect inverse ordering -> C = 1 exactly; reversed score -> 1-C
    perf = [(10 - s, 1, s) for s in range(10) for _ in range(5)]
    pdf = spark.createDataFrame(perf, "dur int, ev int, score int")
    assert concordance_index(pdf, "dur", "ev", "score").collect()[0][
        "c_index"
    ] == 1.0
    rev = [(t, e, -s) for t, e, s in clean]
    rdf = spark.createDataFrame(rev, "dur int, ev int, score int")
    assert concordance_index(rdf, "dur", "ev", "score").collect()[0][
        "c_index"
    ] == pytest.approx(1 - r["c_index"], abs=1e-15)
    # all censored -> zero comparable pairs -> NULL C
    cens = spark.createDataFrame(
        [(5, 0, 1), (7, 0, 2)], "dur int, ev int, score int"
    )
    rc = concordance_index(cens, "dur", "ev", "score").collect()[0]
    assert rc["comparable"] == "0" and rc["c_index"] is None
    # no-censoring binary-time frame: C equals Mann-Whitney AUC of
    # score vs (dur == early) -- the textbook reduction
    from etl_spark_gradle_spark.operators.evaluation import auc

    bin_rows = [(1 if random.random() < 0.5 else 2,
                 1, random.randint(0, 99)) for _ in range(300)]
    bdf = spark.createDataFrame(bin_rows, "dur int, ev int, score int")
    c = concordance_index(bdf, "dur", "ev", "score").collect()[0][
        "c_index"
    ]
    a = auc(
        bdf.selectExpr("CAST(score AS DOUBLE) score",
                       "CAST(dur = 1 AS INT) label"),
        "score", "label",
    ).collect()[0]["auc"]
    assert c == pytest.approx(a, abs=1e-12)


def test_concordance_index_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame(
        [(1, 1, 0.5)], "dur int, ev int, risk double"
    )
    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = _cfg("evaluation", operation="concordance_index",
              durationColumn="dur", eventColumn="ev",
              scoreColumn="risk")
    assert t.validate(df, ok).is_valid
    out = t.transform(df, ok, None)
    assert out.columns == ["n", "n_events", "comparable", "concordant",
                           "discordant", "tied_score", "c_index"]
    for bad in (
        _cfg("evaluation", operation="concordance_index",
             durationColumn="dur", eventColumn="ev"),
        _cfg("evaluation", operation="concordance_index",
             durationColumn="dur", eventColumn="ev",
             scoreColumn="risk", groupBy="dur"),
    ):
        assert not t.validate(df, bad).is_valid


# ------------------------------------------------ cochran-armitage


def test_cochran_armitage_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import cochran_armitage

    random.seed(67)
    rows = [(d, 1 if random.random() < 0.1 + 0.05 * d else 0)
            for d in range(10) for _ in range(200)]
    rows += [(None, 1), (3, None)]
    df = spark.createDataFrame(rows, "dose int, flag int").repartition(4)
    r = cochran_armitage(df, "dose", "flag").collect()[0]
    clean = [p for p in rows if None not in p]
    N = len(clean)
    R = sum(f for _, f in clean)
    sn = sum(d for d, _ in clean)
    sr = sum(d for d, f in clean if f)
    s2n = sum(d * d for d, _ in clean)
    A = N * sr - R * sn
    z = A * math.sqrt(N) / math.sqrt(R * (N - R) * (N * s2n - sn * sn))
    assert (r["n"], r["r_pos"], r["k_levels"]) == (N, R, 10)
    assert float(r["t_num"]) == A
    assert r["z_trend"] == pytest.approx(z, abs=1e-12)
    # matches the textbook unscaled form too
    num = sr - R * sn / N
    var = (R / N) * (1 - R / N) * (s2n - sn * sn / N)
    assert r["z_trend"] == pytest.approx(num / math.sqrt(var), abs=1e-9)
    # a real dose-response reads far from 0; H0 stays near 0
    assert r["z_trend"] > 5.0
    h0 = [(d, 1 if random.random() < 0.3 else 0)
          for d in range(10) for _ in range(300)]
    zh = cochran_armitage(
        spark.createDataFrame(h0, "dose int, flag int"), "dose", "flag"
    ).collect()[0]["z_trend"]
    assert abs(zh) < 3.0
    # decreasing trend -> negative z
    dec = [(d, 1 if random.random() < 0.6 - 0.05 * d else 0)
           for d in range(10) for _ in range(200)]
    assert cochran_armitage(
        spark.createDataFrame(dec, "dose int, flag int"), "dose", "flag"
    ).collect()[0]["z_trend"] < -5.0
    # degenerate: all positive / single level -> NULL z
    for dg in ([(d, 1) for d in range(3) for _ in range(5)],
               [(2, 1 if i % 2 else 0) for i in range(10)]):
        assert cochran_armitage(
            spark.createDataFrame(dg, "dose int, flag int"),
            "dose", "flag",
        ).collect()[0]["z_trend"] is None
    # non-numeric dose -> clean error
    bad = spark.createDataFrame([("a", 1)], "dose string, flag int")
    with pytest.raises(TransformationError, match="numeric"):
        cochran_armitage(bad, "dose", "flag")


def test_cochran_armitage_grouped_and_adapter(spark):
    import random

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.stats import cochran_armitage

    random.seed(71)
    rows = []
    for g, slope in (("up", 0.06), ("flat", 0.0)):
        for d in range(8):
            for _ in range(150):
                rows.append(
                    (g, d, 1 if random.random() < 0.2 + slope * d else 0)
                )
    df = spark.createDataFrame(rows, "g string, dose int, flag int")
    out = {r["g"]: r for r in cochran_armitage(
        df, "dose", "flag", group_by=["g"]).collect()}
    assert out["up"]["z_trend"] > 4.0
    assert abs(out["flat"]["z_trend"]) < 3.0
    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="cochran_armitage", doseColumn="dose",
              flagColumn="flag", groupBy="g")
    assert t.validate(df, ok).is_valid
    res = t.transform(df, ok, None)
    assert res.columns == ["g", "n", "r_pos", "k_levels", "t_num",
                           "z_trend", "p_value"]
    for bad in (
        _cfg("stats", operation="cochran_armitage", doseColumn="dose"),
        _cfg("stats", operation="cochran_armitage", doseColumn="nope",
             flagColumn="flag"),
    ):
        assert not t.validate(df, bad).is_valid


# ------------------------------------------------ mantel-haenszel


def _py_mh(rows):
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])
    for e, o, st in rows:
        idx = 0 if (e and o) else 1 if e else 2 if o else 3
        cells[str(st)][idx] += 1
    se = sv = sad = sbc = 0.0
    sa = nn = 0
    for st in sorted(cells):
        a, b, c, d = cells[st]
        n = a + b + c + d
        sa += a
        nn += n
        se += (a + b) * (a + c) / n
        if n > 1:
            sv += (a + b) * (c + d) * (a + c) * (b + d) / (
                n * n * (n - 1)
            )
        sad += a * d / n
        sbc += b * c / n
    dev = max(0.0, abs(sa - se) - 0.5)
    return (nn, len(cells), sa,
            sad / sbc if sbc > 0 else None,
            dev * dev / sv if sv > 0 else None)


def test_mantel_haenszel_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import mantel_haenszel

    random.seed(73)
    rows = []
    for st in range(5):
        base = 0.1 + 0.1 * st
        for _ in range(500):
            e = random.randint(0, 1)
            p = base * 2 / (1 + base) if e else base
            rows.append((e, 1 if random.random() < p else 0,
                         "s%d" % st))
    rows += [(None, 1, "s0"), (1, None, "s0"), (1, 1, None)]
    df = spark.createDataFrame(
        rows, "e int, o int, st string"
    ).repartition(4)
    clean = [p for p in rows if None not in p]
    r = mantel_haenszel(df, "e", "o", "st").collect()[0]
    n, k, sa, orr, chi2 = _py_mh(clean)
    assert (r["n"], r["k_strata"], r["sum_a"]) == (n, k, sa)
    assert r["or_mh"] == pytest.approx(orr, abs=1e-12)
    assert r["cmh_chi2"] == pytest.approx(chi2, abs=1e-9)
    # the planted within-stratum odds ratio of 2 is recovered and the
    # association is overwhelmingly significant
    assert 1.6 < r["or_mh"] < 2.5
    assert r["cmh_chi2"] > 10.0
    # Simpson guard: a confounded design where the POOLED 2x2 flips
    # (exposure concentrated in the high-base stratum, no within-
    # stratum effect) must read OR ~= 1 and chi2 small
    conf = []
    for st, (base, p_exp) in enumerate(((0.1, 0.9), (0.6, 0.1))):
        for _ in range(800):
            e = 1 if random.random() < p_exp else 0
            conf.append((e, 1 if random.random() < base else 0,
                         "c%d" % st))
    rc = mantel_haenszel(
        spark.createDataFrame(conf, "e int, o int, st string"),
        "e", "o", "st",
    ).collect()[0]
    assert 0.6 < rc["or_mh"] < 1.6
    assert rc["cmh_chi2"] < 7.0
    # pooled naive OR on the same data is badly confounded (far < 1)
    a = sum(1 for e, o, _ in conf if e and o)
    b = sum(1 for e, o, _ in conf if e and not o)
    c = sum(1 for e, o, _ in conf if not e and o)
    d = sum(1 for e, o, _ in conf if not e and not o)
    assert (a * d) / (b * c) < 0.5
    # degenerate: single-member strata only -> sv = 0 -> NULL chi2
    degen = spark.createDataFrame(
        [(1, 1, "a"), (0, 0, "b")], "e int, o int, st string"
    )
    rd = mantel_haenszel(degen, "e", "o", "st").collect()[0]
    assert rd["cmh_chi2"] is None


def test_mantel_haenszel_grouped_and_adapter(spark):
    import random

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.stats import mantel_haenszel

    random.seed(79)
    rows = []
    for g in ("x", "y"):
        for st in ("a", "b"):
            for _ in range(300):
                e = random.randint(0, 1)
                p = 0.5 if (g == "x" and e) else 0.25
                rows.append(
                    (g, e, 1 if random.random() < p else 0, st)
                )
    df = spark.createDataFrame(rows, "g string, e int, o int, st string")
    out = {r["g"]: r for r in mantel_haenszel(
        df, "e", "o", "st", group_by=["g"]).collect()}
    for g in ("x", "y"):
        sub = [(e, o, st) for gg, e, o, st in rows if gg == g]
        n, k, sa, orr, chi2 = _py_mh(sub)
        assert out[g]["or_mh"] == pytest.approx(orr, abs=1e-12)
        assert out[g]["cmh_chi2"] == pytest.approx(chi2, abs=1e-9)
    assert out["x"]["cmh_chi2"] > out["y"]["cmh_chi2"]
    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="mantel_haenszel", exposureColumn="e",
              outcomeColumn="o", stratumColumn="st", groupBy="g")
    assert t.validate(df, ok).is_valid
    res = t.transform(df, ok, None)
    assert res.columns == ["g", "n", "k_strata", "sum_a", "or_mh",
                           "cmh_chi2", "p_value"]
    for bad in (
        _cfg("stats", operation="mantel_haenszel", exposureColumn="e",
             outcomeColumn="o"),
        _cfg("stats", operation="mantel_haenszel", exposureColumn="e",
             outcomeColumn="o", stratumColumn="nope"),
    ):
        assert not t.validate(df, bad).is_valid


# -------------------------------------------------------- tf-idf


def test_tfidf_top_terms_matches_pure_python(spark):
    from etl_spark_gradle_spark.operators.retrieval import (
        tfidf_top_terms,
    )

    docs = [
        (1, "apple banana apple cherry the the"),
        (2, "banana cherry cherry date the"),
        (3, "apple date date date the"),
        (4, "eel the the"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    # pure python with the operator's quantized-idf semantics
    from collections import Counter

    N = len(docs)
    tfs = {i: Counter(t.lower().split()) for i, t in docs}
    dfs = Counter(term for c in tfs.values() for term in c)
    expect = {}
    for i, c in tfs.items():
        scored = sorted(
            (
                (-c[t] * round(math.log(N / dfs[t]) * 1e9), t)
                for t in c
            ),
        )[:2]
        expect[i] = [(t, -sq) for sq, t in scored]
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"], r["tfidf"])
        )
    for i, exp in expect.items():
        rows = sorted(got[i])
        assert [t for _, t, *_ in rows] == [t for t, _ in exp]
        for (rank, term, tf, dfc, tfidf), (eterm, esq) in zip(rows, exp):
            assert tf == tfs[i][term] and dfc == dfs[term]
            assert tfidf == pytest.approx(esq / 1e9, abs=1e-12)
    # 'the' appears in every doc -> idf 0 -> never outranks a real
    # keyword; max_df_frac removes it entirely
    filtered = tfidf_top_terms(
        df, "doc_id", "text", k=5, max_df_frac=0.9
    ).collect()
    assert all(r["term"] != "the" for r in filtered)
    # min_df prunes hapax ('eel'); doc 4 then has no rankable term
    pruned = tfidf_top_terms(df, "doc_id", "text", k=5, min_df=2)
    assert pruned.where("term = 'eel'").count() == 0
    # validation
    for kwargs in ({"k": 0}, {"min_df": 0}, {"max_df_frac": 1.5}):
        with pytest.raises(TransformationError):
            tfidf_top_terms(df, "doc_id", "text", **kwargs)


def test_tfidf_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id int, text string"
    )
    t = TRANSFORMER_REGISTRY["tfidf"]
    ok = _cfg("tfidf", idColumn="doc_id", k="2", minDf="1",
              maxDfFrac="0.9")
    assert t.validate(df, ok).is_valid
    res = t.transform(df, ok, None)
    assert res.columns == ["doc_id", "rank", "term", "tf", "df",
                           "tfidf"]
    assert res.count() <= 4
    for bad in (
        _cfg("tfidf", idColumn="doc_id", k="zero"),
        _cfg("tfidf", idColumn="doc_id", maxDfFrac="2"),
        _cfg("tfidf", textColumn="text"),
        _cfg("tfidf", idColumn="nope"),
    ):
        assert not t.validate(df, bad).is_valid


# ----------------------------------------------- poisson bootstrap


_POISSON1_T = [
    1580030168, 3160060337, 3950075421, 4213413783, 4279248373,
    4292415291, 4294609777, 4294923276, 4294962463,
]


def _py_boot(rows, B=40, alpha=0.05, salt=""):
    import hashlib

    def weight(b, rid):
        hi, slot = (b - 1) // 4, (b - 1) % 4
        h = hashlib.md5(f"boot:{hi}:{rid}{salt}".encode()).hexdigest()
        bucket = int(h[8 * slot:8 * slot + 8], 16)
        for k, t in enumerate(_POISSON1_T):
            if bucket < t:
                return k
        return 9

    from decimal import Decimal

    ms = []
    for b in range(1, B + 1):
        ws = wx = 0
        for rid, v in rows:
            w = weight(b, rid)
            ws += w
            wx += w * Decimal(str(v)).quantize(Decimal("0.01"))
        if ws > 0:
            ms.append(float(wx) / ws)
    ms.sort()
    m = len(ms)
    lo = max(1, math.ceil(m * (alpha / 2.0)))
    mean_r = sum(ms) / m
    se = math.sqrt(sum((v - mean_r) ** 2 for v in ms) / (m - 1))
    return ms[lo - 1], ms[m - lo], se, m


def test_bootstrap_ci_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import bootstrap_ci

    random.seed(83)
    rows = [(i, round(random.gauss(50, 10), 2)) for i in range(400)]
    rows += [(9999, None), (None, 5.0)]
    df = spark.createDataFrame(rows, "id int, v double").repartition(4)
    r = bootstrap_ci(df, "v", "id", replicates=40).collect()[0]
    clean = [p for p in rows if None not in p]
    lo, hi, se, m = _py_boot(clean)
    assert (r["n"], r["replicates"]) == (len(clean), m)
    mu = sum(v for _, v in clean) / len(clean)
    assert r["estimate"] == pytest.approx(mu, abs=1e-9)
    assert r["ci_lo"] == pytest.approx(lo, abs=1e-9)
    assert r["ci_hi"] == pytest.approx(hi, abs=1e-9)
    assert r["boot_se"] == pytest.approx(se, abs=1e-9)
    # the CI brackets the true mean and the bootstrap SE tracks the
    # analytic s/sqrt(n) within sampling noise
    assert r["ci_lo"] < mu < r["ci_hi"]
    sd = math.sqrt(
        sum((v - mu) ** 2 for _, v in clean) / (len(clean) - 1)
    )
    analytic = sd / math.sqrt(len(clean))
    assert 0.5 * analytic < r["boot_se"] < 2.0 * analytic
    # determinism: same salt -> identical CI; different salt -> a
    # different (valid) resample universe
    r2 = bootstrap_ci(df, "v", "id", replicates=40).collect()[0]
    assert (r2["ci_lo"], r2["ci_hi"]) == (r["ci_lo"], r["ci_hi"])
    r3 = bootstrap_ci(df, "v", "id", replicates=40,
                      salt="other").collect()[0]
    assert (r3["ci_lo"], r3["ci_hi"]) != (r["ci_lo"], r["ci_hi"])
    assert r3["ci_lo"] < mu < r3["ci_hi"]
    # validation
    for kwargs in ({"replicates": 4}, {"replicates": 500},
                   {"alpha": 0.0}, {"alpha": 0.7}):
        with pytest.raises(TransformationError):
            bootstrap_ci(df, "v", "id", **kwargs)


def test_bootstrap_ci_grouped_and_adapter(spark):
    import random

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.stats import bootstrap_ci

    random.seed(89)
    rows = [("a" if i % 2 else "b", i,
             round(random.gauss(10 if i % 2 else 30, 3), 2))
            for i in range(600)]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    out = {r["g"]: r for r in bootstrap_ci(
        df, "v", "id", replicates=24, group_by=["g"]).collect()}
    for g, mu in (("a", 10), ("b", 30)):
        sub = [(i, v) for gg, i, v in rows if gg == g]
        lo, hi, se, m = _py_boot(sub, B=24)
        assert out[g]["ci_lo"] == pytest.approx(lo, abs=1e-9)
        assert out[g]["ci_hi"] == pytest.approx(hi, abs=1e-9)
        assert out[g]["ci_lo"] < mu + 1 and out[g]["ci_hi"] > mu - 1
    # the two groups' intervals are disjoint
    assert out["a"]["ci_hi"] < out["b"]["ci_lo"]
    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="bootstrap_ci", valueColumn="v",
              idColumn="id", replicates="24", alpha="0.1", groupBy="g")
    assert t.validate(df, ok).is_valid
    res = t.transform(df, ok, None)
    assert res.columns == ["g", "n", "replicates", "estimate",
                           "boot_se", "ci_lo", "ci_hi"]
    for bad in (
        _cfg("stats", operation="bootstrap_ci", valueColumn="v"),
        _cfg("stats", operation="bootstrap_ci", valueColumn="v",
             idColumn="id", replicates="4"),
        _cfg("stats", operation="bootstrap_ci", valueColumn="v",
             idColumn="id", alpha="0.9"),
    ):
        assert not t.validate(df, bad).is_valid


# ---------------------------------------------- randomization test


def test_permutation_test_matches_pure_python(spark):
    import hashlib
    import random

    from etl_spark_gradle_spark.operators.stats import permutation_test

    random.seed(97)
    rows = [(i, "a" if i % 2 else "b",
             round(random.gauss(10 if i % 2 else 11, 3), 2))
            for i in range(600)]
    rows += [(None, "a", 1.0), (9001, None, 1.0), (9002, "a", None)]
    df = spark.createDataFrame(
        rows, "id int, s string, v double"
    ).repartition(4)
    r = permutation_test(df, "v", "s", "id", replicates=60).collect()[0]
    clean = [p for p in rows if None not in p]
    n_a = sum(1 for _, s, _ in clean if s == "a")
    n = len(clean)
    thr = math.floor(n_a / n * 4294967296.0)

    def coin(b, rid):
        hi, slot = (b - 1) // 4, (b - 1) % 4
        h = hashlib.md5(f"perm:{hi}:{rid}".encode()).hexdigest()
        return int(h[8 * slot:8 * slot + 8], 16) < thr

    from decimal import Decimal

    def q(v):
        return Decimal(str(v)).quantize(Decimal("0.01"))

    xa = sum(q(v) for _, s, v in clean if s == "a")
    xb = sum(q(v) for _, s, v in clean if s == "b")
    dobs = float(xa) / n_a - float(xb) / (n - n_a)
    tot = xa + xb
    ne = m = 0
    for b in range(1, 61):
        ca = sa = 0
        for rid, _, v in clean:
            if coin(b, rid):
                ca += 1
                sa += q(v)
        if 0 < ca < n:
            m += 1
            d_b = float(sa) / ca - float(tot - sa) / (n - ca)
            if abs(d_b) >= abs(dobs):
                ne += 1
    assert (r["n_a"], r["n_b"]) == (n_a, n - n_a)
    assert (r["replicates"], r["n_extreme"]) == (m, ne)
    assert r["diff_obs"] == pytest.approx(dobs, abs=1e-12)
    assert r["p_value"] == pytest.approx((ne + 1) / (m + 1), abs=1e-15)
    # the planted 1-unit gap on sd=3 at n=600 is detected at the
    # test's floor p = 1/(B+1)
    assert r["p_value"] < 0.05
    # no effect -> p far from significant
    random.seed(101)
    null_rows = [(i, "a" if i % 2 else "b",
                  round(random.gauss(10, 3), 2)) for i in range(600)]
    ndf = spark.createDataFrame(null_rows, "id int, s string, v double")
    rn = permutation_test(ndf, "v", "s", "id", replicates=60).collect()[
        0
    ]
    assert rn["p_value"] > 0.1
    # >2 side values without explicit sides -> clean error; with
    # explicit sides the extra value is filtered out
    tri = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id int, s string, v double",
    )
    with pytest.raises(TransformationError, match="exactly two"):
        permutation_test(tri, "v", "s", "id")
    rt = permutation_test(
        tri, "v", "s", "id", side_a="a", side_b="b"
    ).collect()[0]
    assert (rt["n_a"], rt["n_b"]) == (1, 1)
    # validation
    for kwargs in ({"replicates": 4}, {"side_a": "a"}):
        with pytest.raises(TransformationError):
            permutation_test(df, "v", "s", "id", **kwargs)


def test_permutation_test_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id int, s string, v double"
    )
    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="permutation_test", valueColumn="v",
              sideColumn="s", idColumn="id", replicates="16")
    assert t.validate(df, ok).is_valid
    out = t.transform(df, ok, None)
    assert out.columns == ["n_a", "n_b", "replicates", "n_extreme",
                           "diff_obs", "p_value"]
    for bad in (
        _cfg("stats", operation="permutation_test", valueColumn="v",
             sideColumn="s"),
        _cfg("stats", operation="permutation_test", valueColumn="v",
             sideColumn="s", idColumn="id", replicates="4"),
        _cfg("stats", operation="permutation_test", valueColumn="v",
             sideColumn="s", idColumn="id", sideA="a"),
        _cfg("stats", operation="permutation_test", valueColumn="v",
             sideColumn="s", idColumn="id", groupBy="s"),
    ):
        assert not t.validate(df, bad).is_valid


def test_experiment_readout_pipeline_yaml(spark, sf_dir, tmp_path,
                                          monkeypatch):
    """The shipped pipelines/experiment-readout.yaml runs end-to-end:
    frame arms -> CMH stratified readout -> publishable gate ->
    parquet, and the published row matches the operator called
    directly."""
    from etl_spark_gradle_spark.operators.stats import mantel_haenszel
    from etl_spark_gradle_spark.plans.config import load_pipeline_yaml
    from etl_spark_gradle_spark.plans.executor import PipelineExecutor
    from pyspark.sql import functions as F

    out = str(tmp_path / "readout")
    monkeypatch.setenv("ORDERS_SRC", f"{sf_dir}/orders.parquet")
    monkeypatch.setenv("READOUT_OUT", out)
    cfg = load_pipeline_yaml("pipelines/experiment-readout.yaml")
    metrics = PipelineExecutor().execute(cfg, spark)
    assert metrics.records_loaded == 1
    rep = spark.read.parquet(out).collect()[0]
    direct = mantel_haenszel(
        spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            (F.col("o_totalprice") > 150000).cast("int").alias("e"),
            (F.col("o_orderstatus") == "F").cast("int").alias("o"),
            "o_orderpriority",
        ),
        "e", "o", "o_orderpriority",
    ).collect()[0]
    assert (rep["n"], rep["k_strata"], rep["sum_a"]) == (
        direct["n"], direct["k_strata"], direct["sum_a"])
    assert rep["or_mh"] == direct["or_mh"]
    assert rep["cmh_chi2"] == direct["cmh_chi2"]


# ------------------------------------------------------------ cuped


def test_cuped_matches_pure_python_and_reduces_variance(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import cuped

    random.seed(103)
    rows = []
    for i in range(2000):
        x = round(random.gauss(100, 20), 2)
        arm = "a" if i % 2 else "b"
        y = round(0.8 * x + (1.0 if arm == "a" else 0.0)
                  + random.gauss(0, 5), 2)
        rows.append((arm, x, y))
    rows += [("a", None, 1.0), ("b", 1.0, None), (None, 1.0, 1.0)]
    df = spark.createDataFrame(
        rows, "s string, x double, y double"
    ).repartition(4)
    r = cuped(df, "y", "x", "s").collect()[0]
    clean = [p for p in rows if None not in p]
    n = len(clean)
    from decimal import Decimal

    def q(v):
        return Decimal(str(v)).quantize(Decimal("0.01"))

    sy = sum(q(y) for _, _, y in clean)
    sx = sum(q(x) for _, x, _ in clean)
    sxy = sum(q(x) * q(y) for _, x, y in clean)
    sxx = sum(q(x) * q(x) for _, x, _ in clean)
    theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert r["theta"] == pytest.approx(theta, abs=1e-12)
    # the covariate carries ~90% of the outcome variance, so CUPED
    # must report a large reduction and a tighter diff than raw
    assert r["var_reduction"] > 0.8
    ya = [y for s, _, y in clean if s == "a"]
    yb = [y for s, _, y in clean if s == "b"]
    assert r["diff_raw"] == pytest.approx(
        sum(ya) / len(ya) - sum(yb) / len(yb), abs=1e-9
    )
    # unbiasedness direction check: the adjusted diff lands nearer
    # the true lift of 1.0 than the noisy raw diff in this seed
    assert abs(r["diff_cuped"] - 1.0) < abs(r["diff_raw"] - 1.0)
    assert r["t_cuped"] is not None and r["t_cuped"] > 2.0
    # zero-variance covariate -> NULL theta and derived stats
    zc = spark.createDataFrame(
        [("a", 5.0, 1.0), ("a", 5.0, 2.0), ("b", 5.0, 3.0),
         ("b", 5.0, 4.0)],
        "s string, x double, y double",
    )
    rz = cuped(zc, "y", "x", "s").collect()[0]
    assert rz["theta"] is None and rz["diff_cuped"] is None
    assert rz["diff_raw"] is not None
    # >2 sides without explicit sides -> clean error
    tri = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", 1.0, 1.0), ("c", 1.0, 1.0)],
        "s string, x double, y double",
    )
    with pytest.raises(TransformationError, match="exactly"):
        cuped(tri, "y", "x", "s")
    with pytest.raises(TransformationError, match="both"):
        cuped(df, "y", "x", "s", side_a="a")


def test_cuped_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 2.0, 3.0)],
        "s string, x double, y double",
    )
    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="cuped", valueColumn="y",
              covariateColumn="x", sideColumn="s", sideA="a",
              sideB="b")
    assert t.validate(df, ok).is_valid
    out = t.transform(df, ok, None)
    assert out.columns == ["n_a", "n_b", "theta", "diff_raw",
                           "diff_cuped", "var_reduction", "t_cuped"]
    for bad in (
        _cfg("stats", operation="cuped", valueColumn="y",
             sideColumn="s"),
        _cfg("stats", operation="cuped", valueColumn="y",
             covariateColumn="x", sideColumn="s", sideA="a"),
    ):
        assert not t.validate(df, bad).is_valid


# ------------------------------------------------- aalen-johansen


def test_aalen_johansen_matches_brute_force_and_identity(spark):
    import random
    from collections import defaultdict

    from etl_spark_gradle_spark.operators.timeseries import (
        aalen_johansen, kaplan_meier,
    )
    from pyspark.sql import functions as F

    random.seed(107)
    rows = [(random.randint(1, 40),
             random.choices([0, 1, 2], [0.3, 0.4, 0.3])[0])
            for _ in range(500)]
    rows += [(None, 1), (5, None)]
    df = spark.createDataFrame(rows, "dur int, cause int").repartition(4)
    out = aalen_johansen(df, "dur", "cause").collect()
    clean = [p for p in rows if None not in p]
    # brute-force AJ with the operator's quantization
    ts = sorted(set(t for t, _ in clean))
    sprev_q = 1.0
    cum_lq = 0
    cif_q = defaultdict(int)
    expect = {}
    for u in ts:
        nu = sum(1 for t, _ in clean if t >= u)
        du = sum(1 for t, k in clean if t == u and k != 0)
        for k in (1, 2):
            dk = sum(1 for t, kk in clean if t == u and kk == k)
            if dk:
                cif_q[k] += round(sprev_q * (dk / nu) * 1e9)
                expect[(u, str(k))] = (nu, dk, sprev_q,
                                       round(cif_q[k] / 1e9, 9))
        if du and du < nu:
            cum_lq += round(math.log(1.0 - du / nu) * 1e9)
        sprev_q = round(math.exp(cum_lq / 1e9), 9)
    assert len(out) == len(expect)
    for r in out:
        nu, dk, sp, cif = expect[(r["t"], r["cause"])]
        assert (r["n_risk"], r["n_event"]) == (nu, dk)
        assert r["surv_before"] == pytest.approx(sp, abs=1e-9)
        assert r["cif"] == pytest.approx(cif, abs=1e-9)
    # the defining identity: sum_k CIF_k(t_max) + S(t_max) = 1 (every
    # subject either failed by some cause or survives/censored)
    km = kaplan_meier(
        df.where("dur IS NOT NULL AND cause IS NOT NULL").select(
            "dur", (F.col("cause") != 0).cast("int").alias("ev")
        ),
        "dur", "ev",
    ).collect()
    s_last = max(km, key=lambda r: r["t"])["survival"]
    last_cif = {}
    for r in out:
        last_cif[r["cause"]] = r["cif"]
    assert s_last + sum(last_cif.values()) == pytest.approx(
        1.0, abs=1e-7
    )
    # monotone nondecreasing CIF per cause, bounded by 1
    by_cause = defaultdict(list)
    for r in sorted(out, key=lambda r: (r["cause"], r["t"])):
        by_cause[r["cause"]].append(r["cif"])
    for cifs in by_cause.values():
        assert all(a <= b + 1e-12 for a, b in zip(cifs, cifs[1:]))
        assert cifs[-1] <= 1.0  # clamped: CIF is a probability
    # naive cause-specific 1-KM OVERSTATES incidence (the reason AJ
    # exists): compare cause 1's CIF vs 1 - KM treating cause 2 as
    # censoring
    km1 = kaplan_meier(
        df.where("dur IS NOT NULL AND cause IS NOT NULL").select(
            "dur", (F.col("cause") == 1).cast("int").alias("ev")
        ),
        "dur", "ev",
    ).collect()
    naive_1 = 1.0 - max(km1, key=lambda r: r["t"])["survival"]
    assert naive_1 > last_cif["1"]


def test_aalen_johansen_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2)], "dur int, cause int"
    )
    t = TRANSFORMER_REGISTRY["kaplan_meier"]
    ok = _cfg("kaplan_meier", estimator="aalen_johansen",
              durationColumn="dur", causeColumn="cause")
    assert t.validate(df, ok).is_valid
    out = t.transform(df, ok, None)
    assert out.columns == ["t", "cause", "n_risk", "n_event",
                           "surv_before", "cif"]
    for bad in (
        _cfg("kaplan_meier", estimator="aalen_johansen",
             durationColumn="dur"),
        _cfg("kaplan_meier", estimator="aalen_johansen",
             durationColumn="dur", causeColumn="cause", groupBy="dur"),
        _cfg("kaplan_meier", estimator="nope", durationColumn="dur",
             eventColumn="cause"),
    ):
        assert not t.validate(df, bad).is_valid


# ------------------------------------------------------ ratio test


def _py_ratio_arm(sub):
    n = len(sub)
    sy = sum(y for y, _ in sub)
    sx = sum(x for _, x in sub)
    R = sy / sx
    xb = sx / n
    vy = (sum(y * y for y, _ in sub) - sy * sy / n) / (n - 1)
    vx = (sum(x * x for _, x in sub) - sx * sx / n) / (n - 1)
    cxy = (sum(x * y for y, x in sub) - sx * sy / n) / (n - 1)
    return R, (vy - 2 * R * cxy + R * R * vx) / (n * xb * xb)


def test_ratio_ttest_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import ratio_ttest

    random.seed(109)
    rows = []
    for i in range(2000):
        arm = "a" if i % 2 else "b"
        sessions = float(max(1, int(random.expovariate(0.2))))
        rps = 2.0 + (0.3 if arm == "a" else 0.0) + random.gauss(0, 0.5)
        rows.append((arm, round(max(0.0, sessions * rps), 2), sessions))
    rows += [("a", None, 1.0), ("b", 1.0, None), (None, 1.0, 1.0)]
    df = spark.createDataFrame(
        rows, "s string, rev double, sess double"
    ).repartition(4)
    r = ratio_ttest(df, "rev", "sess", "s").collect()[0]
    clean = [p for p in rows if None not in p]
    ra, va = _py_ratio_arm([(y, x) for s, y, x in clean if s == "a"])
    rb, vb = _py_ratio_arm([(y, x) for s, y, x in clean if s == "b"])
    assert r["ratio_a"] == pytest.approx(ra, abs=1e-9)
    assert r["ratio_b"] == pytest.approx(rb, abs=1e-9)
    assert r["se"] == pytest.approx(math.sqrt(va + vb), abs=1e-9)
    assert r["t_stat"] == pytest.approx(
        (ra - rb) / math.sqrt(va + vb), abs=1e-6
    )
    # the planted 0.3 revenue-per-session lift is detected loudly
    assert r["t_stat"] > 4.0
    # the delta-method SE is WIDER than the naive per-unit-ratio SE
    # pretends when units are heterogeneous... sanity: t is finite and
    # the ratio diff is near the planted lift
    assert 0.1 < r["diff"] < 0.5
    # degenerate: zero denominators on a side -> NULL ratio/t
    degen = spark.createDataFrame(
        [("a", 1.0, 0.0), ("a", 2.0, 0.0), ("b", 1.0, 1.0),
         ("b", 2.0, 2.0)],
        "s string, rev double, sess double",
    )
    rd = ratio_ttest(degen, "rev", "sess", "s").collect()[0]
    assert rd["ratio_a"] is None and rd["t_stat"] is None
    assert rd["ratio_b"] is not None
    # side validation
    with pytest.raises(TransformationError, match="both"):
        ratio_ttest(df, "rev", "sess", "s", side_a="a")


def test_ratio_ttest_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", 2.0, 2.0)],
        "s string, rev double, sess double",
    )
    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="ratio_ttest", numeratorColumn="rev",
              denominatorColumn="sess", sideColumn="s")
    assert t.validate(df, ok).is_valid
    out = t.transform(df, ok, None)
    assert out.columns == ["n_a", "n_b", "ratio_a", "ratio_b", "diff",
                           "se", "t_stat"]
    for bad in (
        _cfg("stats", operation="ratio_ttest", numeratorColumn="rev",
             sideColumn="s"),
        _cfg("stats", operation="ratio_ttest", numeratorColumn="rev",
             denominatorColumn="sess", sideColumn="s", sideA="a"),
    ):
        assert not t.validate(df, bad).is_valid


# ------------------------------------- hypothesis property batch


def test_drift_family_dominance_properties(spark):
    """Structural identities across the drift family on arbitrary
    integer samples: D_KS <= V_Kuiper <= 2*D_KS, energy <= 2*W1,
    and CvM invariance under any strictly increasing transform
    (rank-based)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_spark_gradle_spark.operators.stats import (
        cramer_von_mises_drift, energy_distance_drift, ks_drift,
        kuiper_drift, wasserstein_drift,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=15), min_size=3,
                 max_size=40),
        st.lists(st.integers(min_value=0, max_value=15), min_size=3,
                 max_size=40),
    )
    def check(xs, ys):
        da = spark.createDataFrame([(float(v),) for v in xs],
                                   "v double")
        db = spark.createDataFrame([(float(v),) for v in ys],
                                   "v double")
        d = ks_drift(da, db, "v").collect()[0]["ks_d"]
        v = kuiper_drift(da, db, "v").collect()[0]["kuiper_v"]
        assert d - 1e-12 <= v <= 2 * d + 1e-12
        w1 = wasserstein_drift(da, db, "v").collect()[0]["w1"]
        en = energy_distance_drift(da, db, "v").collect()[0]["energy"]
        assert en <= 2 * w1 + 1e-6
        # CvM is rank-based: x -> 2x + 7 leaves it exactly unchanged
        t = cramer_von_mises_drift(da, db, "v").collect()[0]["cvm_t"]
        da2 = da.selectExpr("v * 2 + 7 AS v")
        db2 = db.selectExpr("v * 2 + 7 AS v")
        t2 = cramer_von_mises_drift(da2, db2, "v").collect()[0][
            "cvm_t"
        ]
        assert t == t2

    check()


def test_pettitt_monotone_transform_invariance(spark):
    """Pettitt is rank-based: any strictly increasing transform of
    the VALUES leaves K, U, and the changepoint location exactly
    unchanged (the property a mean-based detector cannot have)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_spark_gradle_spark.operators.stats import pettitt_test

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(min_value=-20, max_value=20), min_size=4,
                 max_size=60),
    )
    def check(vs):
        rows = [(float(i), float(v)) for i, v in enumerate(vs)]
        df = spark.createDataFrame(rows, "t double, v double")
        base = pettitt_test(df, "t", "v").collect()[0]
        # exp is strictly increasing; cube preserves order for all
        # reals including negatives
        for expr in ("EXP(v / 10.0)", "v * v * v"):
            tr = pettitt_test(
                df.selectExpr("t", f"{expr} AS v"), "t", "v"
            ).collect()[0]
            assert tr["k_num"] == base["k_num"]
            assert tr["u_num"] == base["u_num"]
            assert tr["change_at"] == base["change_at"]

    check()


def test_bootstrap_ci_alpha_nesting(spark):
    """Order-statistic CIs nest: a 99% interval contains the 80%
    interval computed from the SAME replicate universe."""
    import random

    from etl_spark_gradle_spark.operators.stats import bootstrap_ci

    random.seed(113)
    rows = [(i, round(random.gauss(0, 1), 2)) for i in range(300)]
    df = spark.createDataFrame(rows, "id int, v double")
    wide = bootstrap_ci(df, "v", "id", replicates=48,
                        alpha=0.01).collect()[0]
    narrow = bootstrap_ci(df, "v", "id", replicates=48,
                          alpha=0.2).collect()[0]
    assert wide["ci_lo"] <= narrow["ci_lo"]
    assert narrow["ci_hi"] <= wide["ci_hi"]
    assert wide["estimate"] == narrow["estimate"]
    assert wide["boot_se"] == narrow["boot_se"]


# --------------------------------------------------------- fdr_by


def test_fdr_by_matches_pure_python_and_is_stricter(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import fdr_bh

    random.seed(127)
    # 60 planted signals among 400 uniforms
    ps = [round(random.random() * 0.0005, 6) for _ in range(60)]
    ps += [round(random.random(), 6) for _ in range(340)]
    rows = [(i, p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "id int, p double").repartition(4)
    by = {r["id"]: r for r in
          fdr_bh(df, "p", "id", q=0.05, method="by").collect()}
    bh = {r["id"]: r for r in
          fdr_bh(df, "p", "id", q=0.05, method="bh").collect()}
    # pure python BY with the operator's quantized harmonic constant
    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    m = len(ranked)
    hq = sum(round(1e9 / r) for r in range(1, m + 1))
    c = hq / 1e9
    k = 0
    for r, (_, p) in enumerate(ranked, start=1):
        if p * m * c <= r * 0.05:
            k = r
    expect = {rid for r, (rid, _) in enumerate(ranked, start=1)
              if r <= k}
    got = {rid for rid, row in by.items() if row["significant"]}
    assert got == expect
    # BY is uniformly stricter than BH (c(m) > 1): its discovery set
    # is a subset, and on this planted design both still discover
    bh_set = {rid for rid, row in bh.items() if row["significant"]}
    assert got <= bh_set
    assert len(got) >= 30
    assert len(bh_set) > len(got) or bh_set == got
    # invalid method -> clean error
    with pytest.raises(TransformationError, match="bh|by"):
        fdr_bh(df, "p", "id", method="bonferroni")
    # adapter
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["stats"]
    ok = _cfg("stats", operation="fdr_bh", pColumn="p", idColumn="id",
              method="by")
    assert t.validate(df, ok).is_valid
    bad = _cfg("stats", operation="fdr_bh", pColumn="p",
               idColumn="id", method="holm")
    assert not t.validate(df, bad).is_valid
    # plan: the ranked scan stays _pid-partitioned (no global window)
    assert _unpartitioned_windows(
        fdr_bh(df, "p", "id", method="by")
    ) <= 1


# ---------------------------------------------------- bland-altman


def test_bland_altman_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.evaluation import bland_altman

    random.seed(131)
    rows = []
    for _ in range(800):
        true = random.gauss(100, 15)
        rows.append((round(true + random.gauss(0.5, 2), 2),
                     round(true + random.gauss(0, 2), 2)))
    rows += [(None, 1.0), (1.0, None)]
    df = spark.createDataFrame(rows, "a double, b double").repartition(4)
    r = bland_altman(df, "a", "b").collect()[0]
    clean = [p for p in rows if None not in p]
    ds = [round(a - b, 10) for a, b in clean]  # 2dp inputs: exact
    mu = sum(ds) / len(ds)
    sd = math.sqrt(sum((d - mu) ** 2 for d in ds) / (len(ds) - 1))
    assert r["n"] == len(clean)
    assert r["bias"] == pytest.approx(mu, abs=1e-9)
    assert r["sd_diff"] == pytest.approx(sd, abs=1e-9)
    assert r["loa_lo"] == pytest.approx(mu - 1.96 * sd, abs=1e-9)
    assert r["loa_hi"] == pytest.approx(mu + 1.96 * sd, abs=1e-9)
    # the planted +0.5 instrument bias is recovered; ~95% of the
    # differences fall inside the limits (the method's definition)
    assert 0.2 < r["bias"] < 0.8
    inside = sum(1 for d in ds if r["loa_lo"] <= d <= r["loa_hi"])
    assert inside / len(ds) > 0.93
    # correlation blindness: B = 2A correlates perfectly yet agrees
    # terribly — bias and spread both far from 0
    prop = [(a, 2 * a) for a, _ in clean]
    rp = bland_altman(
        spark.createDataFrame(prop, "a double, b double"), "a", "b"
    ).collect()[0]
    assert rp["bias"] < -50 and rp["sd_diff"] > 5
    # n = 1: bias reported, spread NULL
    one = bland_altman(
        spark.createDataFrame([(3.0, 1.0)], "a double, b double"),
        "a", "b",
    ).collect()[0]
    assert one["bias"] == 2.0 and one["sd_diff"] is None


def test_bland_altman_grouped_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.evaluation import bland_altman

    rows = [("x", 1.0, 0.0), ("x", 2.0, 1.0), ("x", 3.0, 2.0),
            ("y", 1.0, 1.5), ("y", 2.0, 2.5)]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    out = {r["g"]: r for r in
           bland_altman(df, "a", "b", group_by=["g"]).collect()}
    assert out["x"]["bias"] == pytest.approx(1.0)
    assert out["y"]["bias"] == pytest.approx(-0.5)
    assert out["x"]["sd_diff"] == pytest.approx(0.0, abs=1e-12)
    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = _cfg("evaluation", operation="bland_altman",
              measureAColumn="a", measureBColumn="b", groupBy="g")
    assert t.validate(df, ok).is_valid
    res = t.transform(df, ok, None)
    assert res.columns == ["g", "n", "bias", "sd_diff", "loa_lo",
                           "loa_hi"]
    bad = _cfg("evaluation", operation="bland_altman",
               measureAColumn="a")
    assert not t.validate(df, bad).is_valid


# ------------------------------------- review-finding regressions


def test_weighted_kappa_numeric_spine_survives_ten_levels(spark):
    """Review finding: a lexicographic spine wedges '10' between '1'
    and '2' on a 0-10 scale, silently corrupting every weight. The
    numeric-first ordering must rank by VALUE."""
    import random

    from etl_spark_gradle_spark.operators.evaluation import (
        weighted_kappa,
    )

    random.seed(137)
    rows = []
    for _ in range(400):
        a = random.randint(0, 12)
        b = min(12, max(0, a + random.choice([-1, 0, 0, 1, 4])))
        rows.append((a, b))
    # force every level present so the spine covers 0..12
    rows += [(k, k) for k in range(13)]
    df = spark.createDataFrame(rows, "a int, b int")
    r = weighted_kappa(df, "a", "b").collect()[0]
    wo, we, k = _py_weighted_kappa(rows, True)
    assert (int(r["wo_num"]), int(r["we_num"])) == (wo, we)
    assert r["kappa_w"] == pytest.approx(k, abs=1e-15)
    # a (0, 12) disagreement must weigh 144x a (0, 1) one: plant a
    # single far miss and check wo moves by exactly 144 - the
    # lexicographic bug would weigh it (rank gap)^2 with '10','11',
    # '12' mis-ranked
    df2 = spark.createDataFrame(rows + [(0, 12)], "a int, b int")
    r2 = weighted_kappa(df2, "a", "b").collect()[0]
    assert int(r2["wo_num"]) - int(r["wo_num"]) * (r["n"] + 1) // r[
        "n"
    ] != 0  # sanity: wo_num scales with n; exact check below
    # exact: recompute reference
    wo2, we2, k2 = _py_weighted_kappa(rows + [(0, 12)], True)
    assert int(r2["wo_num"]) == wo2 and int(r2["we_num"]) == we2
    # mixed numeric + alpha labels: numbers first by value, then text
    mixed = spark.createDataFrame(
        [("2", "2"), ("10", "10"), ("fail", "fail"), ("2", "10"),
         ("10", "fail")],
        "a string, b string",
    )
    rm = weighted_kappa(mixed, "a", "b", weights="linear").collect()[0]
    womx, wemx, kmx = _py_weighted_kappa(
        [("2", "2"), ("10", "10"), ("fail", "fail"), ("2", "10"),
         ("10", "fail")], False)
    assert int(rm["wo_num"]) == womx and int(rm["we_num"]) == wemx


def test_mantel_haenszel_truthy_codes_cannot_go_negative(spark):
    """Review finding: a 1/2-coded arm produced negative cells under
    the plain int cast. Truthy semantics: any nonzero = exposed."""
    from etl_spark_gradle_spark.operators.stats import mantel_haenszel

    rows = [(2, 1, "s"), (2, 0, "s"), (0, 1, "s"), (0, 0, "s")] * 5
    r = mantel_haenszel(
        spark.createDataFrame(rows, "e int, o int, st string"),
        "e", "o", "st",
    ).collect()[0]
    # 2 is truthy -> identical to 1/0 coding
    ref = mantel_haenszel(
        spark.createDataFrame(
            [(1, o, st) if e else (0, o, st) for e, o, st in rows],
            "e int, o int, st string",
        ),
        "e", "o", "st",
    ).collect()[0]
    assert (r["n"], r["sum_a"], r["or_mh"], r["cmh_chi2"]) == (
        ref["n"], ref["sum_a"], ref["or_mh"], ref["cmh_chi2"])
    assert r["n"] == len(rows)  # no negative-cell shrinkage


def test_permutation_test_empty_input_reports_zero_counts(spark):
    """Review finding: max() over an empty base returned NULL counts,
    contradicting the 'NULL everywhere but the counts' contract."""
    from etl_spark_gradle_spark.operators.stats import permutation_test

    df = spark.createDataFrame(
        [(None, "a", 1.0), (1, None, 1.0)], "id int, s string, v double"
    )
    r = permutation_test(df, "v", "s", "id", side_a="a",
                         side_b="b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (0, 0)
    assert r["p_value"] is None and r["diff_obs"] is None


def test_two_arm_ops_reject_equal_sides(spark):
    """Review finding: permutation_test silently NULLed on equal
    sides where every sibling raises; all three new two-arm ops now
    share _two_sides."""
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.stats import (
        cuped, permutation_test, ratio_ttest,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.0, 2.0), (2, "b", 2.0, 3.0)],
        "id int, s string, x double, y double",
    )
    for fn, args in (
        (permutation_test, ("y", "s", "id")),
        (cuped, ("y", "x", "s")),
        (ratio_ttest, ("y", "x", "s")),
    ):
        with pytest.raises(TransformationError, match="must differ"):
            fn(df, *args, side_a="a", side_b="a")
    t = TRANSFORMER_REGISTRY["stats"]
    for cfg in (
        _cfg("stats", operation="permutation_test", valueColumn="y",
             sideColumn="s", idColumn="id", sideA="a", sideB="a"),
        _cfg("stats", operation="cuped", valueColumn="y",
             covariateColumn="x", sideColumn="s", sideA="a",
             sideB="a"),
        _cfg("stats", operation="ratio_ttest", numeratorColumn="y",
             denominatorColumn="x", sideColumn="s", sideA="a",
             sideB="a"),
    ):
        assert not t.validate(df, cfg).is_valid
