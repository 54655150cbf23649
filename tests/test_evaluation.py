"""Model-evaluation operators vs hand-computed / pure-Python references."""

from __future__ import annotations

import pytest

from etl_spark_gradle_spark.operators.evaluation import (
    auc,
    classification_report,
    cohens_kappa,
    lift_table,
)
from etl_spark_gradle_spark.operators.relational import TransformationError


def _py_auc(pairs):
    """Pure-python Mann-Whitney AUC with average ranks for ties."""
    pairs = sorted(pairs)  # by score asc
    ranks: dict[int, float] = {}
    i = 0
    rank_sum_pos = 0.0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        avg_rank = (i + 1 + j) / 2.0  # ranks are 1-based i+1 .. j
        for kk in range(i, j):
            if pairs[kk][1]:
                rank_sum_pos += avg_rank
        i = j
    np_ = sum(1 for _, l in pairs if l)
    nn = len(pairs) - np_
    if np_ == 0 or nn == 0:
        return None
    return (rank_sum_pos - np_ * (np_ + 1) / 2.0) / (np_ * nn)


def test_auc_matches_pure_python_with_ties(spark):
    pairs = [
        (0.1, 0), (0.1, 1), (0.2, 0), (0.35, 0), (0.35, 1), (0.35, 1),
        (0.5, 0), (0.8, 1), (0.8, 0), (0.9, 1), (0.9, 1), (0.95, 0),
    ]
    df = spark.createDataFrame(
        [(s, l) for s, l in pairs], "score double, label int"
    )
    row = auc(df, "score", "label").collect()[0]
    assert row["n"] == 12 and row["n_pos"] == 6 and row["n_neg"] == 6
    assert row["auc"] == pytest.approx(_py_auc(pairs), abs=1e-12)


def test_auc_groups_and_degenerate(spark):
    df = spark.createDataFrame(
        [("g1", 0.2, 0), ("g1", 0.7, 1), ("g1", 0.5, 1),
         ("g2", 0.3, 1), ("g2", 0.9, 1),          # all positive
         ("g3", 0.4, None), ("g3", None, 1), ("g3", 0.1, 0), ("g3", 0.6, 1)],
        "g string, score double, label int",
    )
    rows = {r["g"]: r for r in auc(df, "score", "label", ["g"]).collect()}
    assert rows["g1"]["auc"] == pytest.approx(1.0)  # perfect separation
    assert rows["g2"]["auc"] is None                # no negatives
    assert rows["g3"]["n"] == 2                     # nulls excluded
    assert rows["g3"]["auc"] == pytest.approx(1.0)


def test_classification_report_hand_computed(spark):
    # labels: a,a,a,b,b,c ; preds: a,b,a,b,b,a  (c never predicted,
    # and nothing is labeled d but d is predicted once)
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "b"),
         ("c", "a"), ("x", None), (None, "a"), ("d_lbl", "d")],
        "label string, pred string",
    )
    rows = {r["class"]: r for r in
            classification_report(df, "label", "pred").collect()}
    a = rows["a"]
    assert (a["tp"], a["fp"], a["fn"]) == (2, 1, 1)
    assert a["precision"] == pytest.approx(2 / 3)
    assert a["recall"] == pytest.approx(2 / 3)
    assert a["f1"] == pytest.approx(2 * 2 / (2 * 2 + 1 + 1))
    b = rows["b"]
    assert (b["tp"], b["fp"], b["fn"]) == (2, 1, 0)
    assert b["recall"] == pytest.approx(1.0)
    c = rows["c"]  # never predicted: precision undefined, recall 0
    assert (c["tp"], c["fp"], c["fn"]) == (0, 0, 1)
    assert c["precision"] is None and c["recall"] == 0.0 and c["f1"] == 0.0
    d = rows["d"]  # predicted but never labeled
    assert (d["tp"], d["fp"], d["fn"]) == (0, 1, 0)
    assert d["recall"] is None
    assert "x" not in {r for r in rows if rows[r]["fn"] > 0 and rows[r]["tp"] > 0}


def test_lift_table_exact(spark):
    # 8 rows, 4 buckets of 2; positives concentrated at high scores
    rows = [(i, 1.0 - i * 0.1, 1 if i < 3 else 0) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    out = {r["bucket"]: r for r in
           lift_table(df, "score", "label", "id", buckets=4).collect()}
    assert [out[b]["n"] for b in (1, 2, 3, 4)] == [2, 2, 2, 2]
    assert [out[b]["n_pos"] for b in (1, 2, 3, 4)] == [2, 1, 0, 0]
    # base rate = 3/8; bucket1 cum_rate = 1.0 -> lift = 8/3
    assert out[1]["lift"] == pytest.approx((2 * 8) / (2 * 3))
    assert out[2]["cum_pos"] == 3 and out[2]["cum_n"] == 4
    assert out[2]["lift"] == pytest.approx((3 * 8) / (4 * 3))
    assert out[4]["lift"] == pytest.approx(1.0)  # full-capture lift is 1
    # deterministic tie-break: equal scores split by id, stable reruns
    tie = spark.createDataFrame(
        [(i, 0.5, i % 2) for i in range(10)], "id long, score double, label int"
    )
    a = sorted(map(tuple, lift_table(tie, "score", "label", "id", 5).collect()))
    b = sorted(map(tuple, lift_table(tie, "score", "label", "id", 5).collect()))
    assert a == b


def test_cohens_kappa_textbook(spark):
    # classic 2x2: raters agree on 20 yes + 15 no of 50; marginals
    # yes: A=25, B=30 -> pe = (25*30 + 25*20)/2500 = 0.5, po = 0.7,
    # kappa = 0.4
    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15
        + [("y", "n")] * 5 + [("n", "y")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 50 and r["agree"] == 35
    assert r["po"] == pytest.approx(0.7)
    assert r["pe"] == pytest.approx(0.5)
    assert r["kappa"] == pytest.approx(0.4)


def test_cohens_kappa_degenerate_and_nulls(spark):
    df = spark.createDataFrame(
        [("g1", "y", "y"), ("g1", "y", "y"),      # chance == n^2
         ("g2", "y", "y"), ("g2", "n", "n"), ("g2", None, "y")],
        "g string, a string, b string",
    )
    rows = {r["g"]: r for r in cohens_kappa(df, "a", "b", ["g"]).collect()}
    assert rows["g1"]["kappa"] is None  # zero expected disagreement
    assert rows["g2"]["n"] == 2         # null rater excluded
    assert rows["g2"]["kappa"] == pytest.approx(1.0)


def test_evaluation_adapter_routes_and_validation(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame(
        [(1, 0.9, 1, "a", "a"), (2, 0.1, 0, "b", "a")],
        "id long, score double, label int, la string, lb string",
    )
    t = TRANSFORMER_REGISTRY["evaluation"]
    out = t.transform(
        df,
        TransformationConfig(
            type="evaluation",
            options={"operation": "auc", "scoreColumn": "score",
                     "labelColumn": "label"},
        ),
        None,
    )
    assert out.collect()[0]["auc"] == pytest.approx(1.0)
    for op, opts in [
        ("classification_report",
         {"labelColumn": "la", "predictionColumn": "lb"}),
        ("lift_table",
         {"scoreColumn": "score", "labelColumn": "label",
          "idColumn": "id", "buckets": "2"}),
        ("cohens_kappa", {"raterAColumn": "la", "raterBColumn": "lb"}),
    ]:
        cfg = TransformationConfig(
            type="evaluation", options={"operation": op, **opts}
        )
        assert t.validate(df, cfg).is_valid
        assert t.transform(df, cfg, None).count() >= 1
    bad = TransformationConfig(
        type="evaluation", options={"operation": "nope"}
    )
    assert not t.validate(df, bad).is_valid
    with pytest.raises(TransformationError, match="evaluation"):
        t.transform(df, bad, None)
    missing = TransformationConfig(
        type="evaluation",
        options={"operation": "auc", "scoreColumn": "absent",
                 "labelColumn": "label"},
    )
    assert not t.validate(df, missing).is_valid


def test_lift_table_matches_native_ntile_and_stays_distributed(spark):
    """The scale rewrite (literal-bounds two-level rank + closed-form
    NTILE) must EQUAL Spark's native ntile window on a tie-heavy
    fixture at every bucket count, while the executed plan contains
    no single-partition ntile window (the ecdf rule: an unpartitioned
    Window funnels the table through one task)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [(i, float((i * 7) % 13), (i * 3) % 2) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    for b in (1, 3, 7, 10, 499, 500, 501):
        got = {
            r["bucket"]: (r["n"], r["n_pos"])
            for r in lift_table(df, "score", "label", "id", buckets=b)
            .collect()
        }
        native = (
            df.withColumn(
                "bucket",
                F.ntile(b).over(
                    W.orderBy(F.col("score").desc(), F.col("id").asc())
                ),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("label").cast("long").alias("n_pos"),
            )
        )
        want = {r["bucket"]: (r["n"], r["n_pos"]) for r in native.collect()}
        assert got == want, f"buckets={b}"
    plan = lift_table(df, "score", "label", "id", 10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ntile(" not in plan
    assert "hashpartitioning(_pid" in plan


def _py_pav(pairs):
    """Pure-python PAV over (n, pos) bins -> iso rate per bin index."""
    pools = []
    for b, (n, p) in enumerate(pairs):
        pools.append([[b], n, p])
        while len(pools) >= 2 and pools[-2][2] * pools[-1][1] > \
                pools[-1][2] * pools[-2][1]:
            bs, n2, p2 = pools.pop()
            pools[-1][0] += bs
            pools[-1][1] += n2
            pools[-1][2] += p2
    out = {}
    for bs, n, p in pools:
        for b in bs:
            out[b] = p / n
    return out


def test_isotonic_calibration_hand_computed(spark):
    from etl_spark_gradle_spark.operators.evaluation import (
        isotonic_calibration,
    )

    # 4 bins with a violation: rates .8, .2, .5, .9 -> bins 0..2 pool
    # when needed; PAV: [.8], [.2] violates -> pool(0,1)=.5; then .5
    # vs .5 ok (not strict); final: .5 .5 .5 .9
    rows = []
    spec = [(0.1, 10, 8), (0.3, 10, 2), (0.6, 10, 5), (0.9, 10, 9)]
    for center, n, p in spec:
        rows += [(center, 1)] * p + [(center, 0)] * (n - p)
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r["bin"]: r for r in
           isotonic_calibration(df, "score", "label", bins=4).collect()}
    assert [out[b]["rate_raw"] for b in range(4)] == [0.8, 0.2, 0.5, 0.9]
    want = _py_pav([(10, 8), (10, 2), (10, 5), (10, 9)])
    got = {b: out[b]["rate_iso"] for b in out}
    assert got == want
    # monotone nondecreasing by construction
    iso = [out[b]["rate_iso"] for b in sorted(out)]
    assert all(a <= b for a, b in zip(iso, iso[1:]))
    # mass preserved: sum n*iso == total positives (PAV invariant)
    assert sum(out[b]["n"] * out[b]["rate_iso"] for b in out) == \
        pytest.approx(sum(p for _, _, p in spec))


def test_isotonic_calibration_edges_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.evaluation import (
        isotonic_calibration,
    )
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    # out-of-range scores clamp to edge bins; nulls excluded
    df = spark.createDataFrame(
        [(-5.0, 0), (0.05, 1), (99.0, 1), (None, 1), (0.5, None)],
        "score double, label int",
    )
    out = {r["bin"]: r for r in
           isotonic_calibration(df, "score", "label", bins=10).collect()}
    assert set(out) == {0, 9}
    assert out[0]["n"] == 2 and out[9]["n"] == 1
    # already-monotone input is untouched
    mono = spark.createDataFrame(
        [(0.1, 0), (0.1, 0), (0.9, 1), (0.9, 1)], "score double, label int"
    )
    m = {r["bin"]: r for r in
         isotonic_calibration(mono, "score", "label", bins=2).collect()}
    assert m[0]["rate_iso"] == 0.0 and m[1]["rate_iso"] == 1.0
    t = TRANSFORMER_REGISTRY["evaluation"]
    cfg = TransformationConfig(
        type="evaluation",
        options={"operation": "isotonic", "scoreColumn": "score",
                 "labelColumn": "label", "bins": "2"},
    )
    assert t.validate(mono, cfg).is_valid
    assert t.transform(mono, cfg, None).count() == 2
    # empty input keeps the declared schema
    empty = spark.createDataFrame([], "score double, label int")
    e = isotonic_calibration(empty, "score", "label")
    assert e.count() == 0 and "rate_iso" in e.columns


def test_regression_metrics_hand_computed(spark):
    from etl_spark_gradle_spark.operators.evaluation import (
        regression_metrics,
    )

    # y: 1,2,3,4 ; p: 1,1,4,6 -> e = 0,1,-1,-2
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 4.0), (4.0, 6.0), (None, 9.0)],
        "y double, p double",
    )
    r = regression_metrics(df, "y", "p").collect()[0]
    assert r["n"] == 4
    assert r["mae"] == pytest.approx(4 / 4)
    assert r["mse"] == pytest.approx(6 / 4)
    assert r["rmse"] == pytest.approx((6 / 4) ** 0.5)
    assert r["bias"] == pytest.approx(-2 / 4)
    # SS_tot = sum (y - 2.5)^2 = 5 ; r2 = 1 - 6/5
    assert r["r2"] == pytest.approx(1 - 6 / 5)

    # perfect prediction per group; constant-target group -> NULL r2
    g = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 5.0, 5.0), ("b", 3.0, 2.0),
         ("b", 3.0, 4.0)],
        "g string, y double, p double",
    )
    rows = {r["g"]: r for r in
            regression_metrics(g, "y", "p", ["g"]).collect()}
    assert rows["a"]["mse"] == 0.0 and rows["a"]["r2"] == 1.0
    assert rows["b"]["r2"] is None  # zero target variance
    assert rows["b"]["mae"] == pytest.approx(1.0)

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    t = TRANSFORMER_REGISTRY["evaluation"]
    cfg = TransformationConfig(
        type="evaluation",
        options={"operation": "regression_metrics", "labelColumn": "y",
                 "predictionColumn": "p", "groupBy": "g"},
    )
    assert t.validate(g, cfg).is_valid
    assert t.transform(g, cfg, None).count() == 2


def _unpartitioned_windows(df) -> int:
    """Count Window nodes with an empty partition spec in the optimized
    logical plan (mirrors tools/plan_audit.unpartitioned_window_count)."""
    import json

    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    return sum(
        1 for nd in nodes
        if nd.get("class", "").endswith(".Window")
        and not nd.get("partitionSpec")
    )


def test_auc_ungrouped_continuous_scores_distributed(spark):
    """VERDICT r9 ask #2: ungrouped auc with CONTINUOUS (near-unique)
    scores must ride the two-level prefix-sum scan, not a data-sized
    single-partition window, and still match pure python exactly."""
    import random

    random.seed(42)
    pairs = [(random.random(), random.randint(0, 1)) for _ in range(800)]
    pairs += [(0.5, l) for l in (1, 0, 1, 1, 0)]  # a tie knot
    df = spark.createDataFrame(pairs, "score double, label int").repartition(8)
    d = auc(df, "score", "label")
    row = d.collect()[0]
    assert row["auc"] == pytest.approx(_py_auc(pairs), abs=1e-12)
    # the only unpartitioned Window allowed is _prefix_sums' bounded
    # <=P-row offsets table; the data-sized cumulative window must be
    # partitioned on _pid (visible as hashpartitioning in the plan)
    assert _unpartitioned_windows(d) <= 1
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        d.explain("formatted")
    assert "hashpartitioning(_pid" in buf.getvalue()


def test_unpartitioned_window_detector_fires_on_bad_plan(spark):
    """Deliberately-bad fixture (VERDICT r9 ask #3): a raw global
    row_number must trip the detector the battery rule is built on."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    assert _unpartitioned_windows(df) == 1
    good = spark.range(100).withColumn(
        "r",
        F.row_number().over(Window.partitionBy("id").orderBy("id")),
    )
    assert _unpartitioned_windows(good) == 0


def _py_brier_ece(pairs, bins=20, lo=0.0, hi=1.0):
    """Pure-python reference with the same exactness contract:
    decimal(18,2) quantization, exact per-bin |sum_p - pos| gaps,
    one final division each."""
    from decimal import ROUND_HALF_UP, Decimal

    width = (hi - lo) / bins
    cells: dict[int, list] = {}
    q = lambda v: Decimal(repr(v)).quantize(
        Decimal("0.01"), rounding=ROUND_HALF_UP
    )
    n = 0
    sqe = Decimal(0)
    for s, y in pairs:
        if s is None or y is None:
            continue
        n += 1
        b = min(max(int((s - lo) // width), 0), bins - 1)
        p = q(s)
        sqe += (p - y) * (p - y)
        c = cells.setdefault(b, [Decimal(0), 0])
        c[0] += p
        c[1] += y
    gap = sum(abs(sp - pos) for sp, pos in cells.values())
    return (
        n,
        len(cells),
        float(sqe) / n if n else None,
        float(gap) / n if n else None,
    )


def test_brier_ece_hand_computed(spark):
    from etl_spark_gradle_spark.operators.evaluation import brier_ece

    # 2 bins on [0,1): bin0 gets p=.2,.2 y=0,1 ; bin1 p=.8,.9 y=1,1
    # brier = (.04 + .64 + .04 + .01)/4 ; ece = (|.4-1| + |1.7-2|)/4
    df = spark.createDataFrame(
        [(0.2, 0), (0.2, 1), (0.8, 1), (0.9, 1), (None, 1), (0.5, None)],
        "score double, label int",
    )
    r = brier_ece(df, "score", "label", bins=2).collect()[0]
    assert r["n"] == 4 and r["n_bins"] == 2
    assert r["brier"] == pytest.approx(0.73 / 4, abs=1e-15)
    assert r["ece"] == pytest.approx(0.9 / 4, abs=1e-15)
    # perfectly calibrated on-grid forecast: ece == 0
    cal = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (1.0, 1)], "score double, label int"
    )
    rc = brier_ece(cal, "score", "label", bins=2).collect()[0]
    assert rc["ece"] == 0.0


def test_brier_ece_matches_pure_python(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_spark_gradle_spark.operators.evaluation import brier_ece

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=100),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=1,
            max_size=120,
        ),
        st.integers(min_value=1, max_value=7),
    )
    def check(raw, bins):
        pairs = [(k / 100.0, y) for k, y in raw]  # on the 2dp grid
        df = spark.createDataFrame(pairs, "score double, label int")
        r = brier_ece(df, "score", "label", bins=bins).collect()[0]
        n, nb, brier, ece = _py_brier_ece(pairs, bins=bins)
        assert r["n"] == n and r["n_bins"] == nb
        assert r["brier"] == pytest.approx(brier, abs=1e-12)
        assert r["ece"] == pytest.approx(ece, abs=1e-12)

    check()


def test_brier_ece_groups_and_adapter_validation(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.evaluation import brier_ece
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    g = spark.createDataFrame(
        [("a", 0.2, 0), ("a", 0.8, 1), ("b", 0.4, 1)],
        "g string, score double, label int",
    )
    rows = {r["g"]: r for r in
            brier_ece(g, "score", "label", bins=2, group_by=["g"]).collect()}
    assert rows["a"]["n"] == 2 and rows["b"]["n"] == 1
    assert rows["b"]["brier"] == pytest.approx(0.36, abs=1e-15)
    assert rows["b"]["ece"] == pytest.approx(0.6, abs=1e-15)

    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = TransformationConfig(
        type="evaluation",
        options={"operation": "brier_ece", "scoreColumn": "score",
                 "labelColumn": "label", "bins": "2", "groupBy": "g"},
    )
    assert t.validate(g, ok).is_valid
    assert t.transform(g, ok, None).count() == 2
    # ADVICE r9: bins/lo/hi validated cleanly; isotonic rejects groupBy
    bad_bins = TransformationConfig(
        type="evaluation",
        options={"operation": "brier_ece", "scoreColumn": "score",
                 "labelColumn": "label", "bins": "zero"},
    )
    assert not t.validate(g, bad_bins).is_valid
    bad_range = TransformationConfig(
        type="evaluation",
        options={"operation": "brier_ece", "scoreColumn": "score",
                 "labelColumn": "label", "lo": "1.0", "hi": "0.5"},
    )
    assert not t.validate(g, bad_range).is_valid
    iso_grouped = TransformationConfig(
        type="evaluation",
        options={"operation": "isotonic", "scoreColumn": "score",
                 "labelColumn": "label", "groupBy": "g"},
    )
    res = t.validate(g, iso_grouped)
    assert not res.is_valid and "groupBy" in "; ".join(res.errors)
    with pytest.raises(TransformationError):
        brier_ece(g, "score", "label", bins=0)
    with pytest.raises(TransformationError):
        brier_ece(g, "score", "label", lo=2.0, hi=1.0)


def _py_ndcg(items, k):
    import math

    model = sorted(items, key=lambda t: (-t[0], t[1]))[:k]
    ideal = sorted(items, key=lambda t: (-t[2], t[1]))[:k]
    dcg = sum(g / math.log2(r + 2) for r, (_, _, g) in enumerate(model))
    idcg = sum(g / math.log2(r + 2) for r, (_, _, g) in enumerate(ideal))
    return dcg, idcg, (dcg / idcg if idcg > 0 else None)


def test_ndcg_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.evaluation import ndcg

    random.seed(5)
    rows = [(q, i, random.random(), random.randint(0, 3))
            for q in range(6) for i in range(15)]
    rows += [(9, 0, 0.5, 0), (9, 1, 0.9, 0)]  # all-zero relevance query
    df = spark.createDataFrame(rows, "q int, item int, score double, rel int")
    out = {r["q"]: r for r in
           ndcg(df, "q", "score", "rel", k=5, id_col="item").collect()}
    for q in range(6):
        items = [(s, i, g) for (qq, i, s, g) in rows if qq == q]
        dcg, idcg, nd = _py_ndcg(items, 5)
        assert out[q]["n_items"] == 15
        assert out[q]["dcg"] == pytest.approx(dcg, abs=1e-9)
        assert out[q]["ndcg"] == pytest.approx(nd, abs=1e-9)
    # zero-relevance query: NULL ndcg, not 0
    assert out[9]["ndcg"] is None
    # k larger than the list degrades to full-list NDCG
    full = {r["q"]: r for r in
            ndcg(df, "q", "score", "rel", k=99, id_col="item").collect()}
    items = [(s, i, g) for (qq, i, s, g) in rows if qq == 0]
    assert full[0]["ndcg"] == pytest.approx(
        _py_ndcg(items, 99)[2], abs=1e-9
    )
    with pytest.raises(TransformationError):
        ndcg(df, "q", "score", "rel", k=0)


def test_ndcg_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame(
        [(1, 1, 0.9, 2), (1, 2, 0.5, 3)],
        "q int, item int, score double, rel int",
    )
    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = TransformationConfig(
        type="evaluation",
        options={"operation": "ndcg", "queryColumn": "q",
                 "scoreColumn": "score", "relevanceColumn": "rel",
                 "k": "1", "idColumn": "item"},
    )
    assert t.validate(df, ok).is_valid
    row = t.transform(df, ok, None).collect()[0]
    # model top-1 = item 1 (rel 2); ideal top-1 = item 2 (rel 3)
    assert row["ndcg"] == pytest.approx(2 / 3, abs=1e-9)
    bad = TransformationConfig(
        type="evaluation",
        options={"operation": "ndcg", "queryColumn": "q",
                 "scoreColumn": "score", "relevanceColumn": "rel",
                 "k": "zero"},
    )
    assert not t.validate(df, bad).is_valid


def test_pr_curve_matches_pure_python(spark):
    import random

    from etl_spark_gradle_spark.operators.evaluation import pr_curve

    random.seed(9)
    rows = [(round(random.random(), 2), random.randint(0, 1))
            for _ in range(500)]
    rows += [(0.5, 1), (0.5, 0), (None, 1), (0.3, None)]
    df = spark.createDataFrame(rows, "score double, label int").repartition(4)
    out = {r["threshold"]: r for r in
           pr_curve(df, "score", "label").collect()}
    clean = [(s, l) for s, l in rows if s is not None and l is not None]
    P = sum(l for _, l in clean)
    assert set(out) == set(s for s, _ in clean)
    for t in sorted(set(s for s, _ in clean)):
        tp = sum(l for s, l in clean if s >= t)
        above = sum(1 for s, _ in clean if s >= t)
        r = out[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, above - tp, P - tp)
        assert r["precision"] == pytest.approx(tp / above, abs=1e-15)
        assert r["recall"] == pytest.approx(tp / P, abs=1e-15)
    # recall is monotone nonincreasing in threshold; max recall is 1
    rs = [out[t]["recall"] for t in sorted(out)]
    assert all(a >= b for a, b in zip(rs, rs[1:]))
    assert out[min(out)]["recall"] == 1.0
    # distributed: no unpartitioned window beyond the bounded
    # _prefix_sums offsets table
    assert _unpartitioned_windows(pr_curve(df, "score", "label")) <= 1


def _py_average_precision(pairs):
    """Pure-python step-interpolated AP over (score, label) pairs."""
    clean = [(s, l) for s, l in pairs if s is not None and l is not None]
    P = sum(l for _, l in clean)
    if P == 0:
        return None
    total = 0.0
    for t in sorted(set(s for s, _ in clean), reverse=True):
        pos_t = sum(l for s, l in clean if s == t)
        if pos_t == 0:
            continue
        tp = sum(l for s, l in clean if s >= t)
        above = sum(1 for s, _ in clean if s >= t)
        total += pos_t * tp / above
    return total / P


def test_average_precision_matches_pure_python_ungrouped(spark):
    """VERDICT r10 ask #3: AP as the step-interpolated close over the
    pr_curve prefix sums — ungrouped continuous scores must ride the
    distributed two-level scan, not a global window."""
    import random

    from etl_spark_gradle_spark.operators.evaluation import (
        average_precision,
    )

    random.seed(17)
    rows = [(random.random(), random.randint(0, 1)) for _ in range(700)]
    rows += [(0.5, 1), (0.5, 0), (0.5, 1), (None, 1), (0.3, None)]
    df = spark.createDataFrame(rows, "score double, label int").repartition(8)
    d = average_precision(df, "score", "label")
    r = d.collect()[0]
    clean = [(s, l) for s, l in rows if s is not None and l is not None]
    assert r["n"] == len(clean)
    assert r["n_pos"] == sum(l for _, l in clean)
    # nano-quantization error is bounded by 0.5e-9 per distinct score
    assert r["average_precision"] == pytest.approx(
        _py_average_precision(rows), abs=1e-6
    )
    # plan shape: only _prefix_sums' bounded offsets window is global;
    # the data-sized cumulative window partitions on _pid
    assert _unpartitioned_windows(d) <= 1
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        d.explain("formatted")
    assert "hashpartitioning(_pid" in buf.getvalue()


def test_average_precision_property_vs_pure_python(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_spark_gradle_spark.operators.evaluation import (
        average_precision,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=1,
            max_size=80,
        )
    )
    def check(raw):
        pairs = [(k / 30.0, y) for k, y in raw]  # dense tie grid
        df = spark.createDataFrame(pairs, "score double, label int")
        r = average_precision(df, "score", "label").collect()[0]
        expect = _py_average_precision(pairs)
        if expect is None:
            assert r["average_precision"] is None
        else:
            assert r["average_precision"] == pytest.approx(expect, abs=1e-7)
            # AP of a ranking is in (0, 1]
            assert 0.0 < r["average_precision"] <= 1.0 + 1e-12

    check()


def test_average_precision_grouped_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.evaluation import (
        average_precision,
    )
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    rows = [
        ("a", 0.9, 1), ("a", 0.8, 0), ("a", 0.7, 1), ("a", 0.2, 0),
        ("b", 0.6, 0), ("b", 0.4, 0),  # no positives -> NULL
        ("c", 0.5, 1),                  # perfect single -> 1.0
    ]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    out = {r["g"]: r for r in
           average_precision(df, "score", "label", ["g"]).collect()}
    a = [(s, l) for g, s, l in rows if g == "a"]
    assert out["a"]["average_precision"] == pytest.approx(
        _py_average_precision(a), abs=1e-9
    )
    assert out["b"]["average_precision"] is None
    assert out["c"]["average_precision"] == pytest.approx(1.0, abs=1e-12)
    # grouped path: the cumulative window partitions on the group key
    assert _unpartitioned_windows(
        average_precision(df, "score", "label", ["g"])
    ) == 0

    t = TRANSFORMER_REGISTRY["evaluation"]
    ok = TransformationConfig(
        type="evaluation",
        options={"operation": "average_precision", "scoreColumn": "score",
                 "labelColumn": "label", "groupBy": "g"},
    )
    assert t.validate(df, ok).is_valid
    got = {r["g"]: r for r in t.transform(df, ok, None).collect()}
    assert got["c"]["average_precision"] == pytest.approx(1.0, abs=1e-12)
    bad = TransformationConfig(
        type="evaluation",
        options={"operation": "average_precision", "scoreColumn": "nope",
                 "labelColumn": "label"},
    )
    assert not t.validate(df, bad).is_valid
