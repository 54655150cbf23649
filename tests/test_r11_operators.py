"""Round-11 operators: chi_square / mcnemar_test / brown_forsythe
(stats), ewma / kaplan_meier (timeseries), zipf_fit (corpus),
with_readability (text) — each vs a pure-python reference, plus the
registry adapters' validate-cleanly contracts."""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import pytest

from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.operators.stats import (
    brown_forsythe,
    chi_square,
    mcnemar_test,
)
from etl_spark_gradle_spark.operators.timeseries import ewma, kaplan_meier
from etl_spark_gradle_spark.plans.config import TransformationConfig


def _cfg(type_, **options):
    return TransformationConfig(type=type_, options=options)


# ---------------------------------------------------------------------------
# chi_square
# ---------------------------------------------------------------------------


def test_chi_square_matches_python(spark):
    rows = (
        [("a", "x")] * 20 + [("a", "y")] * 10 + [("b", "x")] * 5
        + [("b", "y")] * 25 + [("c", "x")] * 12 + [("c", "y")] * 8
    )
    df = spark.createDataFrame(rows, "u string, v string")
    out = chi_square(df, "u", "v").collect()[0]
    cells = Counter(rows)
    xs = sorted({r[0] for r in rows})
    ys = sorted({r[1] for r in rows})
    n = len(rows)
    rt = {x: sum(cells[(x, y)] for y in ys) for x in xs}
    ct = {y: sum(cells[(x, y)] for x in xs) for y in ys}
    ref = sum(
        (cells.get((x, y), 0) - rt[x] * ct[y] / n) ** 2
        / (rt[x] * ct[y] / n)
        for x in xs
        for y in ys
    )
    assert out["n"] == n and out["n_rows"] == 3 and out["n_cols"] == 2
    assert out["dof"] == 2
    assert abs(out["chi2"] - ref) < 1e-9
    assert abs(
        out["cramers_v"] - math.sqrt(ref / (n * 1))
    ) < 1e-12


def test_chi_square_includes_zero_cells_and_degenerates(spark):
    # (a, y) never observed -> its term is e_ay, not skipped
    rows = [("a", "x")] * 4 + [("b", "x")] * 2 + [("b", "y")] * 2
    df = spark.createDataFrame(rows, "u string, v string")
    out = chi_square(df, "u", "v").collect()[0]
    n = 8
    rt = {"a": 4, "b": 4}
    ct = {"x": 6, "y": 2}
    ref = sum(
        (Counter(rows).get((x, y), 0) - rt[x] * ct[y] / n) ** 2
        / (rt[x] * ct[y] / n)
        for x in rt
        for y in ct
    )
    assert abs(out["chi2"] - ref) < 1e-12
    # single-column y -> NULL statistic, counts still reported
    deg = chi_square(
        spark.createDataFrame(
            [("a", "x"), ("b", "x")], "u string, v string"
        ),
        "u",
        "v",
    ).collect()[0]
    assert deg["chi2"] is None and deg["cramers_v"] is None
    assert deg["n_rows"] == 2 and deg["n_cols"] == 1
    with pytest.raises(TransformationError):
        chi_square(df, "u", "missing")


def test_chi_square_grouped_and_null_rows(spark):
    rows = [
        ("g1", "a", "x"), ("g1", "a", "y"), ("g1", "b", "x"),
        ("g1", "b", "y"), ("g1", "a", "x"),
        ("g2", "a", "x"), ("g2", "b", "y"), ("g2", "a", "x"),
        ("g2", "b", "y"),
        ("g1", None, "x"), ("g1", "a", None),  # excluded
    ]
    df = spark.createDataFrame(rows, "g string, u string, v string")
    out = {r["g"]: r for r in
           chi_square(df, "u", "v", group_by=["g"]).collect()}
    assert set(out) == {"g1", "g2"}
    assert out["g1"]["n"] == 5 and out["g2"]["n"] == 4
    # g2 is perfectly associated: chi2 = n, V = 1
    assert abs(out["g2"]["chi2"] - 4.0) < 1e-12
    assert abs(out["g2"]["cramers_v"] - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# mcnemar_test
# ---------------------------------------------------------------------------


def test_mcnemar_matches_formula(spark):
    rows = [(1, 1)] * 30 + [(1, 0)] * 8 + [(0, 1)] * 3 + [(0, 0)] * 10
    df = spark.createDataFrame(rows, "a int, b int")
    m = mcnemar_test(df, "a", "b").collect()[0]
    assert (m["n00"], m["n01"], m["n10"], m["n11"]) == (10, 3, 8, 30)
    assert m["n"] == 51
    assert abs(m["chi2_mcnemar"] - (abs(8 - 3) - 1) ** 2 / 11) < 1e-12
    m2 = mcnemar_test(df, "a", "b", correction=False).collect()[0]
    assert abs(m2["chi2_mcnemar"] - 25 / 11) < 1e-12
    # no discordant pairs -> NULL
    conc = spark.createDataFrame([(1, 1), (0, 0)], "a int, b int")
    assert mcnemar_test(conc, "a", "b").collect()[0]["chi2_mcnemar"] is None


def test_mcnemar_null_flags_excluded_and_boolean_inputs(spark):
    df = spark.createDataFrame(
        [(True, False), (True, None), (None, True), (False, True)],
        "a boolean, b boolean",
    )
    m = mcnemar_test(df, "a", "b").collect()[0]
    assert m["n"] == 2 and m["n10"] == 1 and m["n01"] == 1


# ---------------------------------------------------------------------------
# brown_forsythe
# ---------------------------------------------------------------------------


def _bf_python(data):
    def lower_median(vals):
        s = sorted(vals)
        return s[max(1, math.ceil(0.5 * len(s))) - 1]

    groups = {}
    for lvl, x in data:
        groups.setdefault(lvl, []).append(x)
    devs = []
    for lvl, vals in groups.items():
        med = lower_median(vals)
        devs += [(lvl, round(abs(x - med), 2)) for x in vals]
    k, n = len(groups), len(devs)
    per = {
        lvl: [d for l2, d in devs if l2 == lvl] for lvl in groups
    }
    gsum = sum(d for _, d in devs)
    gsq = sum(d * d for _, d in devs)
    fold = sum(sum(v) ** 2 / len(v) for v in per.values())
    ssb = fold - gsum**2 / n
    ssw = gsq - fold
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_brown_forsythe_matches_python(spark):
    random.seed(11)
    data = (
        [("g1", round(random.gauss(10, 1), 2)) for _ in range(50)]
        + [("g2", round(random.gauss(10, 5), 2)) for _ in range(50)]
        + [("g3", round(random.gauss(10, 1), 2)) for _ in range(50)]
    )
    df = spark.createDataFrame(data, "lvl string, x double")
    out = brown_forsythe(df, "x", "lvl").collect()[0]
    assert out["n"] == 150 and out["k_levels"] == 3
    assert abs(out["f_stat"] - _bf_python(data)) < 1e-6
    # heteroscedastic by construction -> clearly significant W
    assert out["f_stat"] > 10


def test_brown_forsythe_grouped(spark):
    random.seed(12)
    data = [
        (g, lvl, round(random.gauss(5, 1 if lvl == "a" else 3), 2))
        for g in ("p", "q")
        for lvl in ("a", "b")
        for _ in range(30)
    ]
    df = spark.createDataFrame(data, "g string, lvl string, x double")
    out = {r["g"]: r for r in
           brown_forsythe(df, "x", "lvl", group_by=["g"]).collect()}
    for g in ("p", "q"):
        ref = _bf_python([(l, x) for g2, l, x in data if g2 == g])
        assert abs(out[g]["f_stat"] - ref) < 1e-6


# ---------------------------------------------------------------------------
# ewma
# ---------------------------------------------------------------------------


def test_ewma_matches_sequential_fold(spark):
    data = [("k1", i, float((i * 37) % 11)) for i in range(1, 40)] + [
        ("k2", i, float((i * 13) % 7)) for i in range(1, 20)
    ]
    data[5] = ("k1", 6, None)  # gap carries previous state
    df = spark.createDataFrame(data, "k string, t int, x double")
    out = {
        (r["k"], r["t"]): r["sm"]
        for r in ewma(df, ["k"], "t", "x", 0.25, "sm").collect()
    }
    a, b = 0.25, 0.75
    for k in ("k1", "k2"):
        y = None
        for _, t, x in sorted(d for d in data if d[0] == k):
            if x is not None:
                y = x if y is None else a * x + b * y
            assert out[(k, t)] == y  # bit-exact, not approx
    assert len(out) == len(data)


def test_ewma_validation_and_plan(spark):
    df = spark.createDataFrame([("k", 1, 1.0)], "k string, t int, x double")
    with pytest.raises(TransformationError):
        ewma(df, [], "t", "x", 0.5)
    with pytest.raises(TransformationError):
        ewma(df, ["k"], "t", "x", 0.0)
    with pytest.raises(TransformationError):
        ewma(df, ["k"], "t", "x", 1.5)
    with pytest.raises(TransformationError):
        ewma(df, ["k"], "missing", "x", 0.5)
    # the plan is the sanctioned Arrow escape hatch, never row python
    plan = (
        ewma(df, ["k"], "t", "x", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_ewma_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["ewma"]
    df = spark.createDataFrame(
        [("k", 1, 2.0), ("k", 2, 4.0)], "k string, t int, x double"
    )
    res = t.validate(df, _cfg("ewma", keyColumns="k", timeColumn="t",
                              valueColumn="x", alpha="bad"))
    assert not res.is_valid and any("alpha" in e for e in res.errors)
    res = t.validate(df, _cfg("ewma", keyColumns="k", timeColumn="t",
                              valueColumn="x", alpha="2"))
    assert not res.is_valid
    out = t.transform(
        df,
        _cfg("ewma", keyColumns="k", timeColumn="t", valueColumn="x",
             alpha="0.5", outputColumn="s"),
        None,
    ).collect()
    got = {r["t"]: r["s"] for r in out}
    assert got == {1: 2.0, 2: 0.5 * 4.0 + 0.5 * 2.0}


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------


def _km_python(km_data):
    dd, cc = Counter(), Counter()
    for t, e in km_data:
        (dd if e else cc)[t] += 1
    times = sorted(set(dd) | set(cc))
    n = len(km_data)
    cum_rm = cum_lq = dead = 0
    exp = []
    for t in times:
        d, c = dd.get(t, 0), cc.get(t, 0)
        n_risk = n - cum_rm
        cum_rm += d + c
        if 0 < d < n_risk:
            cum_lq += round(math.log(1.0 - d / n_risk) * 1e9)
        if d >= n_risk:
            dead = 1
        s = 0.0 if dead else round(math.exp(cum_lq / 1e9), 9)
        exp.append((t, n_risk, d, c, s))
    return exp


def test_kaplan_meier_matches_python(spark):
    km_data = [(3, 1), (5, 1), (5, 0), (8, 1), (8, 1), (10, 0),
               (12, 1), (15, 0)]
    df = spark.createDataFrame(km_data, "dur int, ev int")
    got = [
        (r["t"], r["n_risk"], r["n_event"], r["n_censored"],
         r["survival"])
        for r in kaplan_meier(df, "dur", "ev").collect()
    ]
    assert got == _km_python(km_data)
    # monotone non-increasing survival
    surv = [s for *_, s in got]
    assert all(a >= b for a, b in zip(surv, surv[1:]))


def test_kaplan_meier_total_failure_pins_zero(spark):
    # everyone fails by t=4: survival exactly 0.0 from there on
    df = spark.createDataFrame(
        [(2, 1), (4, 1), (4, 1)], "dur int, ev int"
    )
    rows = kaplan_meier(df, "dur", "ev").collect()
    assert rows[-1]["survival"] == 0.0
    assert rows[0]["survival"] == round(1 - 1 / 3, 9)


def test_kaplan_meier_grouped_and_adapter(spark):
    km_data = [(3, 1), (5, 1), (5, 0), (8, 1)]
    df = spark.createDataFrame(
        [("g", t, e) for t, e in km_data] + [("h", 2, 0)],
        "grp string, dur int, ev int",
    )
    rows = kaplan_meier(df, "dur", "ev", group_by=["grp"]).collect()
    g = [(r["t"], r["survival"]) for r in rows if r["grp"] == "g"]
    assert g == [(t, s) for t, _, _, _, s in _km_python(km_data)]
    h = [(r["t"], r["n_risk"], r["survival"]) for r in rows
         if r["grp"] == "h"]
    assert h == [(2, 1, 1.0)]  # censored only: survival stays 1

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["kaplan_meier"]
    res = t.validate(df, _cfg("kaplan_meier", durationColumn="dur"))
    assert not res.is_valid
    out = t.transform(
        df,
        _cfg("kaplan_meier", durationColumn="dur", eventColumn="ev",
             groupBy="grp"),
        None,
    )
    assert out.count() == len(rows)


# ---------------------------------------------------------------------------
# zipf_fit
# ---------------------------------------------------------------------------


def test_zipf_fit_recovers_slope(spark):
    words = []
    for rnk in range(1, 60):
        words += [f"w{rnk:03d}"] * max(1, int(600 / rnk))
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    from etl_spark_gradle_spark.operators.corpus import zipf_fit

    out = zipf_fit(df, "text", min_count=1).collect()[0]
    assert out["n_types"] == 59
    assert -1.2 < out["slope"] < -0.8  # zipfian by construction
    assert out["r2"] > 0.98
    with pytest.raises(TransformationError):
        zipf_fit(df, "text", min_count=0)
    with pytest.raises(TransformationError):
        zipf_fit(df, "text", top_k=1)
    with pytest.raises(TransformationError):
        zipf_fit(df, "missing")


def test_zipf_fit_min_count_and_top_k(spark):
    df = spark.createDataFrame(
        [(1, "a a a a b b b c c d")], "doc_id long, text string"
    )
    from etl_spark_gradle_spark.operators.corpus import zipf_fit

    assert zipf_fit(df, "text", min_count=2).collect()[0]["n_types"] == 3
    assert (
        zipf_fit(df, "text", min_count=1, top_k=2).collect()[0]["n_types"]
        == 2
    )


# ---------------------------------------------------------------------------
# with_readability
# ---------------------------------------------------------------------------


def test_readability_matches_python(spark):
    from etl_spark_gradle_spark.operators.text import with_readability

    texts = [
        "The quick brown fox jumps over the lazy dog. A sunny day!",
        "Short. Very short. Yes!",
        "no terminator at all here",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = {r["id"]: r for r in with_readability(df, "text").collect()}
    for i, t in enumerate(texts):
        r = rows[i]
        if not t:
            assert r["n_words"] == 0 and r["flesch_ease"] is None
            continue
        toks = [w for w in re.split(r"\s+", t) if w]
        sents = max(len(re.findall(r"[.!?]+", t)), 1)
        syl = sum(
            max(len(re.findall(r"[aeiouy]+", w.lower())), 1)
            for w in toks
        )
        assert r["n_words"] == len(toks)
        assert r["n_sentences"] == sents
        assert r["n_syllables"] == syl
        wps, spw = len(toks) / sents, syl / len(toks)
        assert r["flesch_ease"] == 206.835 - 1.015 * wps - 84.6 * spw
        assert r["fk_grade"] == 0.39 * wps + 11.8 * spw - 15.59


def test_readability_via_text_analysis_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    df = spark.createDataFrame(
        [(1, "One sentence here. And two!")], "id long, text string"
    )
    out = TRANSFORMER_REGISTRY["text_analysis"].transform(
        df,
        _cfg("text_analysis", textColumn="text", stats="false",
             readability="true"),
        None,
    ).collect()[0]
    assert out["n_sentences"] == 2 and out["flesch_ease"] is not None


# ---------------------------------------------------------------------------
# stats adapter ops
# ---------------------------------------------------------------------------


def test_stats_adapter_new_operations(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["stats"]
    df = spark.createDataFrame(
        [("a", "x", 1, 0, 1.0), ("a", "y", 0, 1, 2.0),
         ("b", "x", 1, 1, 3.0), ("b", "y", 0, 0, 4.0)],
        "u string, v string, fa int, fb int, val double",
    )
    for cfg, needle in (
        (_cfg("stats", operation="chi_square", xColumn="u"), "yColumn"),
        (_cfg("stats", operation="mcnemar", flagAColumn="fa"),
         "flagBColumn"),
        (_cfg("stats", operation="brown_forsythe", valueColumn="val"),
         "factorColumn"),
    ):
        res = t.validate(df, cfg)
        assert not res.is_valid and any(needle in e for e in res.errors)
    assert "chi2" in t.transform(
        df, _cfg("stats", operation="chi_square", xColumn="u",
                 yColumn="v"), None
    ).columns
    assert "chi2_mcnemar" in t.transform(
        df, _cfg("stats", operation="mcnemar", flagAColumn="fa",
                 flagBColumn="fb", correction="false"), None
    ).columns
    assert "f_stat" in t.transform(
        df, _cfg("stats", operation="brown_forsythe", valueColumn="val",
                 factorColumn="u"), None
    ).columns


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------


def test_dsir_weights_matches_python(spark):
    import hashlib

    from etl_spark_gradle_spark.operators.corpus import dsir_weights

    train = [
        (1, "the cat sat on the mat"),
        (2, "quantum computing with qubits and gates"),
        (3, "the dog sat on the log"),
        (4, ""),
        (5, None),
    ]
    target = [
        (10, "the cat and the dog sat together"),
        (11, "cats dogs and mats everywhere"),
    ]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    gdf = spark.createDataFrame(target, "doc_id long, text string")
    B, alpha = 64, 1.0
    out = {
        r["doc_id"]: r
        for r in dsir_weights(
            tdf, gdf, "doc_id", "text", n_buckets=B, smoothing=alpha
        ).collect()
    }

    def feats(t):
        toks = [w.lower() for w in t.split() if w]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(f):
        return (
            int(hashlib.md5(("dsir:" + f).encode()).hexdigest()[:8], 16)
            % B
        )

    raw = Counter(
        bucket(f) for _, t in train if t for f in feats(t)
    )
    tgt = Counter(bucket(f) for _, t in target for f in feats(t))
    nr, nt = sum(raw.values()), sum(tgt.values())
    dlq = {
        b: round(
            (
                math.log((tgt.get(b, 0) + alpha) / (nt + alpha * B))
                - math.log((raw[b] + alpha) / (nr + alpha * B))
            )
            * 1e9
        )
        for b in raw
    }
    for did, t in train:
        if not t:
            # featureless docs still get a row, scored 0
            assert out[did]["n_features"] == 0
            assert out[did]["log_weight"] == 0.0
            continue
        fs = feats(t)
        q = sum(dlq[bucket(f)] for f in fs)
        assert out[did]["n_features"] == len(fs)
        assert out[did]["log_weight"] == q / 1e9  # bit-exact


def test_dsir_separates_on_topic_docs(spark):
    from etl_spark_gradle_spark.operators.corpus import dsir_weights

    train = [
        (i, "science research paper about experiments and results data")
        for i in range(20)
    ] + [
        (100 + i, "buy cheap pills online casino winner click here now")
        for i in range(20)
    ]
    target = [(0, "research experiments results science data analysis")]
    out = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(
            spark.createDataFrame(train, "doc_id long, text string"),
            spark.createDataFrame(target, "doc_id long, text string"),
            "doc_id",
            "text",
            n_buckets=10_000,
        ).collect()
    }
    assert out[0] > out[100]


def test_dsir_validation_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.corpus import dsir_weights

    tdf = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(TransformationError):
        dsir_weights(tdf, tdf, "doc_id", "text", n_buckets=1)
    with pytest.raises(TransformationError):
        dsir_weights(tdf, tdf, "doc_id", "text", smoothing=0.0)
    with pytest.raises(TransformationError):
        dsir_weights(tdf, tdf, "doc_id", "missing")

    t = TRANSFORMER_REGISTRY["dsir"]
    res = t.validate(
        tdf, _cfg("dsir", idColumn="doc_id", textColumn="text")
    )
    assert not res.is_valid and any("targetView" in e for e in res.errors)
    res = t.validate(
        tdf,
        _cfg("dsir", targetView="v", idColumn="doc_id",
             textColumn="text", buckets="one"),
    )
    assert not res.is_valid and any("buckets" in e for e in res.errors)

    tdf.createOrReplaceTempView("dsir_target_v")

    class Ctx:
        pass

    ctx = Ctx()
    ctx.spark = spark
    out = t.transform(
        tdf,
        _cfg("dsir", targetView="dsir_target_v", idColumn="doc_id",
             textColumn="text"),
        ctx,
    )
    assert {"doc_id", "text", "n_features", "log_weight"} <= set(
        out.columns
    )
    assert out.count() == 1


# ---------------------------------------------------------------------------
# ewma_stream
# ---------------------------------------------------------------------------


def test_ewma_stream_replays_batch(spark, tmp_path):
    """Stream-vs-batch parity: the one-double-state recursion must
    replay operators.timeseries.ewma bit-identically on a key-ordered
    feed, including across a second micro-batch resuming from state."""
    import pyspark.sql.functions as F

    from etl_spark_gradle_spark import streaming as st
    from etl_spark_gradle_spark.operators.timeseries import ewma

    rows1 = [(k, i, float((i * k * 7) % 13) + 0.25)
             for k in (1, 2) for i in range(1, 8)]
    rows2 = [(k, i, float((i * k * 3) % 11) + 0.5)
             for k in (1, 2) for i in range(8, 13)]
    src = tmp_path / "src"
    src.mkdir()

    def land(rows, name):
        # the file-stream source wants FILES in src, not nested dirs:
        # write to a scratch dir, move the single part file in
        import glob
        import shutil

        scratch = tmp_path / f"scratch_{name}"
        spark.createDataFrame(
            rows, "user_id int, seq int, value double"
        ).withColumn(
            "ts", F.timestamp_micros(F.col("seq") * 1_000_000)
        ).coalesce(1).write.mode("overwrite").parquet(str(scratch))
        part = glob.glob(str(scratch / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    land(rows1, "b1")
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        smoothed = st.ewma_stream(
            stream, key_col="user_id", time_col="ts",
            value_col="value", alpha=0.3, tiebreak_col="seq",
            watermark_delay="0 seconds",
        )
        st.write_stream(
            smoothed,
            {"path": out_dir, "checkpointLocation": ckpt,
             "format": "parquet"},
            output_mode="append",
            await_termination=True,
        )

    drain()
    # second batch arrives later; state must resume, not restart
    land(rows2, "b2")
    drain()

    batch_src = spark.createDataFrame(
        rows1 + rows2, "user_id int, seq int, value double"
    )
    expected = {
        (r["user_id"], r["seq"]): r["sm"]
        for r in ewma(
            batch_src, ["user_id"], "seq", "value", 0.3, "sm"
        ).collect()
    }
    got = {
        (r["user_id"], int(r["ts"].timestamp())): r["ewma"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) == len(expected)
    for k, v in expected.items():
        assert got[k] == v, (k, got[k], v)  # bit-exact across batches

    import pytest as _pt

    from etl_spark_gradle_spark.plans.config import ConfigError

    with _pt.raises(ConfigError):
        st.ewma_stream(stream, "user_id", "ts", "value", alpha=0.0)


# ---------------------------------------------------------------------------
# theil_u
# ---------------------------------------------------------------------------


def test_theil_u_matches_python_and_is_asymmetric(spark):
    from etl_spark_gradle_spark.operators.infotheory import theil_u

    rows = (
        [("z1", "cityA")] * 10 + [("z2", "cityA")] * 10
        + [("z3", "cityB")] * 10 + [("z4", "cityB")] * 8
        + [("z4", "cityA")] * 2
    )
    df = spark.createDataFrame(rows, "zip string, city string")
    out = theil_u(df, "zip", "city").collect()[0]
    n = len(rows)
    cx = Counter(r[0] for r in rows)
    cy = Counter(r[1] for r in rows)
    cxy = Counter(rows)
    hx = math.log(n) - sum(c * math.log(c) for c in cx.values()) / n
    hy = math.log(n) - sum(c * math.log(c) for c in cy.values()) / n
    mi = sum(
        (c / n) * math.log(n * c / (cx[x] * cy[y]))
        for (x, y), c in cxy.items()
    )
    assert out["n"] == n and out["k_x"] == 4 and out["k_y"] == 2
    assert abs(out["mi_nats"] - mi) < 1e-8
    assert abs(out["h_x"] - hx) < 1e-8 and abs(out["h_y"] - hy) < 1e-8
    assert abs(out["u_x_given_y"] - mi / hx) < 1e-7
    assert abs(out["u_y_given_x"] - mi / hy) < 1e-7
    # zip predicts city far better than city predicts zip
    assert out["u_y_given_x"] > out["u_x_given_y"]
    # degenerate single-level side: that direction NULL
    deg = theil_u(
        spark.createDataFrame(
            [("a", "k"), ("b", "k")], "x string, y string"
        ),
        "x",
        "y",
    ).collect()[0]
    # h_x > 0: knowing the constant y removes 0% of x's uncertainty;
    # h_y = 0: that direction is 0/0 -> NULL
    assert deg["u_x_given_y"] == 0.0
    assert deg["u_y_given_x"] is None
    with pytest.raises(TransformationError):
        theil_u(df, "zip", "zip")


def test_theil_u_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["infotheory"]
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    res = t.validate(df, _cfg("infotheory", operation="theil_u",
                              xColumn="x"))
    assert not res.is_valid
    out = t.transform(
        df, _cfg("infotheory", operation="theil_u", xColumn="x",
                 yColumn="y"), None
    )
    assert "u_x_given_y" in out.columns


# ---------------------------------------------------------------------------
# pca_fit / pca_project
# ---------------------------------------------------------------------------


def test_pca_matches_numpy(spark):
    import numpy as np

    from etl_spark_gradle_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    rng = np.random.default_rng(42)
    base = rng.normal(size=(300, 6)) * np.array([10, 5, 1, 0.5, 0.2, 0.1])
    mix = rng.normal(size=(6, 6)) * 0.3 + np.eye(6)
    x = base @ mix + 3.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    comps, evals, mean, n = pca_fit(df, "embedding", k=3)
    mu = x.mean(axis=0)
    w, v = np.linalg.eigh(np.cov(x, rowvar=False))
    order = np.argsort(w)[::-1][:3]
    ref = v[:, order].T
    for i in range(3):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert n == 300
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(evals, w[order], rtol=1e-8)
    assert np.allclose(np.array(comps), ref, atol=1e-8)
    # eigenvalues descending, sign convention applied
    assert evals == sorted(evals, reverse=True)
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0

    proj = {
        r["vec_id"]: r["pca"]
        for r in pca_project(df, "embedding", comps, mean=mean).collect()
    }
    ref_proj = (x - mu) @ np.array(comps).T
    for i in range(300):
        assert np.allclose(proj[i], ref_proj[i], atol=1e-8)
    # whitened components have unit variance
    pw = np.array(
        [
            r["pca"]
            for r in pca_project(
                df, "embedding", comps, mean=mean,
                eigenvalues=evals, whiten=True,
            ).collect()
        ]
    )
    assert np.allclose(pw.var(axis=0, ddof=1), 1.0, rtol=1e-6)


def test_pca_validation_and_pure_catalyst_projection(spark):
    from etl_spark_gradle_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [2.0, 1.0]), (3, [0.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(TransformationError):
        pca_fit(df, "embedding", k=0)
    with pytest.raises(TransformationError):
        pca_fit(df, "embedding", k=5)  # k > dim
    with pytest.raises(TransformationError):
        pca_fit(df, "missing", k=1)
    comps, evals, mean, _ = pca_fit(df, "embedding", k=1)
    with pytest.raises(TransformationError):
        pca_project(df, "embedding", comps, whiten=True)
    out = pca_project(df, "embedding", comps, mean=mean)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the projection is pure Catalyst: no python, no exchange
    for bad in ("MapInPandas", "FlatMapGroupsInPandas",
                "BatchEvalPython", "Exchange"):
        assert bad not in plan, bad


# ---------------------------------------------------------------------------
# shipped pipeline: target-selection.yaml
# ---------------------------------------------------------------------------


def test_target_selection_pipeline_yaml(spark, sf_dir, tmp_path,
                                        monkeypatch):
    """The shipped pipelines/target-selection.yaml runs end-to-end:
    DSIR scoring against a target view -> readability -> quality/
    target-likeness gate -> exact dedup -> selected parquet."""
    from etl_spark_gradle_spark.plans.config import load_pipeline_yaml
    from etl_spark_gradle_spark.plans.executor import PipelineExecutor

    out = str(tmp_path / "selected")
    monkeypatch.setenv("CORPUS_DIR", sf_dir)
    monkeypatch.setenv("TARGET_DIR", sf_dir)
    monkeypatch.setenv("SELECTED_OUT", out)
    cfg = load_pipeline_yaml("pipelines/target-selection.yaml")
    metrics = PipelineExecutor().execute(cfg, spark)
    assert metrics.records_loaded > 0
    sel = spark.read.parquet(out)
    assert sel.count() == metrics.records_loaded
    for col in ("log_weight", "n_features", "fk_grade"):
        assert col in sel.columns
    # the gate actually enforced
    assert sel.filter(
        "n_features = 0 OR log_weight / n_features <= -12.0 "
        "OR fk_grade < 1 OR fk_grade > 18"
    ).count() == 0
    assert sel.groupBy("text").count().filter("count > 1").count() == 0


# ---------------------------------------------------------------------------
# logrank_test
# ---------------------------------------------------------------------------


def test_logrank_matches_python(spark):
    from etl_spark_gradle_spark.operators.timeseries import logrank_test

    data = [("A", 5 + (i % 7), 1 if i % 3 else 0) for i in range(40)] + [
        ("B", 2 + (i % 5), 1 if i % 4 else 0) for i in range(40)
    ]
    df = spark.createDataFrame(data, "g string, dur int, ev int")
    out = logrank_test(df, "dur", "ev", "g").collect()[0]

    times = sorted({d for _, d, _ in data})
    n_a = sum(1 for g, _, _ in data if g == "A")
    n_b = len(data) - n_a
    d1t = Counter(d for g, d, e in data if g == "A" and e)
    d2t = Counter(d for g, d, e in data if g == "B" and e)
    r1t = Counter(d for g, d, _ in data if g == "A")
    r2t = Counter(d for g, d, _ in data if g == "B")
    c1 = c2 = soe = sv = 0
    for t in times:
        n1, n2 = n_a - c1, n_b - c2
        c1 += r1t.get(t, 0)
        c2 += r2t.get(t, 0)
        d1 = d1t.get(t, 0)
        d = d1 + d2t.get(t, 0)
        n = float(n1 + n2)
        if d > 0:
            soe += round((d1 - d * n1 / n) * 1e9)
            if n > 1:
                sv += round(
                    ((d * (n1 / n)) * (1.0 - n1 / n))
                    * (n - d) / (n - 1.0) * 1e9
                )
    oe, v = soe / 1e9, sv / 1e9
    assert out["n_a"] == n_a and out["n_b"] == n_b
    assert out["o_minus_e"] == oe and out["var_o"] == v
    assert out["z"] == oe / math.sqrt(v)  # bit-exact quantized close
    # A survives longer by construction -> significant
    assert abs(out["z"]) > 2
    with pytest.raises(TransformationError):
        logrank_test(df, "dur", "ev", "g", side_a="A")  # missing side_b
    three = spark.createDataFrame(
        [("A", 1, 1), ("B", 1, 1), ("C", 1, 1)], "g string, dur int, ev int"
    )
    with pytest.raises(TransformationError):
        logrank_test(three, "dur", "ev", "g")  # 3 sides, no explicit pair


def test_logrank_identical_curves_near_zero(spark):
    from etl_spark_gradle_spark.operators.timeseries import logrank_test

    data = [(g, 1 + (i % 6), i % 2) for g in ("A", "B") for i in range(30)]
    df = spark.createDataFrame(data, "g string, dur int, ev int")
    out = logrank_test(df, "dur", "ev", "g").collect()[0]
    assert abs(out["o_minus_e"]) < 1e-9  # identical curves


# ---------------------------------------------------------------------------
# kendall_tau
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_python(spark):
    from etl_spark_gradle_spark.operators.stats import kendall_tau

    random.seed(5)
    data = [(random.randint(0, 8), random.randint(0, 5))
            for _ in range(200)]
    df = spark.createDataFrame(data, "x int, y int")
    out = kendall_tau(df, "x", "y").collect()[0]
    c_ = d_ = tx = ty = 0
    n = len(data)
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = data[i], data[j]
            if x1 == x2:
                tx += 1
            if y1 == y2:
                ty += 1
            if x1 != x2 and y1 != y2:
                if (x2 - x1) * (y2 - y1) > 0:
                    c_ += 1
                else:
                    d_ += 1
    n0 = n * (n - 1) // 2
    tau = (c_ - d_) / math.sqrt((n0 - tx) * (n0 - ty))
    assert int(out["concordant"]) == c_
    assert int(out["discordant"]) == d_
    assert int(out["ties_x"]) == tx and int(out["ties_y"]) == ty
    assert abs(out["tau_b"] - tau) < 1e-12
    # perfect monotone -> exactly 1; reversal -> -1
    up = spark.createDataFrame(
        [(i, i * 2) for i in range(20)], "x int, y int"
    )
    assert kendall_tau(up, "x", "y").collect()[0]["tau_b"] == 1.0
    down = spark.createDataFrame(
        [(i, -i) for i in range(20)], "x int, y int"
    )
    assert kendall_tau(down, "x", "y").collect()[0]["tau_b"] == -1.0
    # degenerate single-level side -> NULL
    deg = kendall_tau(
        spark.createDataFrame([(1, 2), (1, 3)], "x int, y int"), "x", "y"
    ).collect()[0]
    assert deg["tau_b"] is None


def test_stats_adapter_kendall_and_logrank(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["stats"]
    df = spark.createDataFrame(
        [(1, 2, 3, 1, "A"), (2, 1, 4, 0, "B")],
        "x int, y int, dur int, ev int, g string",
    )
    res = t.validate(df, _cfg("stats", operation="kendall_tau",
                              xColumn="x"))
    assert not res.is_valid
    assert "tau_b" in t.transform(
        df, _cfg("stats", operation="kendall_tau", xColumn="x",
                 yColumn="y"), None
    ).columns
    res = t.validate(df, _cfg("stats", operation="logrank",
                              durationColumn="dur", eventColumn="ev"))
    assert not res.is_valid and any("sideColumn" in e for e in res.errors)
    assert "o_minus_e" in t.transform(
        df, _cfg("stats", operation="logrank", durationColumn="dur",
                 eventColumn="ev", sideColumn="g"), None
    ).columns


# ---------------------------------------------------------------------------
# mann_kendall / theil_sen
# ---------------------------------------------------------------------------


def test_mann_kendall_matches_python(spark):
    from etl_spark_gradle_spark.operators.stats import mann_kendall

    random.seed(3)
    data = [(t, (t // 3) + random.randint(-2, 2)) for t in range(60)]
    df = spark.createDataFrame(data, "t int, v int")
    s_ = 0
    n = len(data)
    for i in range(n):
        for j in range(i + 1, n):
            if data[j][0] == data[i][0]:
                continue
            d = data[j][1] - data[i][1]
            s_ += (d > 0) - (d < 0)
    tv = Counter(v for _, v in data)
    var_s = (
        n * (n - 1) * (2 * n + 5)
        - sum(m * (m - 1) * (2 * m + 5) for m in tv.values())
    ) / 18.0
    z = (s_ - 1) / math.sqrt(var_s) if s_ > 0 else (
        (s_ + 1) / math.sqrt(var_s) if s_ < 0 else 0.0
    )
    out = mann_kendall(df, "t", "v").collect()[0]
    assert out["n"] == n and int(out["s"]) == s_
    assert abs(out["var_s"] - var_s) < 1e-9
    assert out["z"] == z and out["z"] > 3  # clear upward trend
    # no trend -> S near 0, z small
    flat = spark.createDataFrame(
        [(t, t % 4) for t in range(48)], "t int, v int"
    )
    assert abs(mann_kendall(flat, "t", "v").collect()[0]["z"]) < 1


def test_theil_sen_matches_python_and_is_robust(spark):
    from etl_spark_gradle_spark.operators.stats import theil_sen

    random.seed(3)
    data = [(t, (t // 3) + random.randint(-2, 2)) for t in range(60)]
    df = spark.createDataFrame(data, "t int, v int")
    slopes = []
    n = len(data)
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = data[i], data[j]
            if x1 != x2:
                slopes.append((y2 - y1) / (x2 - x1))
    slopes.sort()
    med = slopes[math.ceil(0.5 * len(slopes)) - 1]

    def lower_median(vals):
        s = sorted(vals)
        return s[max(1, math.ceil(0.5 * len(s))) - 1]

    mx = lower_median([x for x, _ in data])
    my = lower_median([y for _, y in data])
    ts = theil_sen(df, "t", "v").collect()[0]
    assert ts["n"] == n and int(ts["n_pairs"]) == len(slopes)
    assert ts["slope"] == med
    assert ts["intercept"] == my - med * mx
    # robustness: wildly corrupt 20% of points; the slope barely moves
    bad = data[:48] + [(t, 1000) for t in range(48, 60)]
    ts2 = theil_sen(
        spark.createDataFrame(bad, "t int, v int"), "t", "v"
    ).collect()[0]
    assert abs(ts2["slope"] - med) < 2.0
    # all x tied -> NULL slope
    deg = theil_sen(
        spark.createDataFrame([(1, 2), (1, 5)], "t int, v int"), "t", "v"
    ).collect()[0]
    assert deg["slope"] is None


def test_stats_adapter_mann_kendall_theil_sen(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["stats"]
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 5)], "x int, y int")
    for op, col in (("mann_kendall", "z"), ("theil_sen", "slope")):
        res = t.validate(df, _cfg("stats", operation=op, xColumn="x"))
        assert not res.is_valid
        res = t.validate(df, _cfg("stats", operation=op, xColumn="x",
                                  yColumn="y", groupBy="x"))
        assert not res.is_valid  # groupBy unsupported
        assert col in t.transform(
            df, _cfg("stats", operation=op, xColumn="x", yColumn="y"),
            None
        ).columns


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # duration
            st.integers(min_value=0, max_value=1),   # event
        ),
        min_size=2,
        max_size=40,
    )
)
def test_kaplan_meier_invariants(spark, km_rows):
    """Survival is in [0, 1], non-increasing, counts tie out, and
    n_risk telescopes exactly."""
    from etl_spark_gradle_spark.operators.timeseries import kaplan_meier

    df = spark.createDataFrame(km_rows, "dur int, ev int")
    rows = kaplan_meier(df, "dur", "ev").collect()
    assert sum(r["n_event"] + r["n_censored"] for r in rows) == len(
        km_rows
    )
    prev_s, expected_risk = 1.0, len(km_rows)
    for r in rows:
        assert r["n_risk"] == expected_risk
        expected_risk -= r["n_event"] + r["n_censored"]
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-12
        prev_s = r["survival"]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    ),
    st.floats(min_value=0.05, max_value=1.0),
)
def test_ewma_invariants(spark, xs, alpha):
    """Each smoothed value lies within the running [min, max] of the
    observations so far, and the first equals the first observation."""
    from etl_spark_gradle_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("k", i, float(x)) for i, x in enumerate(xs)],
        "k string, t int, x double",
    )
    out = [
        r["sm"]
        for r in ewma(df, ["k"], "t", "x", alpha, "sm")
        .orderBy("t")
        .collect()
    ]
    assert out[0] == xs[0]
    lo = hi = xs[0]
    for x, y in zip(xs, out):
        lo, hi = min(lo, x), max(hi, x)
        assert lo - 1e-9 <= y <= hi + 1e-9


def test_streaming_yaml_ewma(spark, tmp_path, monkeypatch):
    """`streaming: true` + `type: ewma` runs as a stateful stream and
    replays the batch recursion on the drained output."""
    import glob
    import json
    import shutil

    from etl_spark_gradle_spark.plans.config import load_pipeline_yaml

    src = tmp_path / "esrc"
    src.mkdir()
    out, ckpt = tmp_path / "eout", tmp_path / "eckpt"
    scratch = tmp_path / "scratch"
    rows = [(k, i, float((i * k * 5) % 9) + 0.5)
            for k in (1, 2) for i in range(1, 10)]
    spark.createDataFrame(
        rows, "user_id int, seq int, value double"
    ).selectExpr(
        "user_id", "timestamp_micros(seq * 1000000) AS ts", "value", "seq"
    ).coalesce(1).write.parquet(str(scratch))
    shutil.copy(
        glob.glob(str(scratch / "part-*.parquet"))[0],
        str(src / "b1.parquet"),
    )
    yaml_path = tmp_path / "p.yaml"
    yaml_path.write_text(f"""
pipelineId: stream-ewma-test
streaming: true
source:
  type: file
  options: {{path: "{src}", format: parquet}}
  schema: "user_id int, ts timestamp, value double, seq int"
transformations:
  - type: ewma
    options:
      keyColumn: user_id
      timeColumn: ts
      valueColumn: value
      alpha: "0.4"
      tiebreakColumn: seq
      watermarkDelay: 0 seconds
sink:
  type: file
  options:
    path: "{out}"
    checkpointLocation: "{ckpt}"
    format: parquet
  writeMode: append
""")
    from etl_spark_gradle_spark.plans.config import load_pipeline_yaml
    from etl_spark_gradle_spark.plans.executor import PipelineExecutor

    m = PipelineExecutor().execute(
        load_pipeline_yaml(str(yaml_path)), spark
    )
    assert m.status == "SUCCESS", m.error_details
    got = {
        (r["user_id"], int(r["ts"].timestamp())): r["ewma"]
        for r in spark.read.parquet(str(out)).collect()
    }
    a, b = 0.4, 0.6
    for k in (1, 2):
        y = None
        for kk, i, x in sorted(r for r in rows if r[0] == k):
            y = x if y is None else a * x + b * y
            assert got[(k, i)] == y
    assert len(got) == len(rows)


# ---------------------------------------------------------------------------
# cox_ph
# ---------------------------------------------------------------------------


def test_cox_ph_recovers_coefficients_vs_numpy(spark):
    import numpy as np

    from etl_spark_gradle_spark.operators.timeseries import cox_ph

    rng = np.random.default_rng(7)
    n = 500
    x1 = np.round(rng.normal(0, 1, n), 3)
    x2 = np.round(rng.normal(0, 1, n), 3)
    haz = np.exp(0.8 * x1 - 0.5 * x2)
    t = rng.exponential(1.0 / haz)
    cens = rng.exponential(2.0, n)
    dur = np.round(np.minimum(t, cens), 3)
    ev = (t <= cens).astype(int)
    df = spark.createDataFrame(
        [
            (float(dur[i]), int(ev[i]), float(x1[i]), float(x2[i]))
            for i in range(n)
        ],
        "dur double, ev int, x1 double, x2 double",
    )
    out = {
        r["covariate"]: r
        for r in cox_ph(df, "dur", "ev", ["x1", "x2"],
                        iterations=10).collect()
    }

    # same Breslow Newton in numpy on the same 6-dp quantized data
    big_x = np.column_stack([np.round(x1, 6), np.round(x2, 6)])
    beta = np.zeros(2)
    times = np.unique(dur[ev == 1])
    for _ in range(10):
        w = np.exp(big_x @ beta)
        grad = np.zeros(2)
        hess = np.zeros((2, 2))
        for tt in times:
            mask = dur >= tt
            at = (dur == tt) & (ev == 1)
            d = at.sum()
            ww = w[mask]
            s0 = ww.sum()
            s1 = (ww[:, None] * big_x[mask]).sum(0)
            s2 = (
                ww[:, None, None]
                * (big_x[mask][:, :, None] * big_x[mask][:, None, :])
            ).sum(0)
            grad += big_x[at].sum(0) - d * s1 / s0
            hess += d * (s2 / s0 - np.outer(s1, s1) / s0**2)
        beta = beta + np.linalg.solve(hess, grad)
    assert abs(out["x1"]["beta"] - beta[0]) < 1e-6
    assert abs(out["x2"]["beta"] - beta[1]) < 1e-6
    # truth recovered within sampling noise; inference sane
    assert 0.5 < out["x1"]["beta"] < 1.1
    assert -0.8 < out["x2"]["beta"] < -0.2
    assert out["x1"]["z"] > 2 and out["x2"]["z"] < -2
    assert out["x1"]["hazard_ratio"] == math.exp(out["x1"]["beta"])
    assert out["x1"]["n"] == n and out["x1"]["n_events"] == int(ev.sum())


def test_cox_ph_validation_and_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.operators.timeseries import cox_ph

    df = spark.createDataFrame(
        [(1.0, 1, 0.5), (2.0, 0, -0.5), (3.0, 1, 1.5)],
        "dur double, ev int, x double",
    )
    with pytest.raises(TransformationError):
        cox_ph(df, "dur", "ev", [])
    with pytest.raises(TransformationError):
        cox_ph(df, "dur", "missing", ["x"])
    none_events = spark.createDataFrame(
        [(1.0, 0, 0.5)], "dur double, ev int, x double"
    )
    with pytest.raises(TransformationError):
        cox_ph(none_events, "dur", "ev", ["x"])

    t = TRANSFORMER_REGISTRY["stats"]
    res = t.validate(df, _cfg("stats", operation="cox",
                              durationColumn="dur", eventColumn="ev"))
    assert not res.is_valid and any(
        "covariateColumns" in e for e in res.errors
    )
    out = t.transform(
        df,
        _cfg("stats", operation="cox", durationColumn="dur",
             eventColumn="ev", covariateColumns="x", iterations="5"),
        None,
    )
    assert {"covariate", "beta", "hazard_ratio"} <= set(out.columns)


# ---------------------------------------------------------------------------
# rmst
# ---------------------------------------------------------------------------


def test_rmst_matches_python(spark):
    from etl_spark_gradle_spark.operators.timeseries import (
        kaplan_meier,
        rmst,
    )

    km_data = [(3, 1), (5, 1), (5, 0), (8, 1), (8, 1), (10, 0),
               (12, 1), (15, 0)]
    df = spark.createDataFrame(km_data, "dur int, ev int")
    tau = 11.0
    out = rmst(df, "dur", "ev", tau=tau).collect()[0]
    km = [(r["t"], r["survival"])
          for r in kaplan_meier(df, "dur", "ev").collect()]
    area = 0.0
    for i, (t, s) in enumerate(km):
        t_next = km[i + 1][0] if i + 1 < len(km) else tau
        area += s * (min(t_next, tau) - min(t, tau))
    expected = min(km[0][0], tau) * 1.0 + area
    assert out["n"] == len(km_data)
    assert abs(out["rmst"] - expected) < 1e-12
    assert out["rmst_frac"] == out["rmst"] / tau
    assert 0 < out["rmst"] < tau
    # tau beyond all observations with a never-failing group
    df2 = spark.createDataFrame(
        [("g", t, e) for t, e in km_data] + [("h", 2, 0)],
        "grp string, dur int, ev int",
    )
    rows = {
        r["grp"]: r
        for r in rmst(df2, "dur", "ev", tau=100.0,
                      group_by=["grp"]).collect()
    }
    assert rows["h"]["rmst"] == 100.0  # S = 1 throughout
    with pytest.raises(TransformationError):
        rmst(df, "dur", "ev", tau=0)


def test_stats_adapter_rmst(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY

    t = TRANSFORMER_REGISTRY["stats"]
    df = spark.createDataFrame([(1, 1), (2, 0)], "dur int, ev int")
    res = t.validate(df, _cfg("stats", operation="rmst",
                              durationColumn="dur", eventColumn="ev",
                              tau="-1"))
    assert not res.is_valid and any("tau" in e for e in res.errors)
    out = t.transform(
        df, _cfg("stats", operation="rmst", durationColumn="dur",
                 eventColumn="ev", tau="10"), None
    )
    assert {"tau", "rmst", "rmst_frac"} <= set(out.columns)
