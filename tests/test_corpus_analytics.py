"""Weighted PPS sampling (corpus.weighted_sample), PMI collocations
(collocations.pmi_bigrams), categorical drift (stats.category_drift)."""

from __future__ import annotations

import math

import pytest

from etl_spark_gradle_spark.operators.collocations import pmi_bigrams
from etl_spark_gradle_spark.operators.corpus import weighted_sample
from etl_spark_gradle_spark.operators.relational import TransformationError
from etl_spark_gradle_spark.operators.stats import category_drift


# ---------------------------------------------------------------- weighted


def test_weighted_sample_proportional_and_deterministic(spark):
    # weight 9 vs 1: the heavy stratum should be kept ~9x as often
    rows = [(i, 9.0 if i % 2 == 0 else 1.0) for i in range(4000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    kept = weighted_sample(df, "id", "w", 1000).toPandas()
    heavy = (kept.w == 9.0).sum()
    light = (kept.w == 1.0).sum()
    assert 800 <= len(kept) <= 1200  # expected size ~ target
    assert heavy / max(light, 1) > 4  # proportionality (9:1 in expectation)
    again = weighted_sample(df, "id", "w", 1000).toPandas()
    assert set(kept.id) == set(again.id)  # deterministic


def test_weighted_sample_edge_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 1e9)],
        ["id", "w"],
    )
    kept = weighted_sample(df, "id", "w", 2)
    ids = {r.id for r in kept.collect()}
    assert 2 not in ids and 3 not in ids and 4 not in ids  # p=0 strata
    assert 5 in ids  # p capped at 1 keeps the dominant row
    with pytest.raises(TransformationError, match="target_count"):
        weighted_sample(df, "id", "w", -1)
    with pytest.raises(TransformationError, match="not in input schema"):
        weighted_sample(df, "id", "nope", 1)


def test_weighted_sample_domain_separation(spark):
    # same keys, same target: uniform hash_sample and weighted_sample
    # must not select the identical key range (different hash domains)
    from etl_spark_gradle_spark.operators.corpus import hash_sample

    df = spark.createDataFrame([(i, 1.0) for i in range(2000)], ["id", "w"])
    w = {r.id for r in weighted_sample(df, "id", "w", 500).collect()}
    u = {r.id for r in hash_sample(df, "id", fraction=0.25).collect()}
    assert w != u and len(w & u) < len(w)


# --------------------------------------------------------------------- pmi


def test_pmi_scores_collocation_above_independents(spark):
    # "new york" always adjacent; "the" everywhere -> PMI(new,york) high,
    # PMI(the, x) low
    docs = [
        ("new york is the city the people the like",),
        ("the new york subway the runs the late",),
        ("new york new york the anthem the new era",),
    ]
    df = spark.createDataFrame(docs, ["text"])
    out = {(r.a, r.b): r for r in pmi_bigrams(df, "text", min_count=2).collect()}
    ny = out[("new", "york")]
    assert ny.c_ab == 4
    assert ny.pmi == pytest.approx(math.log(ny.ratio), abs=1e-12)
    the_pairs = [r for (a, b), r in out.items() if a == "the" or b == "the"]
    assert the_pairs and all(ny.ratio > r.ratio for r in the_pairs)


def test_pmi_denominator_unpruned_by_min_count(spark):
    df = spark.createDataFrame([("a b a b c d",)], ["text"])
    # 5 bigrams total; min_count=2 keeps only (a,b) but N_bi stays 5
    rows = pmi_bigrams(df, "text", min_count=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a, r.b, r.c_ab) == ("a", "b", 2)
    nu = 6.0  # 6 unigram tokens
    want_ratio = (2 / 5.0) / ((2 / nu) * (2 / nu))
    assert r.ratio == pytest.approx(want_ratio, rel=1e-12)


def test_pmi_validation_and_short_docs(spark):
    df = spark.createDataFrame([("solo",), ("",)], ["text"])
    assert pmi_bigrams(df, "text", min_count=1).count() == 0  # no pair, no crash
    with pytest.raises(TransformationError, match="min_count"):
        pmi_bigrams(df, "text", min_count=0)
    with pytest.raises(TransformationError, match="text column"):
        pmi_bigrams(df, "nope")


# ------------------------------------------------------------------- drift


def test_category_drift_identical_distributions(spark):
    a = spark.createDataFrame([("x",)] * 30 + [("y",)] * 10, ["c"])
    rows = category_drift(a, a, "c").collect()
    for r in rows:
        assert r.rate_a == r.rate_b and r.rate_diff == 0.0
        assert r.chi2_contrib == pytest.approx(0.0, abs=1e-12)


def test_category_drift_chi2_matches_textbook(spark):
    # 2x2 contingency: a = {x:30, y:10}, b = {x:10, y:30}
    a = spark.createDataFrame([("x",)] * 30 + [("y",)] * 10, ["c"])
    b = spark.createDataFrame([("x",)] * 10 + [("y",)] * 30, ["c"])
    rows = {r.category: r for r in category_drift(a, b, "c").collect()}
    # expected x count each side = 40*40/80 = 20 -> contrib per cell
    # (30-20)^2/20 + (10-20)^2/20 = 10 per category, total chi2 = 20
    assert rows["x"].chi2_contrib == pytest.approx(10.0, abs=1e-12)
    assert rows["y"].chi2_contrib == pytest.approx(10.0, abs=1e-12)
    assert rows["x"].rate_a == pytest.approx(0.75)
    assert rows["x"].rate_b == pytest.approx(0.25)


def test_category_drift_one_sided_category(spark):
    a = spark.createDataFrame([("only_a",), ("both",)], ["c"])
    b = spark.createDataFrame([("both",)], ["c"])
    rows = {r.category: r for r in category_drift(a, b, "c").collect()}
    assert rows["only_a"].n_b == 0 and rows["only_a"].n_a == 1
    assert rows["only_a"].chi2_contrib > 0
    with pytest.raises(TransformationError, match="right input"):
        category_drift(a, b.withColumnRenamed("c", "d"), "c")


def test_category_drift_empty_side_returns_empty(spark):
    """Drift against an empty side is undefined: no Inf/NaN rates leak
    out — the result is an empty frame, matching ks_drift/rank_sum_drift
    (ADVICE r4)."""
    a = spark.createDataFrame([("x",)] * 5, ["c"])
    empty = a.filter("1=0")
    assert category_drift(a, empty, "c").count() == 0
    assert category_drift(empty, a, "c").count() == 0
    assert category_drift(empty, empty, "c").count() == 0


# ----------------------------------------------------------- YAML adapters


def test_yaml_adapters(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame([(1, 2.0, "a b a b")], ["id", "w", "text"])

    ws = TRANSFORMER_REGISTRY["weighted_sample"]
    cfg = TransformationConfig(
        type="weighted_sample",
        options={"keyColumn": "id", "weightColumn": "w", "targetCount": "1"},
    )
    assert ws.validate(df, cfg).is_valid
    assert ws.transform(df, cfg, None).count() == 1  # p capped at 1
    assert not ws.validate(
        df, TransformationConfig(type="weighted_sample", options={})
    ).is_valid

    pmi = TRANSFORMER_REGISTRY["pmi"]
    cfg = TransformationConfig(type="pmi", options={"minCount": "2"})
    assert pmi.transform(df, cfg, None).count() == 1

    class _Ctx:
        def __init__(self, spark):
            self.spark = spark

    df.createOrReplaceTempView("drift_other")
    drift = TRANSFORMER_REGISTRY["drift"]
    cfg = TransformationConfig(
        type="drift",
        options={"categoryColumn": "text", "otherView": "drift_other"},
    )
    out = drift.transform(df, cfg, _Ctx(spark))
    assert out.count() == 1 and out.collect()[0].chi2_contrib == 0.0
    missing = TransformationConfig(
        type="drift", options={"categoryColumn": "text", "otherView": "nope_v"}
    )
    with pytest.raises(TransformationError, match="otherView"):
        drift.transform(df, missing, _Ctx(spark))


# ---------------------------------------------------------------- ks_drift


def test_ks_identical_distributions_is_zero(spark):
    from etl_spark_gradle_spark.operators.stats import ks_drift

    a = spark.createDataFrame([(float(v),) for v in range(20)], ["x"])
    r = ks_drift(a, a, "x").collect()
    assert len(r) == 1
    assert r[0].d_num == "0" and r[0].ks_d == 0.0
    assert r[0].n_a == 20 and r[0].n_b == 20


def test_ks_disjoint_supports_is_one(spark):
    from etl_spark_gradle_spark.operators.stats import ks_drift

    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["x"])
    b = spark.createDataFrame([(4.0,), (5.0,), (6.0,)], ["x"])
    r = ks_drift(a, b, "x").collect()[0]
    # F_a jumps to 1 by x=3 while F_b is still 0 -> D = 1 at the
    # smallest value attaining it
    assert r.d_num == "9" and r.ks_d == 1.0 and r.ks_at == 3.0


def test_ks_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from etl_spark_gradle_spark.operators.stats import ks_drift

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.where("l_returnflag = 'R'")
    b = li.where("l_returnflag = 'N'")
    r = ks_drift(a, b, "l_extendedprice").collect()[0]

    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    va = np.sort(pdf[pdf.l_returnflag == "R"].l_extendedprice.values)
    vb = np.sort(pdf[pdf.l_returnflag == "N"].l_extendedprice.values)
    allv = np.unique(np.concatenate([va, vb]))
    ca = np.searchsorted(va, allv, side="right")
    cb = np.searchsorted(vb, allv, side="right")
    dnum = np.abs(ca.astype("int64") * len(vb) - cb.astype("int64") * len(va))
    assert r.n_a == len(va) and r.n_b == len(vb)
    assert int(r.d_num) == int(dnum.max())
    assert r.ks_d == pytest.approx(dnum.max() / (len(va) * len(vb)), rel=0)
    assert r.ks_at == float(allv[dnum == dnum.max()].min())


def test_ks_deterministic_across_partitioning_and_nulls(spark):
    from etl_spark_gradle_spark.operators.stats import ks_drift

    import random

    rng = random.Random(13)
    a = spark.createDataFrame(
        [(rng.choice([None, float(rng.randint(0, 50))]),) for _ in range(300)],
        "x double",
    )
    b = spark.createDataFrame(
        [(rng.choice([None, float(rng.randint(10, 60))]),) for _ in range(200)],
        "x double",
    )
    r1 = ks_drift(a, b, "x", num_partitions=1).collect()[0]
    r7 = ks_drift(a, b, "x", num_partitions=7).collect()[0]
    r64 = ks_drift(a, b, "x", num_partitions=64).collect()[0]
    assert r1 == r7 == r64
    # nulls carry no rank: totals count only non-null rows
    assert r1.n_a == a.where("x IS NOT NULL").count()
    assert r1.n_b == b.where("x IS NOT NULL").count()


def test_ks_empty_side_and_validation(spark):
    from etl_spark_gradle_spark.operators.stats import ks_drift

    a = spark.createDataFrame([(1.0,)], ["x"])
    empty = spark.createDataFrame([], "x double")
    assert ks_drift(a, empty, "x").count() == 0
    with pytest.raises(TransformationError, match="side-b"):
        ks_drift(a, a.withColumnRenamed("x", "y"), "x")


def test_drift_adapter_ks_mode(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    class _Ctx:
        def __init__(self, spark):
            self.spark = spark

    df = spark.createDataFrame([(1.0,), (2.0,)], ["v"])
    df.createOrReplaceTempView("ks_other")
    drift = TRANSFORMER_REGISTRY["drift"]
    cfg = TransformationConfig(
        type="drift", options={"valueColumn": "v", "otherView": "ks_other"}
    )
    out = drift.transform(df, cfg, _Ctx(spark)).collect()
    assert len(out) == 1 and out[0].ks_d == 0.0
    # exactly one of categoryColumn/valueColumn
    both = TransformationConfig(
        type="drift",
        options={"valueColumn": "v", "categoryColumn": "v", "otherView": "ks_other"},
    )
    assert not drift.validate(df, both).is_valid
    neither = TransformationConfig(type="drift", options={"otherView": "ks_other"})
    assert not drift.validate(df, neither).is_valid


# ------------------------------------------------------------ rank_sum_drift


def test_rank_sum_auc_edges_and_ties(spark):
    from etl_spark_gradle_spark.operators.stats import rank_sum_drift

    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["x"])
    b = spark.createDataFrame([(4.0,), (5.0,)], ["x"])
    lo = rank_sum_drift(a, b, "x").collect()[0]
    assert lo.u2 == "0" and lo.auc == 0.0  # every a below every b
    hi = rank_sum_drift(b, a, "x").collect()[0]
    assert hi.u2 == str(2 * 3 * 2) and hi.auc == 1.0
    same = rank_sum_drift(a, a, "x").collect()[0]
    assert same.auc == 0.5  # identical distributions, ties split


def test_rank_sum_matches_python_reference(spark):
    import random

    from etl_spark_gradle_spark.operators.stats import rank_sum_drift

    rng = random.Random(29)
    va = [float(rng.randint(0, 30)) for _ in range(150)]
    vb = [float(rng.randint(5, 40)) for _ in range(120)]
    a = spark.createDataFrame([(v,) for v in va], "x double")
    b = spark.createDataFrame([(v,) for v in vb], "x double")
    r = rank_sum_drift(a, b, "x").collect()[0]
    # brute-force 2U_a = sum over pairs of 2*(a>b) + 1*(a==b)
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in va for y in vb)
    assert (r.n_a, r.n_b, r.u2) == (150, 120, str(u2))
    assert r.auc == u2 / (2.0 * 150 * 120)


def test_rank_sum_adapter_statistic_option(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    class _Ctx:
        def __init__(self, spark):
            self.spark = spark

    df = spark.createDataFrame([(1.0,), (2.0,)], ["v"])
    df.createOrReplaceTempView("rs_other")
    drift = TRANSFORMER_REGISTRY["drift"]
    cfg = TransformationConfig(
        type="drift",
        options={"valueColumn": "v", "otherView": "rs_other",
                 "statistic": "rank_sum"},
    )
    out = drift.transform(df, cfg, _Ctx(spark)).collect()
    assert len(out) == 1 and out[0].auc == 0.5
    bad = TransformationConfig(
        type="drift",
        options={"valueColumn": "v", "otherView": "rs_other",
                 "statistic": "bogus"},
    )
    assert not drift.validate(df, bad).is_valid


class TestBalanceClasses:
    def test_downsamples_to_minority(self, spark):
        from etl_spark_gradle_spark.operators.corpus import balance_classes

        df = spark.createDataFrame(
            [("pos", i) for i in range(3)] + [("neg", i) for i in range(100, 150)],
            "y string, id long",
        )
        out = balance_classes(df, ["y"], "id")
        counts = {r.y: r["count"] for r in out.groupBy("y").count().collect()}
        assert counts == {"pos": 3, "neg": 3}

    def test_deterministic_and_target_cap(self, spark):
        from etl_spark_gradle_spark.operators.corpus import balance_classes

        df = spark.createDataFrame(
            [("a", i) for i in range(20)] + [("b", i) for i in range(50, 60)],
            "y string, id long",
        )
        a = sorted((r.y, r.id) for r in balance_classes(df, ["y"], "id").collect())
        b = sorted((r.y, r.id) for r in balance_classes(df, ["y"], "id").collect())
        assert a == b and len(a) == 20
        capped = balance_classes(df, ["y"], "id", target=4)
        assert capped.count() == 8

    def test_null_class_is_its_own_class(self, spark):
        from etl_spark_gradle_spark.operators.corpus import balance_classes

        df = spark.createDataFrame(
            [("a", 1), ("a", 2), (None, 10)], "y string, id long"
        )
        out = balance_classes(df, ["y"], "id")
        # null class has 1 row -> budget 1 -> one 'a' survivor + the null row
        assert out.count() == 2
        assert sum(1 for r in out.collect() if r.y is None) == 1

    def test_empty_input_passthrough(self, spark):
        from etl_spark_gradle_spark.operators.corpus import balance_classes

        df = spark.createDataFrame([], "y string, id long")
        assert balance_classes(df, ["y"], "id").count() == 0

    def test_validation_and_adapter(self, spark):
        import pytest as _pytest

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.corpus import balance_classes
        from etl_spark_gradle_spark.operators.relational import TransformationError
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

        df = spark.createDataFrame([("a", 1)], "y string, id long")
        with _pytest.raises(TransformationError, match="class columns"):
            balance_classes(df, [], "id")
        with _pytest.raises(TransformationError, match="target"):
            balance_classes(df, ["y"], "id", target=0)
        t = TRANSFORMER_REGISTRY["balance_classes"]
        cfg = TransformationConfig(
            type="balance_classes",
            options={"classBy": "y", "orderColumn": "id"},
        )
        assert t.transform(df, cfg, RunContext.create("t-bal", spark)).count() == 1
        bad = TransformationConfig(
            type="balance_classes", options={"classBy": "y", "target": "zero"}
        )
        res = t.validate(df, bad)
        assert not res.is_valid and any("orderColumn" in e for e in res.errors)


class TestBalanceClassesUp:
    def test_upsamples_to_majority_with_deterministic_remainder(self, spark):
        from collections import Counter

        from etl_spark_gradle_spark.operators.corpus import balance_classes

        df = spark.createDataFrame(
            [("pos", i) for i in range(3)] + [("neg", i) for i in range(100, 107)],
            "y string, id long",
        )
        up = balance_classes(df, ["y"], "id", mode="up")
        counts = {r.y: r["count"] for r in up.groupBy("y").count().collect()}
        assert counts == {"pos": 7, "neg": 7}
        # 3 rows -> budget 7: replication multiset is {3, 2, 2}
        reps = Counter(r.id for r in up.where("y = 'pos'").collect())
        assert sorted(reps.values()) == [2, 2, 3]
        again = balance_classes(df, ["y"], "id", mode="up")
        assert sorted((r.y, r.id) for r in up.collect()) == sorted(
            (r.y, r.id) for r in again.collect()
        )

    def test_up_never_cuts_a_class_above_target(self, spark):
        from etl_spark_gradle_spark.operators.corpus import balance_classes

        df = spark.createDataFrame(
            [("a", i) for i in range(2)] + [("b", i) for i in range(10, 16)],
            "y string, id long",
        )
        out = balance_classes(df, ["y"], "id", mode="up", target=4)
        counts = {r.y: r["count"] for r in out.groupBy("y").count().collect()}
        assert counts == {"a": 4, "b": 6}  # b already above target: untouched

    def test_mode_validation(self, spark):
        import pytest as _pytest

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.corpus import balance_classes
        from etl_spark_gradle_spark.operators.relational import TransformationError
        from etl_spark_gradle_spark.plans.config import TransformationConfig

        df = spark.createDataFrame([("a", 1)], "y string, id long")
        with _pytest.raises(TransformationError, match="mode"):
            balance_classes(df, ["y"], "id", mode="sideways")
        bad = TransformationConfig(
            type="balance_classes",
            options={"classBy": "y", "orderColumn": "id", "mode": "sideways"},
        )
        res = TRANSFORMER_REGISTRY["balance_classes"].validate(df, bad)
        assert not res.is_valid and any("mode" in e for e in res.errors)


def test_weighted_reservoir_exact_k_and_bias(spark):
    """Efraimidis-Spirakis: exactly min(k, n_positive) rows per
    stratum, deterministic across runs, higher weights win more
    often, non-positive weights never win."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.corpus import weighted_reservoir

    # heavy rows split across BOTH strata (i%20 in {0,1}: 20 heavy per
    # stratum, exactly the slot count)
    rows = [(f"k{i}", "s%d" % (i % 2), 100.0 if i % 20 in (0, 1) else 1.0)
            for i in range(400)] + [("dead", "s0", 0.0), ("neg", "s1", -5.0)]
    df = spark.createDataFrame(rows, "key string, s string, w double")
    out = weighted_reservoir(df, "key", "w", 20, strata_col="s")
    got = out.groupBy("s").count().collect()
    assert {r.s: r["count"] for r in got} == {"s0": 20, "s1": 20}
    keys = {r.key for r in out.collect()}
    assert "dead" not in keys and "neg" not in keys
    # deterministic across invocations
    again = {r.key for r in
             weighted_reservoir(df, "key", "w", 20, strata_col="s").collect()}
    assert keys == again
    # weight bias: the 40 weight-100 rows (10% of rows, ~91% of mass)
    # should dominate the 40 winners
    heavy = sum(
        1 for k in keys if k.startswith("k") and int(k[1:]) % 20 in (0, 1)
    )
    assert heavy >= 25, f"heavy rows underrepresented: {heavy}/40"
    # k larger than the stratum: every positive-weight row survives
    small = spark.createDataFrame(
        [("a", "x", 1.0), ("b", "x", 2.0)], "key string, s string, w double"
    )
    assert weighted_reservoir(small, "key", "w", 10, strata_col="s").count() == 2

    import pytest as _pytest
    with _pytest.raises(Exception, match="k > 0"):
        weighted_reservoir(df, "key", "w", 0)


class TestNegativeSample:
    @staticmethod
    def _py_reference(keys, cands, k, buckets, salt="", exclude_equal=True):
        import hashlib

        def h(tag, s):
            return int(
                hashlib.md5((tag + str(s) + salt).encode()).hexdigest()[:8],
                16,
            )

        by_bucket = {}
        for c in sorted({c for c in cands if c is not None}, key=str):
            by_bucket.setdefault(h("negb:", c) % buckets, []).append(c)
        for b in by_bucket:
            by_bucket[b].sort(
                key=lambda c: (
                    hashlib.md5(("negr:" + str(c) + salt).encode()).hexdigest(),
                    str(c),
                )
            )
        dense = sorted(by_bucket)
        out = set()
        for key in keys:
            for i in range(1, k + 1):
                if not dense:
                    continue
                b = dense[h("negq:", f"{key}:{i}") % len(dense)]
                neg = by_bucket[b][h("negi:", f"{key}:{i}") % len(by_bucket[b])]
                if exclude_equal and str(neg) == str(key):
                    continue
                out.add((key, i, neg))
        return out

    def test_matches_python_reference_and_determinism(self, spark):
        from etl_spark_gradle_spark.operators.corpus import negative_sample

        keys = list(range(30))
        cands = list(range(100, 140))
        kdf = spark.createDataFrame([(k,) for k in keys], "anchor long")
        cdf = spark.createDataFrame([(c,) for c in cands], "cand long")
        want = self._py_reference(keys, cands, k=4, buckets=8)
        for parts in (1, 8):
            got = {
                (r.anchor, r.neg_index, r.negative)
                for r in negative_sample(
                    kdf.repartition(parts), "anchor",
                    cdf.repartition(parts), "cand", k=4, buckets=8,
                ).collect()
            }
            assert got == want
        # every negative is from the pool; every anchor has exactly k
        # slots here (no anchor key is in the candidate domain)
        assert all(n in set(cands) for _, _, n in want)
        assert len(want) == 30 * 4

    def test_exclude_equal_and_salt(self, spark):
        from etl_spark_gradle_spark.operators.corpus import negative_sample

        # anchors drawn FROM the candidate pool: self-draws must vanish
        ids = list(range(40))
        kdf = spark.createDataFrame([(k,) for k in ids], "anchor long")
        cdf = spark.createDataFrame([(c,) for c in ids], "cand long")
        rows = negative_sample(
            kdf, "anchor", cdf, "cand", k=3, buckets=4
        ).collect()
        assert all(r.negative != r.anchor for r in rows)
        assert self._py_reference(ids, ids, k=3, buckets=4) == {
            (r.anchor, r.neg_index, r.negative) for r in rows
        }
        # a different salt re-draws
        salted = {
            (r.anchor, r.neg_index, r.negative)
            for r in negative_sample(
                kdf, "anchor", cdf, "cand", k=3, buckets=4, salt="s2"
            ).collect()
        }
        assert salted == self._py_reference(ids, ids, 3, 4, salt="s2")
        assert salted != {(r.anchor, r.neg_index, r.negative) for r in rows}

    def test_validation_and_adapter(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.corpus import negative_sample
        from etl_spark_gradle_spark.operators.relational import (
            TransformationError,
        )
        from etl_spark_gradle_spark.plans.config import (
            RunContext,
            TransformationConfig,
        )

        kdf = spark.createDataFrame([(1,)], "anchor long")
        cdf = spark.createDataFrame([(2,)], "cand long")
        with pytest.raises(TransformationError, match="k >= 1"):
            negative_sample(kdf, "anchor", cdf, "cand", k=0)
        with pytest.raises(TransformationError, match="not in input schema"):
            negative_sample(kdf, "missing", cdf, "cand")
        cdf.createOrReplaceTempView("neg_pool")
        t = TRANSFORMER_REGISTRY["negative_sample"]
        cfg = TransformationConfig(
            type="negative_sample",
            options={"keyColumn": "anchor", "candidatesTable": "neg_pool",
                     "candidateColumn": "cand", "k": 2},
        )
        assert t.validate(kdf, cfg).is_valid
        out = t.transform(
            kdf, cfg, RunContext(pipeline_id="t", run_id="r", spark=spark)
        )
        assert {(r.anchor, r.negative) for r in out.collect()} == {(1, 2)}
        assert not t.validate(
            kdf, TransformationConfig(type="negative_sample", options={})
        ).is_valid
