"""Information-theoretic operators (operators/infotheory.py): entropy/
Simpson diversity, JS/KL divergence, mutual information — each pinned
at full precision against pure-python references (the log-based parts
cannot cross-engine oracle-gate; see the module docstring)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from etl_spark_gradle_spark.operators.infotheory import (
    category_entropy,
    js_divergence,
    kl_divergence,
    mutual_information,
)
from etl_spark_gradle_spark.operators.relational import TransformationError


def _entropy(counts):
    n = sum(counts)
    return math.log(n) - sum(c * math.log(c) for c in counts) / n if n > 1 else 0.0


def _simpson(counts):
    n = sum(counts)
    return 1.0 - sum(c * (c - 1) for c in counts) / (n * (n - 1)) if n > 1 else 0.0


def test_category_entropy_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["lang"]: r
        for r in category_entropy(docs, "source", group_by=["lang"]).collect()
    }
    pdf = docs.select("lang", "source").toPandas()
    for lang, grp in pdf.groupby("lang"):
        counts = list(Counter(grp["source"].dropna()).values())
        r = got[lang]
        assert r["n"] == sum(counts)
        assert r["n_categories"] == len(counts)
        assert abs(r["entropy_nats"] - _entropy(counts)) < 1e-12
        assert abs(r["simpson"] - _simpson(counts)) < 1e-12


def test_category_entropy_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g2", "b"), ("g3", None)],
        "g string, c string",
    )
    rows = {r["g"]: r for r in category_entropy(df, "c", ["g"]).collect()}
    assert rows["g1"]["entropy_nats"] == 0.0 and rows["g1"]["simpson"] == 0.0
    assert rows["g2"]["n"] == 1 and rows["g2"]["entropy_nats"] == 0.0
    assert "g3" not in rows  # all-null group has no non-null categories
    with pytest.raises(TransformationError, match="not in schema"):
        category_entropy(df, "nope")


def test_js_divergence_matches_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.where("user_id % 2 = 0").select("event_type")
    b = ev.where("user_id % 2 = 1").select("event_type")
    got = js_divergence(a, b, "event_type").collect()[0]

    pa = Counter(r.event_type for r in a.collect())
    pb = Counter(r.event_type for r in b.collect())
    na, nb = sum(pa.values()), sum(pb.values())
    js = 0.0
    for cat in set(pa) | set(pb):
        p, q = pa.get(cat, 0) / na, pb.get(cat, 0) / nb
        m = (p + q) / 2.0
        js += (p * math.log(p / m) if p else 0.0) / 2.0
        js += (q * math.log(q / m) if q else 0.0) / 2.0
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["js_nats"] - js) < 1e-12

    # contributions sum to the summary
    contribs = js_divergence(a, b, "event_type", per_category=True).collect()
    assert abs(sum(r["js_contrib"] for r in contribs) - js) < 1e-12


def test_js_divergence_bounds_and_identity(spark):
    same = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "c string")
    r = js_divergence(same, same, "c").collect()[0]
    assert abs(r["js_nats"]) < 1e-15  # identical distributions -> 0
    disjoint_a = spark.createDataFrame([("x",)] * 4, "c string")
    disjoint_b = spark.createDataFrame([("z",)] * 6, "c string")
    r2 = js_divergence(disjoint_a, disjoint_b, "c").collect()[0]
    assert abs(r2["js_nats"] - math.log(2)) < 1e-12  # disjoint -> ln 2
    empty = spark.createDataFrame([], "c string")
    assert js_divergence(disjoint_a, empty, "c").count() == 0


def test_kl_divergence_matches_python_and_asymmetry(spark):
    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 4, "c string")
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 8, "c string")
    alpha, K = 0.5, 3  # union support {x, y, z}
    got = kl_divergence(a, b, "c", smoothing=alpha).collect()[0]
    ca, cb = {"x": 6, "y": 4, "z": 0}, {"x": 2, "y": 0, "z": 8}
    na, nb = 10 + alpha * K, 10 + alpha * K
    want = sum(
        ((ca[c] + alpha) / na) * math.log(((ca[c] + alpha) / na) / ((cb[c] + alpha) / nb))
        for c in ca
    )
    assert got["n_categories"] == K
    assert abs(got["kl_nats"] - want) < 1e-12
    rev = kl_divergence(b, a, "c", smoothing=alpha).collect()[0]
    assert abs(rev["kl_nats"] - got["kl_nats"]) > 1e-3  # asymmetric
    with pytest.raises(TransformationError, match="smoothing"):
        kl_divergence(a, b, "c", smoothing=0)


def test_mutual_information_matches_python(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ub", (F.col("user_id") % 4).cast("string")
    )
    got = mutual_information(ev, "event_type", "ub").collect()[0]

    pairs = Counter(
        (r.event_type, r.ub) for r in ev.select("event_type", "ub").collect()
    )
    n = sum(pairs.values())
    cx, cy = Counter(), Counter()
    for (x, y), c in pairs.items():
        cx[x] += c
        cy[y] += c
    mi = sum(
        (c / n) * math.log(n * c / (cx[x] * cy[y])) for (x, y), c in pairs.items()
    )
    chi2 = sum(c * c / (cx[x] * cy[y] / n) for (x, y), c in pairs.items()) - n
    v = math.sqrt(chi2 / (n * (min(len(cx), len(cy)) - 1)))
    assert got["n"] == n
    assert got["k_x"] == len(cx) and got["k_y"] == len(cy)
    assert abs(got["mi_nats"] - mi) < 1e-9
    assert abs(got["chi2"] - chi2) < 1e-6 * max(1.0, abs(chi2))
    assert abs(got["cramers_v"] - v) < 1e-9

    per = mutual_information(ev, "event_type", "ub", per_pair=True).collect()
    assert abs(sum(r["mi_contrib"] for r in per) - mi) < 1e-9


def test_mutual_information_independence_and_identity(spark):
    from pyspark.sql import functions as F

    # independent columns -> MI ~ 0 exactly (counts factorize on this grid)
    df = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("x"),
        (F.col("id") % 5).cast("string").alias("y"),
    )
    r = mutual_information(df, "x", "y").collect()[0]
    assert abs(r["mi_nats"]) < 1e-12 and abs(r["chi2"]) < 1e-6
    assert r["cramers_v"] < 1e-3

    # y == f(x): MI equals H(x), Cramér's V = 1
    df2 = spark.range(900).select(
        (F.col("id") % 3).cast("string").alias("x"),
        ((F.col("id") % 3) * 10).cast("string").alias("y"),
    )
    r2 = mutual_information(df2, "x", "y").collect()[0]
    assert abs(r2["mi_nats"] - math.log(3)) < 1e-12
    assert abs(r2["cramers_v"] - 1.0) < 1e-12
    with pytest.raises(TransformationError, match="distinct"):
        mutual_information(df2, "x", "x")


def test_infotheory_yaml_adapter_and_drift_routes(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("x"),
        (F.col("id") % 2).cast("string").alias("y"),
    )
    it = TRANSFORMER_REGISTRY["infotheory"]
    cfg = TransformationConfig(
        type="infotheory", options={"operation": "entropy", "categoryColumn": "x"}
    )
    assert it.validate(df, cfg).is_valid
    assert it.transform(df, cfg, None).collect()[0]["n_categories"] == 3
    cfg2 = TransformationConfig(
        type="infotheory",
        options={"operation": "mutual_information", "xColumn": "x", "yColumn": "y"},
    )
    assert it.validate(df, cfg2).is_valid
    assert it.transform(df, cfg2, None).collect()[0]["n"] == 100
    bad = TransformationConfig(type="infotheory", options={"operation": "nope"})
    assert not it.validate(df, bad).is_valid

    # drift adapter routes statistic js / kl
    class _Ctx:
        def __init__(self, spark):
            self.spark = spark

    df.createOrReplaceTempView("it_other")
    dr = TRANSFORMER_REGISTRY["drift"]
    for stat in ("js", "kl"):
        c = TransformationConfig(
            type="drift",
            options={"otherView": "it_other", "categoryColumn": "x",
                     "statistic": stat},
        )
        assert dr.validate(df, c).is_valid
        out = dr.transform(df, c, _Ctx(spark)).collect()[0]
        key = "js_nats" if stat == "js" else "kl_nats"
        assert abs(out[key]) < 1e-12  # same frame both sides
    badstat = TransformationConfig(
        type="drift",
        options={"otherView": "it_other", "categoryColumn": "x",
                 "statistic": "nope"},
    )
    assert not dr.validate(df, badstat).is_valid


def test_psi_drift_matches_python(spark, sf_dir):
    """PSI over lineitem prices (R-flag reference vs A-flag current):
    edges = exact type-1 deciles of the reference, both sides binned
    identically, add-alpha smoothed rates — pinned against a pure
    python replay."""
    import numpy as np

    from etl_spark_gradle_spark.operators.infotheory import psi_drift

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.where("l_returnflag = 'R'").select("l_extendedprice")
    b = li.where("l_returnflag = 'A'").select("l_extendedprice")
    bins, alpha = 10, 0.5
    got = psi_drift(a, b, "l_extendedprice", bins=bins, smoothing=alpha).collect()[0]

    av = np.sort(np.array([float(r[0]) for r in a.collect()]))
    bv = np.array([float(r[0]) for r in b.collect()])
    n = len(av)
    # type-1 (lower) quantile: smallest value whose cum count >= ceil(p n)
    edges = [av[max(1, math.ceil(i / bins * n)) - 1] for i in range(1, bins)]
    def bin_of(x):
        return sum(1 for e in edges if x > e)
    ca = Counter(bin_of(x) for x in av)
    cb = Counter(bin_of(x) for x in bv)
    na, nb = len(av), len(bv)
    psi = 0.0
    for i in range(bins):  # full nominal grid, incl. empty bins
        p = (ca.get(i, 0) + alpha) / (na + alpha * bins)
        q = (cb.get(i, 0) + alpha) / (nb + alpha * bins)
        psi += (p - q) * math.log(p / q)
    assert got["n_a"] == na and got["n_b"] == nb and got["n_bins"] == bins
    assert abs(got["psi"] - psi) < 1e-9

    per = psi_drift(a, b, "l_extendedprice", bins=bins, per_bin=True).collect()
    assert abs(sum(r["psi_contrib"] for r in per) - psi) < 1e-9


def test_psi_drift_identity_and_validation(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.infotheory import psi_drift

    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    r = psi_drift(df, df, "v", bins=5).collect()[0]
    assert abs(r["psi"]) < 1e-12  # identical distributions -> 0
    empty = spark.createDataFrame([], "v double")
    assert psi_drift(df, empty, "v").count() == 0
    with pytest.raises(TransformationError, match="bins"):
        psi_drift(df, df, "v", bins=1)
    with pytest.raises(TransformationError, match="smoothing"):
        psi_drift(df, df, "v", smoothing=0)
    with pytest.raises(TransformationError, match="value column"):
        psi_drift(df, df, "nope")


def test_drift_adapter_psi_route(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.range(500).select((F.col("id") % 50).cast("double").alias("v"))
    df.createOrReplaceTempView("psi_other")

    class _Ctx:
        def __init__(self, s):
            self.spark = s

    dr = TRANSFORMER_REGISTRY["drift"]
    cfg = TransformationConfig(
        type="drift",
        options={"otherView": "psi_other", "valueColumn": "v",
                 "statistic": "psi", "bins": "5"},
    )
    assert dr.validate(df, cfg).is_valid
    out = dr.transform(df, cfg, _Ctx(spark)).collect()[0]
    assert out["n_bins"] == 5 and abs(out["psi"]) < 1e-12  # same frame
    per = TransformationConfig(
        type="drift",
        options={"otherView": "psi_other", "valueColumn": "v",
                 "statistic": "psi", "bins": "5", "perBin": "true"},
    )
    rows = dr.transform(df, per, _Ctx(spark)).collect()
    assert abs(sum(r["psi_contrib"] for r in rows)) < 1e-12


def test_divergences_treat_null_as_one_category(spark):
    """Regression (code-review): the two-sample full join must be
    NULL-SAFE — identical frames with NULL categories previously split
    the NULL bucket into two phantom one-sided categories and reported
    large fake drift."""
    from etl_spark_gradle_spark.operators.stats import category_drift, tv_distance

    rows = [("x",), ("x",), ("y",), (None,), (None,)]
    df = spark.createDataFrame(rows, "c string")
    js = js_divergence(df, df, "c").collect()[0]
    assert js["n_categories"] == 3  # x, y, NULL — not 4
    assert abs(js["js_nats"]) < 1e-15
    kl = kl_divergence(df, df, "c").collect()[0]
    assert kl["n_categories"] == 3 and abs(kl["kl_nats"]) < 1e-15
    tv = tv_distance(df, df, "c").collect()[0]
    assert tv["n_categories"] == 3 and abs(tv["tv"]) < 1e-15
    chi = category_drift(df, df, "c").collect()
    assert len(chi) == 3
    assert all(abs(r["chi2_contrib"]) < 1e-15 for r in chi)


def test_psi_includes_structurally_empty_bins(spark):
    """Regression (code-review): bins empty on BOTH sides still carry
    their smoothed (p-q)ln(p/q) term when n_a != n_b — a near-constant
    reference (duplicate decile edges) must not understate PSI."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.infotheory import psi_drift

    # constant reference: all 9 decile edges equal -> only bins 0 and 9
    # are occupiable; bins 1-8 are structurally empty for BOTH sides
    a = spark.range(100).select(F.lit(5.0).alias("v"))
    b = spark.range(40).select(F.lit(7.0).alias("v"))  # all above edges
    bins, alpha = 10, 0.5
    got = psi_drift(a, b, "v", bins=bins, smoothing=alpha).collect()[0]
    na, nb = 100, 40
    ca = {0: 100}   # v == edge -> not strictly greater -> bin 0
    cb = {9: 40}    # v > all 9 edges -> bin 9
    want = 0.0
    for i in range(bins):
        p = (ca.get(i, 0) + alpha) / (na + alpha * bins)
        q = (cb.get(i, 0) + alpha) / (nb + alpha * bins)
        want += (p - q) * math.log(p / q)
    assert abs(got["psi"] - want) < 1e-12
    per = psi_drift(a, b, "v", bins=bins, per_bin=True).collect()
    assert len(per) == bins  # full nominal spine materialized
