"""Regression tests for the ADVICE r10 findings: spearman's rank-sum
accumulator overflow posture, containment's pruned-universe sizes +
adapter validation, and decontaminate matches-mode min_hits."""

from __future__ import annotations

import pytest

from etl_spark_gradle_spark.operators.corpus import decontaminate
from etl_spark_gradle_spark.operators.dedup import containment_pairs


def test_spearman_sums_ranks_as_decimal(spark):
    """ADVICE r10 (medium): _sx/_sy used to F.sum the raw LONG 2·rank
    column and cast AFTER — sum(2·rank) ≈ n(n+1) wraps the long
    accumulator past n ~ 3e9 (non-ANSI), silently diverging from the
    DuckDB oracle's HUGEINT accumulation at scales no small-SF gate
    reaches. Lock the decimal-in-the-sum shape via the analyzed plan:
    every sum over a rank-derived column must take a decimal input."""
    from etl_spark_gradle_spark.operators.stats import spearman

    df = spark.createDataFrame(
        [(float(i), float(i * i % 7)) for i in range(1, 40)],
        "x double, y double",
    )
    out = spearman(df, "x", "y")
    plan = out._jdf.queryExecution().analyzed().toString()
    import re

    sums = re.findall(r"sum\(([^)]*)\)", plan)
    rank_sums = [s for s in sums if "_r2" in s or "_sx" in s or "_sy" in s]
    assert rank_sums, f"expected rank-column sums in plan:\n{plan}"
    for s in rank_sums:
        assert "cast" in s and "decimal" in s, (
            f"sum over rank column must cast to decimal INSIDE the sum "
            f"(long accumulator wraps at n~3e9): sum({s})"
        )
    # and the statistic itself still matches the closed form on a
    # tie-free permutation: rho = 1 - 6*sum(d^2)/(n(n^2-1))
    perm = spark.createDataFrame(
        [(float(i), float((i * 7) % 11)) for i in range(11)],
        "x double, y double",
    )
    row = spearman(perm, "x", "y").collect()[0]
    xs = list(range(11))
    ys = [(i * 7) % 11 for i in xs]
    rx = {v: i + 1 for i, v in enumerate(sorted(xs))}
    ry = {v: i + 1 for i, v in enumerate(sorted(ys))}
    d2 = sum((rx[a] - ry[b]) ** 2 for a, b in zip(xs, ys))
    n = 11
    expected = 1 - 6 * d2 / (n * (n * n - 1))
    assert row["n"] == n
    assert abs(row["rho"] - expected) < 1e-12


def test_containment_sizes_use_pruned_universe(spark):
    """ADVICE r10: with max_shingle_df, the intersection dropped
    stop-shingles but sz_a/sz_b came from the UNFILTERED sets, so
    containment was systematically deflated for docs rich in frequent
    shingles. Sizes must now count the post-filter universe."""
    # 'a b c' appears in every doc -> df=3, pruned at max_shingle_df=2.
    # Docs 1 and 2 share ALL their surviving shingles.
    df = spark.createDataFrame(
        [
            (1, "a b c x y z"),       # shingles: abc, bcx, cxy, xyz
            (2, "q q a b c x y z"),   # shares bcx/cxy/xyz + abc(pruned)
            (3, "a b c unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9, max_shingle_df=2
        ).collect()
    }
    # doc 1's surviving shingles: bcx, cxy, xyz (abc pruned, df=3) —
    # all three also in doc 2 -> containment exactly 1.0. With the old
    # unfiltered sz_a=4 this read 3/4=0.75 and the pair vanished.
    assert (1, 2) in out, f"pair lost to stale denominator: {out}"
    r = out[(1, 2)]
    assert r["inter"] == 3 and r["sz_a"] == 3
    assert r["containment"] == 1.0
    # without the cap nothing changes (abc counts on both sides)
    base = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9
        ).collect()
    }
    assert base[(1, 2)]["sz_a"] == 4 and base[(1, 2)]["inter"] == 4


def test_containment_adapter_validates_numeric_options(spark):
    """ADVICE r10: strategy=containment's threshold/shingleSize/
    maxShingleDf must fail in validate() (clean ValidationResult),
    not as a raw ValueError at transform time."""
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    df = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    )
    t = TRANSFORMER_REGISTRY["dedup"]

    def cfg(**extra):
        return TransformationConfig(
            type="dedup",
            options={
                "strategy": "containment",
                "idColumn": "doc_id",
                "contentColumn": "text",
                **extra,
            },
        )

    for bad, needle in (
        ({"threshold": "not-a-number"}, "threshold"),
        ({"threshold": "0"}, "threshold"),
        ({"threshold": "1.5"}, "threshold"),
        ({"shingleSize": "zero"}, "shingleSize"),
        ({"shingleSize": "0"}, "shingleSize"),
        ({"maxShingleDf": "many"}, "maxShingleDf"),
        ({"maxShingleDf": "0"}, "maxShingleDf"),
    ):
        res = t.validate(df, cfg(**bad))
        assert not res.is_valid, f"expected invalid for {bad}"
        assert any(needle in e for e in res.errors), (bad, res.errors)
    assert t.validate(
        df, cfg(threshold="0.7", shingleSize="2", maxShingleDf="10")
    ).is_valid


def test_decontaminate_matches_mode_honors_min_hits(spark):
    """ADVICE r10: mode='matches' ignored min_hits — a minHits=5
    pipeline still got every 1-shingle pair. The per-pair filter now
    applies."""
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta unrelated follow up words"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon eta")],
        "doc_id long, text string",
    )
    kw = dict(id_col="doc_id", text_col="text", n=2, mode="matches")
    # doc1 shares 4 bigrams with eval 9; doc2 shares 1 ('alpha beta')
    all_pairs = {
        (r["doc_id"], r["eval_id"]): r["shared_ngrams"]
        for r in decontaminate(train, ev, min_hits=1, **kw).collect()
    }
    assert all_pairs == {(1, 9): 4, (2, 9): 1}
    filtered = {
        (r["doc_id"], r["eval_id"]): r["shared_ngrams"]
        for r in decontaminate(train, ev, min_hits=2, **kw).collect()
    }
    assert filtered == {(1, 9): 4}, filtered


def test_entry_ndcg_drops_null_event_type(spark, tmp_path):
    """ADVICE r10: q_ndcg's when-chain kept NULL event_type rows as
    rel=0 while the oracle filters them — divergent n_items the moment
    testdata grows nulls. Run q_ndcg over a copy of sf0.001 events
    with injected NULL event_type rows and assert per-user n_items
    never counts them."""
    import pyspark.sql.functions as F

    import __spark_entry__ as entry

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # pick one user, append two null-typed events for them
    uid = src.select("user_id").first()["user_id"]
    extra = (
        src.where(F.col("user_id") == uid)
        .limit(2)
        .withColumn("event_type", F.lit(None).cast("string"))
        .withColumn(
            "event_id", F.col("event_id") + F.lit(10_000_000)
        )
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    # q_ndcg only reads events; copy the one table it needs
    src.unionByName(extra).write.parquet(str(sf / "events.parquet"))

    base = {
        r["user_id"]: r["n_items"]
        for r in entry.q_ndcg(spark, "/root/testdata/sf0.001").collect()
    }
    mutated = {
        r["user_id"]: r["n_items"]
        for r in entry.q_ndcg(spark, str(sf)).collect()
    }
    assert mutated[uid] == base[uid], (
        "NULL event_type rows leaked into the ranked list"
    )
    assert mutated == base
