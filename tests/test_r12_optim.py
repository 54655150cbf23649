"""Round-12 optimization internals: the fused pin+bounds+metrics job
(`stats._pin_with_bounds`), the keyword-automaton worker cache, and
the norm-precomputed cosine top-k — focused tests for the operator
internals the optimization round changed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestPinWithBounds:
    def test_metrics_come_back_as_driver_values(self, spark):
        from etl_spark_gradle_spark.operators.stats import _pin_with_bounds

        df = spark.range(0, 1000).select(
            F.col("id").alias("v"), (F.col("id") % 7).alias("c")
        )
        pinned, bounds, got = _pin_with_bounds(
            df, "v", 4, metrics=[F.sum("c").cast("long").alias("s"),
                                 F.count(F.lit(1)).cast("long").alias("n")]
        )
        assert got["n"] == 1000
        assert got["s"] == sum(i % 7 for i in range(1000))
        # the pinned frame is the same relation, re-usable without
        # re-executing upstream
        assert pinned.count() == 1000

    def test_bounds_are_sorted_distinct_floats(self, spark):
        from etl_spark_gradle_spark.operators.stats import _pin_with_bounds

        df = spark.range(0, 10_000).select(F.col("id").alias("v"))
        _, bounds, _ = _pin_with_bounds(df, "v", 4)
        assert bounds == sorted(bounds)
        assert len(bounds) == len(set(bounds))
        assert all(isinstance(b, float) for b in bounds)
        # P=4 asks for 3 interior quantiles of a dense domain
        assert 1 <= len(bounds) <= 3

    def test_empty_frame_yields_none_metrics_and_no_bounds(self, spark):
        from etl_spark_gradle_spark.operators.stats import _pin_with_bounds

        df = (
            spark.range(0, 10)
            .select(F.col("id").alias("v"))
            .where(F.lit(False))
        )
        pinned, bounds, got = _pin_with_bounds(
            df, "v", 4, metrics=[F.sum("v").cast("long").alias("s")]
        )
        assert got["s"] is None
        assert bounds == []
        assert pinned.count() == 0

    def test_non_numeric_order_column_skips_bounds(self, spark):
        from etl_spark_gradle_spark.operators.stats import _pin_with_bounds

        df = spark.createDataFrame(
            [("a", 1), ("b", 2)], "v string, c int"
        )
        pinned, bounds, got = _pin_with_bounds(
            df, "v", 4, metrics=[F.sum("c").cast("long").alias("s")]
        )
        assert bounds == []
        assert got["s"] == 3
        assert pinned.count() == 2

    def test_prefix_sums_consume_shared_bounds_identically(self, spark):
        """_prefix_sums with caller-shared fused bounds must equal the
        self-derived-bounds result row-for-row (ANY monotone boundary
        list is valid — this locks the equivalence the rollout relies
        on)."""
        from etl_spark_gradle_spark.operators.stats import (
            _pin_with_bounds,
            _prefix_sums,
        )

        base = spark.range(0, 500).select(
            F.col("id").alias("v"), F.lit(1).alias("c")
        )
        pinned, bounds, _ = _pin_with_bounds(base, "v", 4)
        a = _prefix_sums(
            pinned, "v", ["c"], 4, assume_pinned=True, bounds=bounds
        ).orderBy("v").collect()
        b = _prefix_sums(base, "v", ["c"], 4).orderBy("v").collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b]


class TestKeywordWorkerCache:
    def test_automaton_cache_hits_same_dictionary(self):
        from etl_spark_gradle_spark.operators.keywords import _automaton_for

        a1 = _automaton_for(["abc", "de"])
        a2 = _automaton_for(["abc", "de"])
        assert a1 is a2
        a3 = _automaton_for(["abc", "xy"])
        assert a3 is not a2
        assert a3.find_set("xabcxyz") == {"abc", "xy"}

    def test_fast_find_set_matches_nested_and_overlapping(self):
        from etl_spark_gradle_spark.operators.keywords import AhoCorasick

        ac = AhoCorasick(["a", "ab", "bab", "bc", "c"])
        assert ac.find_set("abab") == {"a", "ab", "bab"}
        assert ac.find_set("abc") == {"a", "ab", "bc", "c"}
        assert ac.find_set("") == set()


class TestCosineTopkNorms:
    def test_matches_fused_cosine_bit_for_bit(self, spark):
        from etl_spark_gradle_spark.operators.similarity import (
            brute_force_topk,
            cosine,
        )

        emb = spark.range(0, 50).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[(F.col("id") * (i + 1) % 17).cast("double") for i in range(8)]
            ).alias("embedding"),
        )
        queries = emb.where("vec_id < 5").select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = brute_force_topk(emb, queries, k=3).orderBy(
            "query_id", "rank"
        ).collect()
        # reference: the old fused-cosine expression per pair
        ref = (
            F.broadcast(
                queries.select(
                    "query_id", F.col("query_vec").alias("__qv")
                )
            )
            .crossJoin(
                emb.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("__cv"),
                )
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        exp = (
            ref.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .orderBy("query_id", "rank")
            .collect()
        )
        assert [r.asDict() for r in got] == [r.asDict() for r in exp]


class TestLazyOperatorsPackage:
    """The operators package exports lazily (PEP 562) so that a Python
    worker resolving one operator module by reference — what cloudpickle
    does for every mapInPandas function's globals — does not execute the
    other ~30 module bodies. Eagerly that import tax (~1.3 s cold) re-ran
    on every cold worker a small Python-stage job rotated onto, tripling
    q9/q12/q18/q27-class queries in a long session (round-12 finding)."""

    def test_single_module_import_stays_lazy(self):
        import subprocess
        import sys

        code = (
            "import sys; "
            "import etl_spark_gradle_spark.operators.multimodal as mm; "
            "heavy = [m for m in sys.modules if m.startswith("
            "'etl_spark_gradle_spark.operators.') and m.split('.')[-1] in "
            "('stats', 'timeseries', 'evaluation', 'corpus', 'relational')]; "
            "assert not heavy, f'eager sibling imports: {heavy}'; "
            "assert mm.parse_image_dims(None) is None"
        )
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr

    def test_every_export_resolves(self):
        import etl_spark_gradle_spark.operators as ops

        for name in ops._EXPORTS:
            assert getattr(ops, name) is not None, name

    def test_root_reexport_is_the_defining_object(self):
        from etl_spark_gradle_spark.operators import decode_images
        from etl_spark_gradle_spark.operators.multimodal import (
            decode_images as direct,
        )

        assert decode_images is direct

    def test_registry_semantics(self):
        import etl_spark_gradle_spark.operators as ops

        reg = ops.TRANSFORMER_REGISTRY
        assert reg  # truthy even before any instantiation
        assert "kmeans" in reg
        assert "nope" not in reg
        assert reg.get("nope") is None
        t1 = reg["filter"]
        assert reg.get("filter") is t1  # cached single instance
        for key, cls_name in ops._TRANSFORMER_SPECS.items():
            inst = reg[key]
            assert type(inst).__name__ == cls_name, key
        with pytest.raises(KeyError):
            reg["definitely_not_registered"]

    def test_register_transformer_override_wins(self):
        import etl_spark_gradle_spark.operators as ops

        sentinel = object()
        ops.register_transformer("FILTER", sentinel)
        try:
            assert ops.TRANSFORMER_REGISTRY["filter"] is sentinel
            assert ops.TRANSFORMER_REGISTRY.get("filter") is sentinel
        finally:
            del ops.TRANSFORMER_REGISTRY["filter"]
        # spec-backed instantiation restored after the override is gone
        assert type(ops.TRANSFORMER_REGISTRY["filter"]).__name__ == (
            "FilterTransformer"
        )


class TestCosinePrecomputedNorms:
    """`_cosine_pre` (per-side precomputed L2 norms) must be bit-identical
    to the fused `cosine()` — the old BNLJ join condition evaluated FIVE
    interpreted HOF aggregates per candidate pair (two norms in the
    zero-guard, the dot, and the two norms again in the division); the
    per-side form evaluates one dot per pair plus one norm per row."""

    def test_bit_identical_including_zero_vectors(self, spark):
        from etl_spark_gradle_spark.operators.similarity import (
            _cosine_pre,
            cosine,
            l2_norm,
        )

        rows = [
            (1, [1.0, 2.0, 3.0], 2, [3.0, 2.0, 1.0]),
            (3, [0.0, 0.0, 0.0], 4, [1.0, 1.0, 1.0]),  # zero-norm guard
            (5, [0.1, -0.2, 0.3], 6, [-0.4, 0.5, -0.6]),
            (7, [1e-200, 1e-200, 0.0], 8, [1e200, 0.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, ["id_a", "va", "id_b", "vb"])
        out = df.select(
            cosine(F.col("va"), F.col("vb")).alias("fused"),
            _cosine_pre(
                F.col("va"),
                F.col("vb"),
                l2_norm(F.col("va")),
                l2_norm(F.col("vb")),
            ).alias("pre"),
        ).collect()
        import math

        for r in out:
            # exact double equality (NaN produced identically by both
            # forms counts as equal — the denormal row underflows the
            # same way through either expression order)
            assert r.fused == r.pre or (
                math.isnan(r.fused) and math.isnan(r.pre)
            )

    def test_pairs_exact_matches_per_pair_cosine(self, spark):
        from etl_spark_gradle_spark.operators import similarity as sim

        emb = spark.createDataFrame(
            [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
             for i in range(12)],
            ["vec_id", "embedding"],
        )
        got = {
            (r.id_a, r.id_b): r.cos_sim
            for r in sim.embedding_cosine_pairs_exact(
                emb, threshold=-2.0
            ).collect()
        }
        a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        exp = {
            (r.id_a, r.id_b): r.cos
            for r in F.broadcast(a)
            .join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", sim.cosine(F.col("va"), F.col("vb")).alias("cos"))
            .collect()
        }
        assert got == exp  # same pairs, bit-identical doubles
