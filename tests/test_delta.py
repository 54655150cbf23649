"""Snapshot diff / CDC operator (operators/delta.py)."""

from __future__ import annotations

import pytest

from etl_spark_gradle_spark.operators.delta import (
    DiffTransformer,
    table_diff,
)
from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig


def _snapshots(spark):
    prev = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged
            (2, "b", 20.0),   # value update
            (3, None, 30.0),  # null -> value update
            (4, "d", 40.0),   # deleted
            (5, "e", None),   # null stays null -> unchanged
        ],
        ["k", "s", "v"],
    )
    cur = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 21.0),
            (3, "c", 30.0),
            (5, "e", None),
            (6, "f", 60.0),   # inserted
        ],
        ["k", "s", "v"],
    )
    return cur, prev


def test_table_diff_classification(spark):
    cur, prev = _snapshots(spark)
    out = {r.k: r.change_type for r in table_diff(cur, prev, keys=["k"]).collect()}
    assert out == {2: "update", 3: "update", 4: "delete", 6: "insert"}


def test_table_diff_include_unchanged(spark):
    cur, prev = _snapshots(spark)
    out = {
        r.k: r.change_type
        for r in table_diff(cur, prev, keys=["k"], include_unchanged=True).collect()
    }
    assert out[1] == "unchanged" and out[5] == "unchanged" and len(out) == 6


def test_table_diff_null_position_swap_is_update(spark):
    """("a", NULL) vs (NULL, "a") must classify as update — guards the
    null-bitmap term in the fingerprint (xxhash64 alone skips nulls and
    would collide these)."""
    schema = "k int, x string, y string"
    prev = spark.createDataFrame([(1, "a", None)], schema)
    cur = spark.createDataFrame([(1, None, "a")], schema)
    rows = table_diff(cur, prev, keys=["k"]).collect()
    assert [(r.k, r.change_type) for r in rows] == [(1, "update")]


def test_table_diff_emit_rows_carries_current_image(spark):
    cur, prev = _snapshots(spark)
    rows = {r.k: r for r in table_diff(cur, prev, keys=["k"], emit="rows").collect()}
    assert rows[6].s == "f" and rows[6].v == 60.0          # insert image
    assert rows[2].v == 21.0                                # update = new image
    assert rows[4].s is None and rows[4].v is None          # delete has no image
    assert set(rows) == {2, 3, 4, 6}


def test_table_diff_compare_cols_subset(spark):
    cur, prev = _snapshots(spark)
    # only compare s: k=2 (v-only change) drops out, k=3 (s change) stays
    out = {
        r.k: r.change_type
        for r in table_diff(cur, prev, keys=["k"], compare_cols=["s"]).collect()
    }
    assert out == {3: "update", 4: "delete", 6: "insert"}


def test_table_diff_default_compare_is_common_columns(spark):
    """A column present on one side only (schema evolution) is ignored
    by the default compare set instead of flipping everything."""
    prev = spark.createDataFrame([(1, "a")], ["k", "s"])
    cur = spark.createDataFrame([(1, "a", "extra")], ["k", "s", "z"])
    assert table_diff(cur, prev, keys=["k"]).count() == 0


def test_table_diff_validation_errors(spark):
    cur, prev = _snapshots(spark)
    with pytest.raises(ValueError, match="key column not in current"):
        table_diff(cur, prev, keys=["nope"])
    with pytest.raises(ValueError, match="compare column not on both"):
        table_diff(cur, prev, keys=["k"], compare_cols=["nope"])
    with pytest.raises(ValueError, match="emit must be"):
        table_diff(cur, prev, keys=["k"], emit="bogus")
    with pytest.raises(ValueError, match="share only the keys"):
        table_diff(
            cur.select("k"), prev.select("k"), keys=["k"]
        )


def test_diff_transformer_yaml_adapter(spark):
    cur, prev = _snapshots(spark)
    prev.createOrReplaceTempView("prev_snapshot")
    ctx = RunContext(pipeline_id="t", run_id="t", spark=spark)
    cfg = TransformationConfig(
        type="diff",
        options={"previousTable": "prev_snapshot", "keys": "k"},
    )
    out = {r.k: r.change_type for r in DiffTransformer().transform(cur, cfg, ctx).collect()}
    assert out == {2: "update", 3: "update", 4: "delete", 6: "insert"}


def test_diff_transformer_validation(spark):
    cur, _ = _snapshots(spark)
    ctx = RunContext(pipeline_id="t", run_id="t", spark=spark)
    bad = TransformationConfig(type="diff", options={"keys": "k"})
    from etl_spark_gradle_spark.operators.relational import TransformationError

    with pytest.raises(TransformationError, match="previousTable"):
        DiffTransformer().transform(cur, bad, ctx)


def test_cdc_yaml_pipeline_e2e(spark, tmp_path):
    """Full incremental-snapshot pipeline through the YAML executor:
    current snapshot as the source, previous as a `views:` entry, a
    `type: diff` step, parquet sink — the daily CDC job end-to-end."""
    import yaml

    from etl_spark_gradle_spark.plans.config import load_pipeline_yaml
    from etl_spark_gradle_spark.plans.executor import PipelineExecutor

    cur, prev = _snapshots(spark)
    cur_p, prev_p = str(tmp_path / "cur"), str(tmp_path / "prev")
    cur.write.parquet(cur_p)
    prev.write.parquet(prev_p)

    doc = {
        "pipelineId": "daily-cdc",
        "source": {"type": "file", "options": {"path": cur_p, "format": "parquet"}},
        "views": {
            "yesterday": {
                "type": "file",
                "options": {"path": prev_p, "format": "parquet"},
            }
        },
        "transformations": [
            {
                "type": "diff",
                "options": {"previousTable": "yesterday", "keys": "k", "emit": "rows"},
            }
        ],
        "sink": {
            "type": "file",
            "options": {"path": str(tmp_path / "changes"), "format": "parquet"},
            "writeMode": "overwrite",
        },
    }
    p = tmp_path / "cdc.yaml"
    p.write_text(yaml.safe_dump(doc))
    config = load_pipeline_yaml(str(p))
    metrics = PipelineExecutor().execute(config, spark)
    assert metrics.status == "SUCCESS"
    out = spark.read.parquet(str(tmp_path / "changes"))
    got = {r.k: r.change_type for r in out.collect()}
    assert got == {2: "update", 3: "update", 4: "delete", 6: "insert"}


def test_diff_plan_shape(spark):
    """emit='keys' must not carry non-key data columns through the
    join: the pre-shuffle projections reduce each side to key +
    fingerprint, so wide snapshots diff at ~16 bytes/row shuffle."""
    cur, prev = _snapshots(spark)
    plan = table_diff(cur, prev, keys=["k"])._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    join_idx = next(i for i, l in enumerate(lines) if "Join FullOuter" in l)
    # the fingerprint projection sits BELOW the join on both sides, so
    # the exchange carries (k, _fp, _in) — never the data columns
    children = [l for l in lines[join_idx + 1 :] if "Project [" in l][:2]
    assert len(children) == 2
    for child in children:
        assert "xxhash64" in child and "_fp_" in child


def test_apply_changes_roundtrip(spark):
    """apply_changes(prev, table_diff(cur, prev, emit='rows')) == cur —
    the algebraic inverse that makes the diff feed a replication
    format."""
    from etl_spark_gradle_spark.operators.delta import apply_changes

    cur, prev = _snapshots(spark)
    changes = table_diff(cur, prev, keys=["k"], emit="rows")
    rebuilt = apply_changes(prev, changes, keys=["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, cur.collect()))


def test_apply_changes_roundtrip_property(spark):
    """Randomized round-trip: arbitrary overlapping snapshots with
    updates/inserts/deletes/nulls always reconstruct exactly."""
    import random

    from etl_spark_gradle_spark.operators.delta import apply_changes

    rng = random.Random(42)
    for trial in range(5):
        prev_rows, cur_rows = [], []
        for k in range(30):
            in_prev, in_cur = rng.random() < 0.7, rng.random() < 0.7
            pv = (k, rng.choice(["a", "b", None]), rng.choice([1.0, 2.0, None]))
            cv = (
                (k, rng.choice(["a", "b", None]), rng.choice([1.0, 2.0, None]))
                if rng.random() < 0.5
                else pv
            )
            if in_prev:
                prev_rows.append(pv)
            if in_cur:
                cur_rows.append(cv)
        schema = "k int, s string, v double"
        prev = spark.createDataFrame(prev_rows or [(999, None, None)], schema)
        cur = spark.createDataFrame(cur_rows or [(998, None, None)], schema)
        changes = table_diff(cur, prev, keys=["k"], emit="rows")
        rebuilt = apply_changes(prev, changes, keys=["k"])
        assert sorted(map(tuple, rebuilt.collect())) == sorted(
            map(tuple, cur.collect())
        ), f"trial {trial}"


def test_apply_changes_validation(spark):
    from etl_spark_gradle_spark.operators.delta import apply_changes

    cur, prev = _snapshots(spark)
    keys_only = table_diff(cur, prev, keys=["k"])  # emit='keys'
    with pytest.raises(ValueError, match="emit='rows'"):
        apply_changes(prev, keys_only, keys=["k"])
    with pytest.raises(ValueError, match="change_type"):
        apply_changes(prev, prev, keys=["k"])
    with pytest.raises(ValueError, match="at least one key"):
        apply_changes(prev, keys_only, keys=[])


# ---------------------------------------------------------------------------
# SCD Type 2
# ---------------------------------------------------------------------------


def _scd2_fixtures(spark):
    from etl_spark_gradle_spark.operators.delta import scd2_init

    dim_src = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], ["k", "tier"]
    )
    dim = scd2_init(dim_src, ["k"], ["tier"], "2020-01-01")
    changes = spark.createDataFrame(
        [
            # k=1: gold -> silver -> silver (consecutive dup collapses) -> gold
            (1, "silver", "2020-02-01 00:00:00"),
            (1, "silver", "2020-03-01 00:00:00"),
            (1, "gold", "2020-04-01 00:00:00"),
            # k=2: leading change equal to current -> fully collapses
            (2, "silver", "2020-02-15 00:00:00"),
            # k=4: brand-new key
            (4, "gold", "2020-05-01 00:00:00"),
        ],
        ["k", "tier", "eff"],
    )
    return dim, changes


def test_scd2_apply_sequencing_and_collapse(spark):
    from etl_spark_gradle_spark.operators.delta import scd2_apply

    dim, changes = _scd2_fixtures(spark)
    out = scd2_apply(dim, changes, ["k"], ["tier"], "eff")
    rows = {
        (r.k, r.tier, str(r.valid_from)[:10], str(r.valid_to)[:10] if r.valid_to else None, r.is_current)
        for r in out.collect()
    }
    assert rows == {
        # k=1: three versions (the 03-01 duplicate silver collapsed)
        (1, "gold", "2020-01-01", "2020-02-01", False),
        (1, "silver", "2020-02-01", "2020-04-01", False),
        (1, "gold", "2020-04-01", None, True),
        # k=2: change identical to current collapsed -> still version 1
        (2, "silver", "2020-01-01", None, True),
        # k=3: untouched passthrough
        (3, "bronze", "2020-01-01", None, True),
        # k=4: new key enters at its first change
        (4, "gold", "2020-05-01", None, True),
    }


def test_scd2_apply_preserves_history_rows(spark):
    from etl_spark_gradle_spark.operators.delta import scd2_apply

    dim, changes = _scd2_fixtures(spark)
    once = scd2_apply(dim, changes, ["k"], ["tier"], "eff")
    # second batch touching only k=3: every closed row from batch 1
    # must pass through bit-identically
    batch2 = spark.createDataFrame([(3, "gold", "2021-01-01 00:00:00")], ["k", "tier", "eff"])
    twice = scd2_apply(once, batch2, ["k"], ["tier"], "eff")
    hist_once = {tuple(map(str, r)) for r in once.where("NOT is_current").collect()}
    hist_twice = {tuple(map(str, r)) for r in twice.where("NOT is_current").collect()}
    assert hist_once <= hist_twice
    assert twice.where("k = 3").count() == 2
    assert twice.where("k = 3 AND is_current").collect()[0].tier == "gold"


def test_scd2_apply_validation(spark):
    from etl_spark_gradle_spark.operators.delta import scd2_apply

    dim, changes = _scd2_fixtures(spark)
    with pytest.raises(ValueError, match="at least one key"):
        scd2_apply(dim, changes, [], ["tier"], "eff")
    with pytest.raises(ValueError, match="at least one attribute"):
        scd2_apply(dim, changes, ["k"], [], "eff")
    with pytest.raises(ValueError, match="missing column"):
        scd2_apply(dim.drop("valid_to"), changes, ["k"], ["tier"], "eff")
    with pytest.raises(ValueError, match="missing column"):
        scd2_apply(dim, changes.drop("eff"), ["k"], ["tier"], "eff")


def test_scd2_transformer_yaml_adapter(spark):
    from etl_spark_gradle_spark.operators.delta import Scd2Transformer

    dim, changes = _scd2_fixtures(spark)
    dim.createOrReplaceTempView("scd2_dim_v")
    t = Scd2Transformer()
    cfg = TransformationConfig(
        type="scd2",
        options={"dimTable": "scd2_dim_v", "keys": "k", "effectiveColumn": "eff"},
    )
    assert t.validate(changes, cfg).is_valid
    out = t.transform(changes, cfg, RunContext(spark=spark, run_id="t", pipeline_id="t"))
    # attrColumns defaulted to the shared non-key, non-SCD column: tier
    assert out.where("is_current").count() == 4

    bad = TransformationConfig(type="scd2", options={"keys": "k", "effectiveColumn": "eff"})
    assert not t.validate(changes, bad).is_valid
    missing_eff = TransformationConfig(
        type="scd2", options={"dimTable": "scd2_dim_v", "keys": "k"}
    )
    assert not t.validate(changes, missing_eff).is_valid


# ---------------------------------------------------------------------------
# emit="both" and incremental aggregate maintenance
# ---------------------------------------------------------------------------


def test_table_diff_emit_both_carries_prev_images(spark):
    cur, prev = _snapshots(spark)
    out = {r.k: r for r in
           table_diff(cur, prev, ["k"], emit="both").collect()}
    # update: both images present
    assert out[2].v == 21.0 and out[2].prev_v == 20.0
    # insert: prev image NULL
    assert out[6].prev_s is None and out[6].s == "f"
    # delete: current image NULL
    assert out[4].s is None and out[4].prev_s == "d"


def test_incremental_aggregate_equals_recompute(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.delta import (
        incremental_aggregate,
        table_diff,
    )
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 5)],
        ["id", "g", "v"],
    )
    # update id=1, delete id=4 (kills group c), insert id=5 (new group d)
    v2 = spark.createDataFrame(
        [(1, "a", 11), (2, "a", 20), (3, "b", 30), (5, "d", 7)],
        ["id", "g", "v"],
    )
    state = v1.groupBy("g").agg(F.sum("v").alias("s"), F.count("*").alias("cnt"))
    diff = table_diff(v2, v1, ["id"], emit="both")
    ins = diff.where("change_type IN ('insert','update')").select("g", "v")
    dele = diff.where("change_type IN ('delete','update')").select(
        F.col("prev_g").alias("g"), F.col("prev_v").alias("v")
    )
    got = {
        r.g: (r.s, r.cnt)
        for r in incremental_aggregate(
            state, ["g"],
            [AggregateExpr("v", "sum", "s"), AggregateExpr("*", "count", "cnt")],
            inserted=ins, deleted=dele,
        ).collect()
    }
    want = {
        r.g: (r.s, r.cnt)
        for r in v2.groupBy("g")
        .agg(F.sum("v").alias("s"), F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want  # group c dropped, group d entered, a updated


def test_incremental_aggregate_min_max_inserts_only(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.delta import incremental_aggregate
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    state = spark.createDataFrame([("a", 5, 9, 2)], ["g", "lo", "hi", "cnt"])
    ins = spark.createDataFrame([("a", 3), ("b", 100)], ["g", "v"])
    specs = [
        AggregateExpr("v", "min", "lo"),
        AggregateExpr("v", "max", "hi"),
        AggregateExpr("*", "count", "cnt"),
    ]
    got = {
        r.g: (r.lo, r.hi, r.cnt)
        for r in incremental_aggregate(state, ["g"], specs, inserted=ins).collect()
    }
    assert got == {"a": (3, 9, 3), "b": (100, 100, 1)}
    with _pytest.raises(ValueError, match="not maintainable under deletes"):
        incremental_aggregate(state, ["g"], specs, inserted=ins, deleted=ins)


def test_incremental_aggregate_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.delta import incremental_aggregate
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    state = spark.createDataFrame([("a", 1.0, 1)], ["g", "s", "cnt"])
    ins = spark.createDataFrame([("a", 2.0)], ["g", "v"])
    with _pytest.raises(ValueError, match="include count"):
        incremental_aggregate(
            state, ["g"], [AggregateExpr("v", "sum", "s")], inserted=ins
        )
    with _pytest.raises(ValueError, match="supports"):
        incremental_aggregate(
            state, ["g"],
            [AggregateExpr("v", "median", "s"),
             AggregateExpr("*", "count", "cnt")],
            inserted=ins,
        )
    with _pytest.raises(ValueError, match="missing aggregate column"):
        incremental_aggregate(
            state.drop("s"), ["g"],
            [AggregateExpr("v", "sum", "s"), AggregateExpr("*", "count", "cnt")],
            inserted=ins,
        )


def test_dimension_maintenance_yaml_pipeline_e2e(spark, tmp_path):
    """The pipelines/dimension-maintenance.yaml shape end-to-end: gate
    the change feed with `type: expect`, fold it into the SCD2 dim with
    `type: scd2`, write the next dimension state."""
    import yaml

    from etl_spark_gradle_spark.operators.delta import scd2_init
    from etl_spark_gradle_spark.plans.config import load_pipeline_yaml
    from etl_spark_gradle_spark.plans.executor import PipelineExecutor

    dim_src = spark.createDataFrame([(1, "gold"), (2, "silver")], ["k", "tier"])
    dim = scd2_init(dim_src, ["k"], ["tier"], "2020-01-01")
    feed = spark.createDataFrame(
        [(1, "silver", "2020-06-01 00:00:00"), (3, "gold", "2020-06-01 00:00:00")],
        ["k", "tier", "eff"],
    )
    dim_p, feed_p = str(tmp_path / "dim"), str(tmp_path / "feed")
    dim.write.parquet(dim_p)
    feed.write.parquet(feed_p)

    doc = {
        "pipelineId": "dim-maintenance",
        "source": {"type": "file", "options": {"path": feed_p, "format": "parquet"}},
        "views": {
            "customer_dim": {
                "type": "file", "options": {"path": dim_p, "format": "parquet"},
            }
        },
        "transformations": [
            {
                "type": "expect",
                "options": {
                    "action": "gate",
                    "checks": "not_null:k; not_null:eff; in_set:tier:gold|silver",
                },
            },
            {
                "type": "scd2",
                "options": {
                    "dimTable": "customer_dim", "keys": "k", "effectiveColumn": "eff",
                },
            },
        ],
        "sink": {
            "type": "file",
            "options": {"path": str(tmp_path / "next"), "format": "parquet"},
            "writeMode": "overwrite",
        },
    }
    p = tmp_path / "dim.yaml"
    p.write_text(yaml.safe_dump(doc))
    metrics = PipelineExecutor().execute(load_pipeline_yaml(str(p)), spark)
    assert metrics.status == "SUCCESS"
    out = spark.read.parquet(str(tmp_path / "next"))
    rows = {(r.k, r.tier, r.is_current) for r in out.collect()}
    assert rows == {
        (1, "gold", False), (1, "silver", True),
        (2, "silver", True), (3, "gold", True),
    }

    # gate failure path: a feed violating in_set fails the RUN
    bad = spark.createDataFrame([(9, "platinum", "2020-06-02 00:00:00")],
                                ["k", "tier", "eff"])
    bad_p = str(tmp_path / "bad_feed")
    bad.write.parquet(bad_p)
    doc["source"]["options"]["path"] = bad_p
    p.write_text(yaml.safe_dump(doc))
    metrics = PipelineExecutor().execute(load_pipeline_yaml(str(p)), spark)
    assert metrics.status == "FAILED"
    assert "in_set:tier" in (metrics.error_details or "")


def test_table_checksum_order_independent_and_mergeable(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.delta import table_checksum

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], ["k", "s"]
    )
    base = table_checksum(df).collect()[0]
    # order independence: reversed input, same checksum
    rev = table_checksum(df.orderBy(F.desc("k"))).collect()[0]
    assert (base.checksum, base.row_count) == (rev.checksum, rev.row_count)
    # sensitivity: any value change moves the checksum
    changed = table_checksum(
        df.withColumn("s", F.when(F.col("k") == 1, "z").otherwise(F.col("s")))
    ).collect()[0]
    assert changed.checksum != base.checksum
    # mergeability: per-half checksums sum to the whole
    a = table_checksum(df.where("k <= 1")).collect()[0]
    b = table_checksum(df.where("k > 1")).collect()[0]
    assert a.checksum + b.checksum == base.checksum
    assert a.row_count + b.row_count == base.row_count
    # md5 flavor is deterministic across sessions (fixed algorithm)
    md5_a = table_checksum(df, hash_fn="md5").collect()[0]
    md5_b = table_checksum(df, hash_fn="md5").collect()[0]
    assert md5_a.checksum == md5_b.checksum

    with pytest.raises(ValueError, match="hash_fn"):
        table_checksum(df, hash_fn="crc")
    with pytest.raises(ValueError, match="not in schema"):
        table_checksum(df, ["nope"])


# ---------------------------------------------------------------------------
# scd2_lookup (point-in-time temporal join)
# ---------------------------------------------------------------------------


def test_scd2_lookup_point_in_time(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.delta import scd2_apply, scd2_lookup

    dim, changes = _scd2_fixtures(spark)
    timeline = scd2_apply(dim, changes, ["k"], ["tier"], "eff")
    facts = spark.createDataFrame(
        [
            (1, "2020-01-15 00:00:00", 10.0),  # k=1 inside gold v1
            (2, "2020-02-20 00:00:00", 20.0),  # k=1 inside silver v2... k=2 v1
            (1, "2020-03-15 00:00:00", 30.0),  # k=1 inside silver v2
            (1, "2020-06-01 00:00:00", 40.0),  # k=1 inside current gold v3
            (1, "2019-12-01 00:00:00", 50.0),  # before any version -> NULL
            (9, "2020-06-01 00:00:00", 60.0),  # unknown key -> NULL
        ],
        ["k", "ts", "amount"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_lookup(facts, timeline, ["k"], "ts")
    rows = {(r.k, r.amount): r.tier for r in out.collect()}
    assert out.count() == facts.count()  # at-most-one version per fact
    assert rows[(1, 10.0)] == "gold"
    assert rows[(2, 20.0)] == "silver"
    assert rows[(1, 30.0)] == "silver"
    assert rows[(1, 40.0)] == "gold"
    assert rows[(1, 50.0)] is None
    assert rows[(9, 60.0)] is None
    # boundary semantics: valid_from inclusive, valid_to exclusive
    edge = spark.createDataFrame(
        [(1, "2020-02-01 00:00:00", 1.0), (1, "2020-04-01 00:00:00", 2.0)],
        ["k", "ts", "amount"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    e = {r.amount: r.tier for r in scd2_lookup(edge, timeline, ["k"], "ts").collect()}
    assert e[1.0] == "silver" and e[2.0] == "gold"
    # provenance column
    pv = scd2_lookup(facts, timeline, ["k"], "ts", include_valid_from=True)
    assert "valid_from" in pv.columns


def test_scd2_lookup_validation_and_adapter(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.delta import (
        Scd2LookupTransformer,
        scd2_apply,
        scd2_lookup,
    )
    from etl_spark_gradle_spark.operators.relational import TransformationError

    dim, changes = _scd2_fixtures(spark)
    timeline = scd2_apply(dim, changes, ["k"], ["tier"], "eff")
    facts = spark.createDataFrame(
        [(1, "2020-06-01 00:00:00")], ["k", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with _pytest.raises(TransformationError, match="fact column"):
        scd2_lookup(facts, timeline, ["k"], "nope")
    with _pytest.raises(TransformationError, match="missing column"):
        scd2_lookup(facts, timeline.drop("valid_to"), ["k"], "ts")
    with _pytest.raises(TransformationError, match="collide"):
        scd2_lookup(facts.withColumn("tier", F.lit("x")), timeline, ["k"], "ts")

    timeline.createOrReplaceTempView("scd2_lookup_dim_v")
    t = Scd2LookupTransformer()
    cfg = TransformationConfig(
        type="scd2_lookup",
        options={"dimTable": "scd2_lookup_dim_v", "keys": "k", "timeColumn": "ts"},
    )
    assert t.validate(facts, cfg).is_valid
    out = t.transform(
        facts, cfg, RunContext(spark=spark, run_id="t", pipeline_id="t")
    )
    assert out.collect()[0].tier == "gold"
    for bad in (
        {"keys": "k", "timeColumn": "ts"},
        {"dimTable": "scd2_lookup_dim_v", "timeColumn": "ts"},
        {"dimTable": "scd2_lookup_dim_v", "keys": "k"},
        {"dimTable": "scd2_lookup_dim_v", "keys": "k", "timeColumn": "zz"},
    ):
        assert not t.validate(
            facts, TransformationConfig(type="scd2_lookup", options=bad)
        ).is_valid


def test_scd2_lookup_fact_vf_vt_columns_survive(spark):
    """A fact table that legitimately owns columns named _vf/_vt must
    not have them silently dropped by scd2_lookup's internal interval
    aliases (regression: reserved names were hardcoded)."""
    from etl_spark_gradle_spark.operators.delta import scd2_lookup

    facts = spark.createDataFrame(
        [(1, 5, "keep_a", "keep_b")], "k int, ts int, _vf string, _vt string"
    )
    dim = spark.createDataFrame(
        [(1, 0, 10, "gold")], "k int, valid_from int, valid_to int, tier string"
    )
    out = scd2_lookup(facts, dim, ["k"], "ts")
    assert {"_vf", "_vt", "tier"} <= set(out.columns)
    r = out.collect()[0]
    assert (r["_vf"], r["_vt"], r["tier"]) == ("keep_a", "keep_b", "gold")


class TestConsolidate:
    def _dups(self, spark):
        rows = [
            # entity 1: three source rows, email observed then lost
            (1, 10, "a@x.com", 100.0, "crm"),
            (1, 20, None, 50.0, "web"),
            (1, 30, "b@x.com", 25.0, "app"),
            # entity 2: single row
            (2, 5, None, 10.0, "crm"),
        ]
        return spark.createDataFrame(
            rows, "eid long, seq long, email string, spend double, src string"
        )

    def test_survivorship_rules(self, spark):
        from pyspark.sql import functions as F

        from etl_spark_gradle_spark.operators.delta import consolidate

        out = {
            r.eid: r
            for r in consolidate(
                self._dups(spark),
                keys=["eid"],
                rules={
                    "email": "last_non_null",
                    "spend": "sum_exact",
                    "src": "first",
                    "seq": "max",
                },
                order_by=["seq"],
            ).collect()
        }
        e1 = out[1]
        assert e1.email == "b@x.com"      # latest OBSERVED email
        assert e1.spend == 175.0          # exact decimal sum
        assert e1.src == "crm"            # first row's source
        assert e1.seq == 30 and e1.n_rows == 3
        e2 = out[2]
        assert e2.email is None and e2.n_rows == 1
        # positional 'last' vs 'last_non_null': last row's email is
        # b@x.com here, but with entity-1 rows reordered so the NULL is
        # last, positional 'last' yields NULL while last_non_null holds
        reordered = self._dups(spark).withColumn(
            "seq2",
            F.when(F.col("seq") == 20, 99).otherwise(F.col("seq")),
        )
        from etl_spark_gradle_spark.operators.delta import (
            consolidate as cons,
        )

        got = {
            r.eid: (r.email,)
            for r in cons(
                reordered, ["eid"], {"email": "last"}, order_by=["seq2"]
            ).collect()
        }
        assert got[1] == (None,)
        got_nn = {
            r.eid: r.email
            for r in cons(
                reordered, ["eid"], {"email": "last_non_null"},
                order_by=["seq2"],
            ).collect()
        }
        assert got_nn[1] == "b@x.com"

    def test_collect_set_validation_and_adapter(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.delta import consolidate
        from etl_spark_gradle_spark.operators.relational import (
            TransformationError,
        )

        df = self._dups(spark)
        srcs = {
            r.eid: list(r.src)
            for r in consolidate(
                df, ["eid"], {"src": "collect_set"}
            ).collect()
        }
        assert srcs[1] == ["app", "crm", "web"]  # sorted, deterministic
        with pytest.raises(TransformationError, match="needs order_by"):
            consolidate(df, ["eid"], {"src": "first"})
        with pytest.raises(TransformationError, match="unknown consolidate"):
            consolidate(df, ["eid"], {"src": "bogus"})
        with pytest.raises(TransformationError, match="entity key"):
            consolidate(df, ["eid"], {"eid": "max"})
        t = TRANSFORMER_REGISTRY["consolidate"]
        cfg = TransformationConfig(
            type="consolidate",
            options={"keys": "eid", "orderBy": "seq",
                     "rules": "email:last_non_null,spend:sum_exact"},
        )
        assert t.validate(df, cfg).is_valid
        out = t.transform(
            df, cfg, RunContext(pipeline_id="t", run_id="r", spark=spark)
        )
        assert set(out.columns) == {"eid", "email", "spend", "n_rows"}
        bad = TransformationConfig(
            type="consolidate", options={"keys": "eid", "rules": "email"}
        )
        assert not t.validate(df, bad).is_valid
