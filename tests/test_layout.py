"""Z-order clustering (operators/layout.py + the zorderBy sink option)."""

from __future__ import annotations

import glob
import math

import pytest

from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.layout import scale_to_grid, z_value, zorder


def _py_scale(v, mn, mx, bits):
    top = (1 << bits) - 1
    if mx <= mn or v is None:
        return 0
    return max(0, min(top, math.floor((v - mn) * float(top) / (mx - mn))))


def _py_z(vals, bounds, bits):
    nd = len(vals)
    z = 0
    for d, (v, (mn, mx)) in enumerate(zip(vals, bounds)):
        s = _py_scale(v, mn, mx, bits)
        for b in range(bits):
            z += ((s >> b) & 1) << (b * nd + d)
    return z


def test_z_value_matches_python_reference(spark):
    rows = [(i, float(i * 37 % 100), float((i * 61) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    bounds = [(0.0, 99.0), (0.0, 49.0)]
    out = {
        r.id: r.z
        for r in df.select(
            "id", z_value(["x", "y"], bounds, bits=8).alias("z")
        ).collect()
    }
    for i, x, y in rows:
        assert out[i] == _py_z([x, y], bounds, 8), (i, x, y)


def test_scale_to_grid_clamps_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 10.0), (4, 99.0), (5, None)],
        "id int, v double",
    )
    got = {
        r.id: r.s
        for r in df.select("id", scale_to_grid("v", 0.0, 10.0, 4).alias("s")).collect()
    }
    assert got == {1: 0, 2: 0, 3: 15, 4: 15, 5: 0}


def test_z_value_validation():
    with pytest.raises(ValueError, match="at least 2"):
        z_value(["x"], [(0, 1)])
    with pytest.raises(ValueError, match="one \\(min, max\\)"):
        z_value(["x", "y"], [(0, 1)])
    with pytest.raises(ValueError, match="exceeds 63"):
        z_value(["x", "y"], [(0, 1), (0, 1)], bits=32)


def test_zorder_preserves_rows_and_improves_both_dims(spark, tmp_path):
    """Clustering quality, measured: after a z-ordered write each file
    covers a compact rectangle of (x, y) space, so the average per-file
    extent of EACH dimension shrinks well below the full range. A 1-D
    sort on x leaves y's per-file extent at ~full range — that contrast
    is the whole point of the operator."""
    import pyarrow.parquet as pq

    n = 4096
    rows = [(i, float(i * 2654435761 % 1000), float(i * 40503 % 1000)) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "x", "y"]).repartition(8)

    zp = str(tmp_path / "zorded")
    zorder(df, ["x", "y"], bits=10, num_partitions=16).write.parquet(zp)
    sp = str(tmp_path / "sorted_x")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(sp)

    def avg_extent(path, col):
        exts = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        exts.append(c.statistics.max - c.statistics.min)
        return sum(exts) / len(exts)

    full = 999.0
    # z-order: both dims compact
    assert avg_extent(zp, "x") < 0.45 * full
    assert avg_extent(zp, "y") < 0.45 * full
    # 1-D sort: x compact, y ~full — the baseline z-order beats
    assert avg_extent(sp, "x") < 0.2 * full
    assert avg_extent(sp, "y") > 0.8 * full
    # row preservation
    got = spark.read.parquet(zp)
    assert got.count() == n
    assert got.agg(F.sum("id")).collect()[0][0] == sum(r[0] for r in rows)
    assert "__z" not in got.columns


def test_zorder_auto_bounds_equals_explicit(spark):
    df = spark.createDataFrame(
        [(i, float(i % 13), float(i % 7)) for i in range(100)], ["id", "x", "y"]
    )
    a = sorted(r.id for r in zorder(df, ["x", "y"], bits=6).collect())
    b = sorted(
        r.id
        for r in zorder(
            df, ["x", "y"], bits=6, bounds=[(0.0, 12.0), (0.0, 6.0)]
        ).collect()
    )
    assert a == b == list(range(100))


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2.0)], ["id", "x"])
    with pytest.raises(ValueError, match="not in schema"):
        zorder(df, ["x", "nope"])
    allnull = spark.createDataFrame([(1, None), (2, None)], "id int, x double")
    with pytest.raises(ValueError, match="all-null"):
        zorder(allnull.withColumn("y", F.col("id").cast("double")), ["x", "y"])


def test_load_file_zorder_by_option(spark, tmp_path):
    """The sink-level zorderBy option clusters on write through the
    normal loader path."""
    from etl_spark_gradle_spark.sinks.loaders import load_file

    df = spark.createDataFrame(
        [(i, float(i * 31 % 100), float(i * 17 % 100)) for i in range(1000)],
        ["id", "x", "y"],
    )
    path = str(tmp_path / "out")
    res = load_file(
        df,
        {"path": path, "format": "parquet", "zorderBy": "x,y", "zorderPartitions": "8"},
        write_mode="overwrite",
    )
    assert res.records_written == 1000
    assert spark.read.parquet(path).count() == 1000


def test_load_file_target_file_size(spark, tmp_path):
    """targetFileSizeMB picks the output file count from the plan's
    byte estimate: a tiny target yields multiple files, a huge target
    compacts to one."""
    from etl_spark_gradle_spark.sinks.loaders import load_file
    import glob as _glob

    import hashlib

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, hashlib.md5(str(i).encode()).hexdigest() * 8) for i in range(20000)],
        ["id", "pad"],
    ).repartition(8).write.parquet(src)
    df = spark.read.parquet(src)  # file source -> real size statistics
    big = str(tmp_path / "compact")
    load_file(df, {"path": big, "format": "parquet", "targetFileSizeMB": "1024"},
              write_mode="overwrite")
    assert len(_glob.glob(f"{big}/*.parquet")) == 1
    small = str(tmp_path / "split")
    load_file(df, {"path": small, "format": "parquet", "targetFileSizeMB": "0.25"},
              write_mode="overwrite")
    assert len(_glob.glob(f"{small}/*.parquet")) >= 3
    assert spark.read.parquet(big).count() == 20000
    assert spark.read.parquet(small).count() == 20000

    import pytest as _pytest
    from etl_spark_gradle_spark.plans.config import ConfigError

    with _pytest.raises(ConfigError, match="targetFileSizeMB"):
        load_file(df, {"path": str(tmp_path / "bad"), "format": "parquet",
                       "targetFileSizeMB": "0"}, write_mode="overwrite")
    with _pytest.raises(ConfigError, match="numeric"):
        load_file(df, {"path": str(tmp_path / "bad2"), "format": "parquet",
                       "targetFileSizeMB": "abc"}, write_mode="overwrite")
    with _pytest.raises(ConfigError, match="> 0"):
        load_file(df, {"path": str(tmp_path / "bad3"), "format": "parquet",
                       "targetFileSizeMB": "nan"}, write_mode="overwrite")
    # genuinely stats-less source (LogicalRDD -> defaultSizeInBytes
    # sentinel): the option must be a safe no-op, not a task explosion
    from pyspark.sql.types import StringType, LongType, StructField, StructType

    rdd = spark.sparkContext.parallelize([(1, "a")], 4)
    mem = spark.createDataFrame(
        rdd, StructType([StructField("id", LongType()), StructField("pad", StringType())])
    )
    est = float(str(mem._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    assert est >= float(2**62)  # precondition: this really is the no-stats branch
    nostats = str(tmp_path / "nostats")
    load_file(mem, {"path": nostats, "format": "parquet",
                    "targetFileSizeMB": "1"}, write_mode="overwrite")
    assert spark.read.parquet(nostats).count() == 1


def test_zorder_transformer_registry(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [(i, float(i % 10), float(i % 7)) for i in range(100)], ["id", "x", "y"]
    )
    tf = TRANSFORMER_REGISTRY["zorder"]
    cfg = TransformationConfig(
        type="zorder", options={"columns": "x,y", "bits": "6", "partitions": "4"}
    )
    assert tf.validate(df, cfg).is_valid
    out = tf.transform(df, cfg, RunContext.create("t", spark))
    assert sorted(r.id for r in out.collect()) == list(range(100))
    assert "__z" not in out.columns
    bad = TransformationConfig(type="zorder", options={"columns": "x"})
    assert not tf.validate(df, bad).is_valid


class TestParquetStats:
    def test_footer_stats_match_data(self, spark, tmp_path):
        from etl_spark_gradle_spark.operators.layout import parquet_stats

        p = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "a", 1.5), (9, "z", -2.25), (None, None, None)],
            "k int, s string, v double",
        ).coalesce(1).write.parquet(p)
        rows = {r.column: r for r in parquet_stats(spark, p).collect()}
        assert rows["k"].min_value == "1" and rows["k"].max_value == "9"
        assert rows["k"].n_nulls == 1 and rows["k"].n_rows == 3
        assert rows["s"].min_value == "a" and rows["s"].max_value == "z"
        assert rows["v"].min_value == "-2.25" and rows["v"].max_value == "1.5"

    def test_column_filter_and_multi_file(self, spark, tmp_path):
        from etl_spark_gradle_spark.operators.layout import parquet_stats

        p = str(tmp_path / "t")
        spark.range(100).repartition(4).write.parquet(p)
        out = parquet_stats(spark, p, columns=["id"])
        rows = out.collect()
        assert len(rows) == 4  # one per file (single row group each)
        assert {r.column for r in rows} == {"id"}
        assert sum(r.n_rows for r in rows) == 100

    def test_sorted_write_gives_disjoint_ranges(self, spark, tmp_path):
        """The observability claim itself: a range-partitioned sorted
        write must show tight DISJOINT per-file min/max on the sort
        key — exactly what row-group pruning needs."""
        from etl_spark_gradle_spark.operators.layout import parquet_stats

        p = str(tmp_path / "sorted")
        spark.range(1000).repartitionByRange(4, "id").sortWithinPartitions(
            "id"
        ).write.parquet(p)
        rows = sorted(
            ((int(r.min_value), int(r.max_value)) for r in
             parquet_stats(spark, p, columns=["id"]).collect())
        )
        for (lo1, hi1), (lo2, hi2) in zip(rows, rows[1:]):
            assert hi1 < lo2  # disjoint ascending ranges

    def test_empty_dir_refused(self, spark, tmp_path):
        import pytest as _pytest

        from etl_spark_gradle_spark.operators.layout import parquet_stats
        from etl_spark_gradle_spark.operators.relational import TransformationError

        (tmp_path / "empty").mkdir()
        with _pytest.raises(TransformationError, match="no data files"):
            parquet_stats(spark, str(tmp_path / "empty"))
