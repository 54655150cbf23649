"""JDBC sink integration tests against embedded Derby (in-memory, ships
with Spark — no external service), covering the paths the reference
exercises against real Postgres/MySQL
(``integration/QuickstartScenario1Spec.scala:60``,
``loader/PostgresLoader.scala:54-185``): parallel append/overwrite
writes, and the two-phase staged upsert (bulk JDBC write to a staging
table + one driver-side set-based MERGE).

Derby uses the 'ansi' MERGE INTO dialect; postgres/mysql merge SQL is
covered by ``test_pipeline.py`` string assertions since those servers
aren't available here. Identifier-case note: Spark's JDBC writer quotes
column names (preserving case) but passes the table name through
unquoted, which Derby folds to UPPERCASE — the quoted-identifier merge
SQL therefore needs uppercase table names, proving the quoting path on
a real database.
"""

from __future__ import annotations

import pytest

from etl_spark_gradle_spark.sinks.loaders import load_jdbc

URL = "jdbc:derby:memory:etltest;create=true"
DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _opts(table: str) -> dict[str, str]:
    return {"url": URL, "table": table, "driver": DRIVER}


def _read(spark, table):
    return (
        spark.read.format("jdbc")
        .option("url", URL)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .load()
    )


@pytest.fixture(scope="module", autouse=True)
def derby_available(spark):
    try:
        spark._sc._jvm.java.lang.Class.forName(DRIVER)
    except Exception:
        pytest.skip("embedded Derby driver not on the Spark classpath")


def test_jdbc_append_and_overwrite(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    res = load_jdbc(df, _opts("T_APPEND"), write_mode="append", dialect="ansi")
    assert res.records_written == 2
    res2 = load_jdbc(df, _opts("T_APPEND"), write_mode="append", dialect="ansi")
    assert res2.records_written == 2
    assert _read(spark, "T_APPEND").count() == 4

    ow = spark.createDataFrame([(9, "z")], ["k", "v"])
    load_jdbc(ow, _opts("T_APPEND"), write_mode="overwrite", dialect="ansi")
    got = [(r.k, r.v) for r in _read(spark, "T_APPEND").collect()]
    assert got == [(9, "z")]


def test_jdbc_upsert_merge(spark):
    seed = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], ["k", "v", "x"])
    load_jdbc(seed, _opts("T_UPSERT"), write_mode="append", dialect="ansi")

    up = spark.createDataFrame([(2, "B2", 99.0), (3, "c", 30.0)], ["k", "v", "x"])
    res = load_jdbc(
        up,
        {**_opts("T_UPSERT"), "primaryKey": "k"},
        write_mode="upsert",
        dialect="ansi",
        run_id="testrun1",
    )
    assert res.records_written == 2
    got = {r.k: (r.v, r.x) for r in _read(spark, "T_UPSERT").collect()}
    assert got == {1: ("a", 10.0), 2: ("B2", 99.0), 3: ("c", 30.0)}

    # staging table dropped after the merge
    with pytest.raises(Exception):
        _read(spark, "T_UPSERT_staging_testrun1").collect()


def test_jdbc_upsert_composite_pk(spark):
    seed = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], ["k1", "k2", "v"])
    load_jdbc(seed, _opts("T_UPSERT2"), write_mode="append", dialect="ansi")
    up = spark.createDataFrame([(1, 2, "B"), (2, 1, "c")], ["k1", "k2", "v"])
    load_jdbc(
        up,
        {**_opts("T_UPSERT2"), "primaryKey": "k1,k2"},
        write_mode="upsert",
        dialect="ansi",
        run_id="testrun2",
    )
    got = {(r.k1, r.k2): r.v for r in _read(spark, "T_UPSERT2").collect()}
    assert got == {(1, 1): "a", (1, 2): "B", (2, 1): "c"}


def test_jdbc_parallel_partitioned_extract(spark):
    """The multi-TB JDBC path: partitionColumn + numPartitions fan the
    read out into N range-bounded queries; content identical to a
    single-stream read."""
    from etl_spark_gradle_spark.sources.extractors import extract_jdbc

    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], ["k", "v"])
    load_jdbc(df, _opts("T_PART"), write_mode="overwrite", dialect="ansi")

    out = extract_jdbc(
        spark,
        {
            **_opts("T_PART"),
            "partitionColumn": "k",
            "numPartitions": "4",
            "lowerBound": "0",
            "upperBound": "100",
        },
    )
    assert out.rdd.getNumPartitions() == 4
    assert sorted((r.k, r.v) for r in out.collect()) == sorted(
        (r.k, r.v) for r in df.collect()
    )


def test_stream_to_jdbc_upsert_via_foreachbatch(spark, tmp_path):
    """foreachBatch bridge: a file stream lands in a JDBC sink with
    upsert semantics (impossible with native writeStream) — incremental
    reruns upsert only the new files' rows."""
    import json

    from etl_spark_gradle_spark import streaming as stm
    from etl_spark_gradle_spark.plans.config import SinkConfig
    from etl_spark_gradle_spark.sinks import JdbcLoader, register_loader

    register_loader("derby", JdbcLoader("ansi"))
    src = tmp_path / "jsrc"
    src.mkdir()
    ckpt = str(tmp_path / "jckpt")
    sink = SinkConfig(
        type="derby",
        options={**_opts("T_STREAM_UP"), "primaryKey": "k"},
        write_mode="upsert",
    )
    # seed the target table so MERGE has something to hit
    spark.createDataFrame([(0, "seed")], ["k", "v"]).write.format("jdbc").option(
        "url", URL
    ).option("dbtable", "T_STREAM_UP").option("driver", DRIVER).mode(
        "overwrite"
    ).save()

    def drain(rows, fname):
        with open(src / fname, "w", encoding="utf-8") as f:
            for k, v in rows:
                f.write(json.dumps({"k": k, "v": v}) + "\n")
        stream = stm.read_file_stream(
            spark, {"path": str(src), "format": "json"}, "k INT, v STRING"
        )
        q = stm.stream_to_batch_sink(stream, sink, ckpt)
        q.awaitTermination()

    drain([(1, "a"), (2, "b")], "b1.json")
    got = {r.k: r.v for r in _read(spark, "T_STREAM_UP").collect()}
    assert got == {0: "seed", 1: "a", 2: "b"}

    drain([(2, "B"), (3, "c")], "b2.json")  # update 2, insert 3
    got = {r.k: r.v for r in _read(spark, "T_STREAM_UP").collect()}
    assert got == {0: "seed", 1: "a", 2: "B", 3: "c"}
