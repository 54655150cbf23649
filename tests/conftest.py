"""Shared pytest fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_spark_gradle_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        conf={"spark.sql.shuffle.partitions": "4", "spark.driver.memory": "4g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load_table(spark, name: str, sf_dir: str = SF_DIR):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
