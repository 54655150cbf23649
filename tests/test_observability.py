"""Structured logging, per-phase metrics, and credentials-file
resolution (vault-file adapter)."""

from __future__ import annotations

import io
import json

from etl_spark_gradle_spark.observability import MetricsCollector, StructuredLogger
from etl_spark_gradle_spark.plans.config import (
    SourceConfig,
    resolve_credentials_file,
    with_resolved_credentials,
)


def test_structured_logger_correlation_fields():
    buf = io.StringIO()
    logger = StructuredLogger(buf, pipeline_id="p1")
    logger.child(run_id="r1").info("hello", n=3)
    record = json.loads(buf.getvalue())
    assert record["pipeline_id"] == "p1"
    assert record["run_id"] == "r1"
    assert record["level"] == "INFO"
    assert record["message"] == "hello"
    assert record["n"] == 3
    assert "ts" in record


def test_metrics_collector_phases():
    c = MetricsCollector(pipeline_id="p", run_id="r")
    with c.phase("load"):
        pass
    c.record("load", 42)
    snap = c.snapshot()
    assert snap["phases"]["load"]["records"] == 42
    assert snap["phases"]["load"]["seconds"] >= 0


def test_credentials_file_resolution(tmp_path, monkeypatch):
    creds = tmp_path / "creds.yaml"
    creds.write_text("user: svc\npassword: ${ENV:TEST_DB_PW}\n", encoding="utf-8")
    monkeypatch.setenv("TEST_DB_PW", "s3cret")
    assert resolve_credentials_file(str(creds)) == {"user": "svc", "password": "s3cret"}

    cfg = SourceConfig(
        type="postgres",
        options={"url": "jdbc:postgresql://h/db", "table": "t", "user": "override"},
        credentials_path=str(creds),
    )
    merged = with_resolved_credentials(cfg)
    # file fills gaps; explicit options win
    assert merged.options["password"] == "s3cret"
    assert merged.options["user"] == "override"
    # no credentialsPath -> untouched object
    plain = SourceConfig(type="s3", options={"path": "/x"})
    assert with_resolved_credentials(plain) is plain


def test_executor_collects_phase_metrics(spark, sf_dir, tmp_path):
    from etl_spark_gradle_spark.plans.config import (
        PipelineConfig,
        QualityConfig,
        SinkConfig,
        TransformationConfig,
    )
    from etl_spark_gradle_spark.plans.executor import PipelineExecutor

    collector = MetricsCollector()
    config = PipelineConfig(
        pipeline_id="t-obs",
        source=SourceConfig(
            type="file",
            options={"path": f"{sf_dir}/nation.parquet", "format": "parquet"},
        ),
        transformations=(
            TransformationConfig(type="filter", options={"condition": "n_regionkey >= 0"}),
        ),
        sink=SinkConfig(
            type="file",
            options={"path": str(tmp_path / "out"), "format": "parquet"},
            write_mode="overwrite",
        ),
        quality=QualityConfig(duplicate_check=True),
    )
    metrics = PipelineExecutor().execute(config, spark, collector=collector)
    assert metrics.status == "SUCCESS"
    phases = collector.snapshot()["phases"]
    assert {"quality", "plan", "load"} <= set(phases)
    assert phases["load"]["records"] == metrics.records_loaded
    assert phases["extract"]["records"] == metrics.records_extracted
