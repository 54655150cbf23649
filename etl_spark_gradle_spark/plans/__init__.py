"""Declarative pipeline plan layer: config data model, YAML frontend,
registries, and the executor that turns a plan into Spark actions."""

from etl_spark_gradle_spark.plans.config import (  # noqa: F401
    AggregateExpr,
    ExecutionMetrics,
    LineageMetadata,
    LoadResult,
    PerformanceConfig,
    PipelineConfig,
    QualityConfig,
    RunContext,
    SinkConfig,
    SourceConfig,
    TransformationConfig,
    ValidationResult,
    load_pipeline_yaml,
    parse_pipeline_dict,
)
from etl_spark_gradle_spark.plans.executor import (  # noqa: F401
    PipelineExecutor,
)
