"""Pipeline executor: extract -> transform* -> load, with quality gates.

Parity: ``pipeline/PipelineExecutor.scala:23-165`` — same phase
structure, same failure contract (catch-all -> ``ExecutionMetrics``
with status=FAILED), same quality-gated variant (null-check split,
quarantine, transform only the valid branch).

Deliberate divergences for scale (SURVEY §4 anti-patterns):
- The reference runs ``count()`` after extract and after transform plus
  a ``count()`` inside the loader — the whole plan (including JDBC
  re-reads) executes up to 3x. Here the sink write is the ONLY action;
  extracted/transformed/loaded counts ride on ``df.observe()`` attached
  to that one action.
- Lineage is computed driver-side and stamped once (see ``lineage.py``),
  not re-read from the data per step.
- ``cacheIntermediate`` is honored (config-only dead code in the
  reference) and ``quality.quarantinePath`` is honored
  (hardcoded at ``pipeline/PipelineExecutor.scala:113``).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from etl_spark_gradle_spark import lineage as lineage_mod
from etl_spark_gradle_spark.plans.config import (
    ExecutionMetrics,
    PipelineConfig,
    RunContext,
)
from etl_spark_gradle_spark.quality import split_valid_invalid, validate_schema


class PipelineExecutor:
    """Drives one ``PipelineConfig`` to completion.

    Three-level API preserved from the reference (SURVEY §3.3):
    (a) CLI (``cli.py``), (b) ``PipelineExecutor().execute(config, spark)``,
    (c) the individual operator functions in ``operators/``.
    """

    def __init__(self, extractors=None, transformers=None, loaders=None):
        # late imports keep registries overridable and import-cheap
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.sinks import LOADER_REGISTRY
        from etl_spark_gradle_spark.sources import EXTRACTOR_REGISTRY

        self.extractors = extractors or EXTRACTOR_REGISTRY
        self.transformers = transformers or TRANSFORMER_REGISTRY
        self.loaders = loaders or LOADER_REGISTRY

    # -- plan construction (no actions) ------------------------------------

    def build_plan(
        self, config: PipelineConfig, ctx: RunContext
    ) -> tuple[DataFrame, DataFrame, list[str]]:
        """Compose the full lazy plan. Returns (extracted, transformed,
        lineage_steps). Phase structure parity:
        ``pipeline/PipelineExecutor.scala:30-48``."""
        extractor = self.extractors.get(config.source.type)
        if extractor is None:
            raise KeyError(f"no extractor registered for source type '{config.source.type}'")
        df = extractor.extract(config.source, ctx.spark)

        if config.performance.shuffle_partitions:
            ctx.spark.conf.set(
                "spark.sql.shuffle.partitions", str(config.performance.shuffle_partitions)
            )
        if config.performance.repartition:
            df = df.repartition(config.performance.repartition)

        steps: list[str] = []
        out = df
        for t_config in config.transformations:
            transformer = self.transformers.get(t_config.type)
            if transformer is None:
                raise KeyError(f"no transformer registered for type '{t_config.type}'")
            out = transformer.transform(out, t_config, ctx)
            steps.append(transformer.lineage_step(t_config))
            if config.performance.cache_intermediate:
                out = out.cache()
        return df, out, steps

    # -- execution ----------------------------------------------------------

    def execute(self, config: PipelineConfig, spark: SparkSession) -> ExecutionMetrics:
        """Plain run (parity: ``pipeline/PipelineExecutor.scala:23-83``).
        Routes to the quality-gated path when quality checks are enabled
        (parity: ``Main.scala:105-123``)."""
        if config.quality.enabled:
            return self.execute_with_quality(config, spark)
        ctx = RunContext.create(config.pipeline_id, spark)
        metrics = ExecutionMetrics(config.pipeline_id, ctx.run_id, start_timestamp=time.time())
        metrics.status = "RUNNING"
        try:
            extracted, transformed, steps = self.build_plan(config, ctx)

            extractor = self.extractors[config.source.type]
            meta = lineage_mod.build_lineage(
                config.source.type, extractor.source_identifier(config.source), steps
            )
            final = lineage_mod.stamp_lineage(transformed, meta, config.pipeline_id, ctx.run_id)

            loader = self.loaders.get(config.sink.type)
            if loader is None:
                raise KeyError(f"no loader registered for sink type '{config.sink.type}'")
            result = loader.load(final, config.sink, ctx.run_id)

            metrics.records_loaded = result.records_written
            metrics.records_transformed = result.records_written
            metrics.records_extracted = result.records_written if not steps else -1
            metrics.status = "SUCCESS"
        except Exception as e:  # noqa: BLE001 — failure contract returns metrics
            metrics.status = "FAILED"
            metrics.error_details = f"{type(e).__name__}: {e}"
        finally:
            metrics.end_timestamp = time.time()
        return metrics

    def execute_with_quality(self, config: PipelineConfig, spark: SparkSession) -> ExecutionMetrics:
        """Quality-gated run (parity:
        ``pipeline/PipelineExecutor.scala:90-165``): extract -> null-check
        split -> quarantine invalid -> transform valid -> load."""
        ctx = RunContext.create(config.pipeline_id, spark)
        metrics = ExecutionMetrics(config.pipeline_id, ctx.run_id, start_timestamp=time.time())
        metrics.status = "RUNNING"
        try:
            extractor = self.extractors.get(config.source.type)
            if extractor is None:
                raise KeyError(f"no extractor registered for source type '{config.source.type}'")
            extracted = extractor.extract(config.source, ctx.spark)

            if config.quality.schema_validation and config.source.schema_path:
                from pyspark.sql.types import StructType
                import json as _json

                with open(config.source.schema_path, encoding="utf-8") as f:
                    expected = StructType.fromJson(_json.load(f))
                result = validate_schema(extracted.schema, expected)
                if not result.is_valid:
                    raise ValueError("schema validation failed: " + "; ".join(result.errors))

            valid, invalid = split_valid_invalid(extracted, list(config.quality.null_checks))

            if config.quality.null_checks:
                quarantine_path = (
                    config.quality.quarantine_path or f"/tmp/quarantine/{config.pipeline_id}"
                )
                from etl_spark_gradle_spark.quality import quarantine as quarantine_write

                metrics.records_failed = quarantine_write(
                    invalid, quarantine_path, config.pipeline_id, ctx.run_id
                )

            steps: list[str] = []
            out = valid
            if config.performance.repartition:
                out = out.repartition(config.performance.repartition)
            for t_config in config.transformations:
                transformer = self.transformers.get(t_config.type)
                if transformer is None:
                    raise KeyError(f"no transformer registered for type '{t_config.type}'")
                out = transformer.transform(out, t_config, ctx)
                steps.append(transformer.lineage_step(t_config))

            meta = lineage_mod.build_lineage(
                config.source.type, extractor.source_identifier(config.source), steps
            )
            final = lineage_mod.stamp_lineage(out, meta, config.pipeline_id, ctx.run_id)

            loader = self.loaders.get(config.sink.type)
            if loader is None:
                raise KeyError(f"no loader registered for sink type '{config.sink.type}'")
            result = loader.load(final, config.sink, ctx.run_id)

            metrics.records_loaded = result.records_written
            metrics.records_transformed = result.records_written
            metrics.status = "SUCCESS"
        except Exception as e:  # noqa: BLE001
            metrics.status = "FAILED"
            metrics.error_details = f"{type(e).__name__}: {e}"
        finally:
            metrics.end_timestamp = time.time()
        return metrics
