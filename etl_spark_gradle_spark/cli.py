"""CLI entry point (parity: ``Main.scala:187-244``):

    python -m etl_spark_gradle_spark.cli --pipeline p.yaml \
        [--master local[*]] [--conf k=v ...]

Exit code 1 on pipeline failure (``Main.scala:153-155``); structured
JSON log lines with pipeline/run correlation ids
(``logging/StructuredLogger.scala:71-95``).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Run a declarative ETL pipeline")
    parser.add_argument("--pipeline", required=True, help="path to pipeline YAML")
    parser.add_argument("--master", default=None, help="Spark master (default local[*])")
    parser.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra Spark conf, repeatable",
    )
    parser.add_argument(
        "--explain",
        action="store_true",
        help="dry run: build the full plan, print the formatted physical "
        "explain and the resolved lineage chain, execute nothing (no sink "
        "write, no extract job beyond schema resolution)",
    )
    args = parser.parse_args(argv)

    conf: dict[str, str] = {}
    for entry in args.conf:
        key, sep, value = entry.partition("=")
        if not sep:
            parser.error(f"--conf must be K=V, got {entry!r}")
        conf[key] = value

    from etl_spark_gradle_spark.observability import MetricsCollector, StructuredLogger
    from etl_spark_gradle_spark.plans import PipelineExecutor, load_pipeline_yaml
    from etl_spark_gradle_spark.session import get_spark

    try:
        config = load_pipeline_yaml(args.pipeline)
    except FileNotFoundError:
        StructuredLogger(pipeline_id="<unparsed>").error(
            "pipeline YAML not found", path=args.pipeline, status="FAILED"
        )
        return 1
    except Exception as e:  # noqa: BLE001 — config-parse errors exit cleanly
        StructuredLogger(pipeline_id="<unparsed>").error(
            "pipeline YAML invalid", path=args.pipeline, status="FAILED",
            error=f"{type(e).__name__}: {e}",
        )
        return 1
    logger = StructuredLogger(pipeline_id=config.pipeline_id)
    logger.info("pipeline parsed")
    spark = get_spark(app_name=config.pipeline_id, master=args.master, conf=conf)

    if args.explain:
        # plan-review mode: the exact pre-sink plan the run would
        # execute — pushed filters, ReadSchema pruning, exchanges, and
        # broadcasts are all visible BEFORE paying for the job
        from etl_spark_gradle_spark.plans.config import RunContext

        try:
            ctx = RunContext.create(config.pipeline_id, spark)
            _, transformed, steps, _, _ = PipelineExecutor().build_plan(config, ctx)
            logger.info("lineage chain", steps=steps)
            transformed.explain("formatted")
            logger.info("explain complete", status="SUCCESS")
            return 0
        except Exception as e:  # noqa: BLE001 — dry-run errors exit cleanly
            logger.error(
                "explain failed", status="FAILED", error=f"{type(e).__name__}: {e}"
            )
            return 1

    collector = MetricsCollector()
    metrics = PipelineExecutor().execute(config, spark, collector=collector)
    run_logger = logger.child(run_id=metrics.run_id)
    run_logger.log(
        "INFO" if metrics.status == "SUCCESS" else "ERROR",
        "pipeline finished",
        status=metrics.status,
        records_extracted=metrics.records_extracted,
        records_loaded=metrics.records_loaded,
        records_failed=metrics.records_failed,
        duration_seconds=round(metrics.duration_seconds, 3),
        error=metrics.error_details,
    )
    run_logger.info("phase metrics", **collector.snapshot()["phases"])
    return 0 if metrics.status == "SUCCESS" else 1


if __name__ == "__main__":
    sys.exit(main())
