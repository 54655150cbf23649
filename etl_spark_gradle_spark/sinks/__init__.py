"""Data sinks (loaders), registered by type string
(parity: ``pipeline/LoaderRegistry.scala:13-18``)."""

from etl_spark_gradle_spark.sinks.loaders import (  # noqa: F401
    FileLoader,
    JdbcLoader,
    KafkaLoader,
    load_file,
    load_jdbc,
    load_kafka,
)

LOADER_REGISTRY = {
    "s3": FileLoader(),
    "file": FileLoader(),
    "postgres": JdbcLoader("postgres"),
    "mysql": JdbcLoader("mysql"),
    "kafka": KafkaLoader(),
}


def register_loader(type_key: str, loader) -> None:
    """User extension point (parity: ``pipeline/LoaderRegistry.scala:40-42``)."""
    LOADER_REGISTRY[type_key.lower()] = loader
