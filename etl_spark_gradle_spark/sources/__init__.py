"""Data sources (extractors), registered by type string
(parity: ``pipeline/ExtractorRegistry.scala:13-18``)."""

from etl_spark_gradle_spark.sources.extractors import (  # noqa: F401
    FileExtractor,
    JdbcExtractor,
    KafkaExtractor,
    extract_file,
    extract_jdbc,
    extract_kafka,
)
from etl_spark_gradle_spark.sources.incremental import (  # noqa: F401
    IncrementalFileExtractor,
    list_data_files,
)

EXTRACTOR_REGISTRY = {
    "s3": FileExtractor(),
    "file": FileExtractor(),  # alias: local/HDFS paths use the same reader
    "file_incremental": IncrementalFileExtractor(),
    "postgres": JdbcExtractor("org.postgresql.Driver"),
    "mysql": JdbcExtractor("com.mysql.cj.jdbc.Driver"),
    "jdbc": JdbcExtractor(None),
    "kafka": KafkaExtractor(),
}


def register_extractor(type_key: str, extractor) -> None:
    """User extension point (parity: ``pipeline/ExtractorRegistry.scala:40-42``)."""
    EXTRACTOR_REGISTRY[type_key.lower()] = extractor
