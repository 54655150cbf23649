"""etl_spark_gradle_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference
``NhaLeTruc/etl-spark-gradle`` (Scala/Spark ETL framework): declarative
YAML pipelines of source -> transformations -> sink, with data-quality
gates, lineage, and a registry-based extension contract — plus a set of
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) designed for a 100 TB, 1000-executor
deployment while remaining testable on ``local[*]``.

Architecture is Spark-first: every operator declares a logical plan with
the DataFrame/SQL API and lets Catalyst + AQE pick the physical strategy.
No RDD code, no driver-side row loops; Python UDFs only where built-ins
genuinely cannot express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"

from etl_spark_gradle_spark.session import get_spark  # noqa: F401
