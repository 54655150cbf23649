"""Module-health smoke tests: annotation resolvability across the
engine package (regression guard for the round-2 `Column | None` nit —
an annotation naming a symbol the module never imports is harmless at
runtime under ``from __future__ import annotations`` but breaks
``typing.get_type_hints`` for every downstream tool), plus the avro
environment gate.
"""

from __future__ import annotations

import glob
import importlib
import inspect
import os
import typing

import pytest

_PKG_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "etl_spark_gradle_spark")


def _engine_modules():
    for path in sorted(glob.glob(os.path.join(_PKG_ROOT, "**", "*.py"), recursive=True)):
        rel = os.path.relpath(path, os.path.dirname(_PKG_ROOT))
        if "__pycache__" in rel:
            continue
        yield rel[:-3].replace(os.sep, ".").removesuffix(".__init__")


@pytest.mark.parametrize("modname", list(_engine_modules()))
def test_type_hints_resolve(modname):
    mod = importlib.import_module(modname)
    for name, fn in inspect.getmembers(mod, inspect.isfunction):
        if fn.__module__ != modname:
            continue
        typing.get_type_hints(fn)  # raises NameError on unimported symbols
    for _, cls in inspect.getmembers(mod, inspect.isclass):
        if cls.__module__ != modname:
            continue
        for _, meth in inspect.getmembers(cls, inspect.isfunction):
            if meth.__module__ == modname:
                typing.get_type_hints(meth)


def _spark_avro_available() -> bool:
    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*.jar"))
    return any("spark-avro" in os.path.basename(j) for j in jars)


@pytest.mark.skipif(
    not _spark_avro_available(),
    reason=(
        "spark-avro connector jar not bundled with this pyspark install "
        "(only avro-* core jars ship); to enable: spark-submit --packages "
        "org.apache.spark:spark-avro_2.13:<spark-version>, or drop "
        "spark-avro_2.13-<ver>.jar into $SPARK_HOME/jars. The engine's "
        "avro read/write branches (sources/extractors.py, sinks/loaders.py) "
        "raise a ConfigError pointing at that command when the jar is absent."
    ),
)
def test_roundtrip_avro(spark, tmp_path):
    from etl_spark_gradle_spark.sinks.loaders import load_file
    from etl_spark_gradle_spark.sources.extractors import extract_file

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "nation_avro")
    load_file(df, {"path": path, "format": "avro"}, write_mode="overwrite")
    back = extract_file(spark, {"path": path, "format": "avro"})
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_avro_missing_package_error(spark, tmp_path):
    """Without the connector, the avro branch must fail with the
    actionable ConfigError, not a raw ClassNotFoundException."""
    if _spark_avro_available():
        pytest.skip("spark-avro present; the gap error path is unreachable")
    from etl_spark_gradle_spark.plans.config import ConfigError
    from etl_spark_gradle_spark.sources.extractors import extract_file

    with pytest.raises(ConfigError, match="spark-avro"):
        extract_file(spark, {"path": str(tmp_path), "format": "avro"})
