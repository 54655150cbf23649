"""Data-quality engine: null-check split, null/duplicate metrics,
schema validation, quarantine (SURVEY.md §2.4).

Parity anchors:
- null split:     quality/DataQualityChecker.scala:139-153
- null metrics:   quality/DataQualityChecker.scala:61-114
- dup detection:  quality/DataQualityChecker.scala:87-96
- schema check:   quality/SchemaValidator.scala:34-97
- quarantine:     quality/QuarantineWriter.scala:26-96

Scale notes vs the reference: null metrics there run one
``filter(isNull).count()`` job per column; here it is a single-pass
aggregate (one job regardless of column count). Duplicate detection via
``distinct().count()`` is a full shuffle of every column — kept for
parity in ``duplicate_metrics`` but the dedup operators in
``operators/dedup.py`` are the scalable alternatives.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from etl_spark_gradle_spark.plans.config import ValidationResult


def null_check_condition(columns: list[str]):
    """Conjunction of ``col IS NOT NULL`` (parity:
    ``quality/DataQualityChecker.scala:139-146``)."""
    cond = F.lit(True)
    for c in columns:
        cond = cond & F.col(c).isNotNull()
    return cond


def split_valid_invalid(
    df: DataFrame,
    null_checks: list[str],
    custom_rules: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (valid, invalid) by the conjunction of null checks AND
    custom SQL boolean rules (parity:
    ``quality/DataQualityChecker.scala:139-153``; custom rules are this
    engine's working version of the reference's dead ``customRules``
    knob). Both frames are lazy filters over the same plan — one
    combined predicate, one scan per action, rules pushed down with the
    rest of the plan. A rule evaluating to NULL (e.g. over a NULL
    column) counts as a violation, like SQL WHERE."""
    rules = list(custom_rules or [])
    if not null_checks and not rules:
        return df, df.limit(0)
    cond = null_check_condition(null_checks)
    for rule in rules:
        cond = cond & F.coalesce(F.expr(rule), F.lit(False))
    return df.filter(cond), df.filter(~cond)


def null_metrics(df: DataFrame, columns: list[str]) -> dict[str, int]:
    """Per-column null counts in ONE aggregate job (the reference runs a
    job per column, ``quality/DataQualityChecker.scala:61-82``)."""
    if not columns:
        return {}
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in columns
    ] + [F.count(F.lit(1)).alias("__total")]
    row = df.agg(*aggs).collect()[0]
    out = {c: int(row[c] or 0) for c in columns}
    out["__total"] = int(row["__total"])
    return out


def null_metrics_df(df: DataFrame, columns: list[str]) -> DataFrame:
    """Single-row DataFrame with per-column null counts + total, same
    one-job single-pass aggregate as :func:`null_metrics` but lazy (for
    oracle-checked pipelines and composition into larger plans)."""
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"nulls_{c}")
        for c in columns
    ] + [F.count(F.lit(1)).cast("long").alias("total_rows")]
    return df.agg(*aggs)


def duplicate_metrics(df: DataFrame) -> dict[str, int]:
    """Full-row duplicate count (parity:
    ``quality/DataQualityChecker.scala:87-96``)."""
    total = df.count()
    distinct = df.distinct().count()
    return {"total": total, "distinct": distinct, "duplicates": total - distinct}


def _types_compatible(actual: DataType, expected: DataType) -> bool:
    """Recursive type match for struct/array/map (parity:
    ``quality/SchemaValidator.scala:78-97``)."""
    if isinstance(expected, StructType) and isinstance(actual, StructType):
        expected_fields = {f.name: f for f in expected.fields}
        for f in actual.fields:
            if f.name not in expected_fields:
                return False
            if not _types_compatible(f.dataType, expected_fields[f.name].dataType):
                return False
        return len(actual.fields) == len(expected.fields)
    if isinstance(expected, ArrayType) and isinstance(actual, ArrayType):
        return _types_compatible(actual.elementType, expected.elementType)
    if isinstance(expected, MapType) and isinstance(actual, MapType):
        return _types_compatible(actual.keyType, expected.keyType) and _types_compatible(
            actual.valueType, expected.valueType
        )
    return actual.simpleString() == expected.simpleString()


def validate_schema(actual: StructType, expected: StructType) -> ValidationResult:
    """Compare actual vs expected StructType: missing columns, extra
    columns, type mismatches, nullability violations (parity:
    ``quality/SchemaValidator.scala:34-71``). Pure metadata — no job."""
    errors = []
    actual_by_name = {f.name: f for f in actual.fields}
    expected_by_name = {f.name: f for f in expected.fields}
    for name in expected_by_name:
        if name not in actual_by_name:
            errors.append(f"missing column: {name}")
    for name in actual_by_name:
        if name not in expected_by_name:
            errors.append(f"unexpected column: {name}")
    for name, exp in expected_by_name.items():
        act = actual_by_name.get(name)
        if act is None:
            continue
        if not _types_compatible(act.dataType, exp.dataType):
            errors.append(
                f"type mismatch for {name}: expected {exp.dataType.simpleString()}, "
                f"got {act.dataType.simpleString()}"
            )
        if act.nullable and not exp.nullable:
            errors.append(f"nullability violation for {name}: expected non-nullable")
    return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)


def schema_align(
    df: DataFrame,
    target: StructType,
    mode: str = "safe",
) -> DataFrame:
    """Conform a batch to a target schema before appending into an
    existing dataset — the schema-drift gate every long-lived table
    needs (a drifted append silently poisons the table for every later
    reader; parquet won't even merge incompatible types).

    Output has EXACTLY the target's columns, in target order:
    - missing nullable columns are added as typed NULLs,
    - matching columns are cast to the target type,
    - extra columns are dropped (``mode="safe"``) or rejected
      (``mode="strict"``, which also rejects missing columns and any
      cast between incompatible families per ``validate_schema``'s
      compatibility rules).

    Pure projection — zero shuffle, prunes like any select. Casts are
    Spark semantics (out-of-range/unparseable → NULL under the engine's
    non-ANSI default): align BEFORE quality gates so those NULLs hit
    the null checks.
    """
    if mode not in ("safe", "strict"):
        raise ValueError("schema_align mode must be 'safe' or 'strict'")
    actual = {f.name: f for f in df.schema.fields}
    if mode == "strict":
        result = validate_schema(df.schema, target)
        if not result.is_valid:
            raise ValueError(
                "schema_align strict: batch does not conform: "
                + "; ".join(result.errors)
            )
    cols = []
    for f in target.fields:
        if f.name in actual:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif f.nullable:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"schema_align: target column '{f.name}' is non-nullable and "
                "absent from the batch — cannot fill with NULL"
            )
    return df.select(*cols)


def quarantine(
    df: DataFrame, path: str, pipeline_id: str, run_id: str
) -> int:
    """Stamp quarantine metadata and append as Parquet (parity:
    ``quality/QuarantineWriter.scala:26-43``). Returns rows quarantined
    (observed on the write action — no second job)."""
    from pyspark.sql import Observation

    obs = Observation()
    stamped = (
        df.withColumn("quarantine_timestamp", F.current_timestamp())
        .withColumn("pipeline_id", F.lit(pipeline_id))
        .withColumn("run_id", F.lit(run_id))
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    stamped.write.mode("append").parquet(path)
    return int(obs.get["n"])


def read_quarantine(
    spark, path: str, pipeline_id: str | None = None, run_id: str | None = None
) -> DataFrame:
    """Read back quarantined rows with optional filters (parity:
    ``quality/QuarantineWriter.scala:79-96``)."""
    df = spark.read.parquet(path)
    if pipeline_id:
        df = df.filter(F.col("pipeline_id") == pipeline_id)
    if run_id:
        df = df.filter(F.col("run_id") == run_id)
    return df


@dataclass
class QualityReport:
    """Aggregated quality outcome for one run."""

    null_violations: int = 0
    duplicates: int = 0
    schema_errors: tuple[str, ...] = field(default_factory=tuple)
    quarantined: int = 0
    # per-check violation counts keyed "null:<col>" / "rule:<expr>" —
    # observed on the same action as the quarantine write, zero extra jobs
    violations_by_check: dict[str, int] = field(default_factory=dict)


class SchemaAlignTransformer:
    """Registry adapter (``type: schema_align``). Options:
    ``targetSchema`` (DDL string, e.g. ``"id long, name string"``),
    ``mode`` safe|strict."""

    def validate(self, df: DataFrame, config) -> ValidationResult:
        errors = []
        ddl = (config.options.get("targetSchema") or "").strip()
        if not ddl:
            errors.append("schema_align requires 'targetSchema' (DDL string)")
        else:
            try:
                self._parse(ddl)
            except Exception as e:  # noqa: BLE001 — surfaced as config error
                errors.append(f"cannot parse targetSchema: {e}")
        if config.options.get("mode", "safe") not in ("safe", "strict"):
            errors.append("mode must be safe|strict")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    @staticmethod
    def _parse(ddl: str) -> StructType:
        from pyspark.sql.types import _parse_datatype_string

        parsed = _parse_datatype_string(ddl)
        if not isinstance(parsed, StructType):
            raise ValueError(f"targetSchema must describe columns, got {parsed}")
        return parsed

    def transform(self, df: DataFrame, config, ctx) -> DataFrame:
        result = self.validate(df, config)
        if not result.is_valid:
            from etl_spark_gradle_spark.operators.relational import TransformationError

            raise TransformationError(
                "SchemaAlignTransformer config invalid: " + "; ".join(result.errors)
            )
        return schema_align(
            df,
            self._parse(config.options["targetSchema"]),
            mode=config.options.get("mode", "safe"),
        )

    def lineage_step(self, config) -> str:
        opts = ",".join(f"{k}={v}" for k, v in sorted(config.options.items()))
        return f"schema_align({opts})"
