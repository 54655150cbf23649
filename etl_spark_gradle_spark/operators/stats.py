"""Exact-moment statistics: correlation matrices, OLS fits, z-score
anomaly flags.

Beyond-reference analytics (the reference's aggregation surface stops
at avg/stddev): the descriptive-stats workloads a warehouse runs over
fact tables, built on ONE principle — every statistic derives from
exact DECIMAL power sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulated in a
single hash aggregation, with the float math applied AFTER aggregation
in a fixed operand order. Consequences at 100 TB:

- One scan + one (tiny) shuffle per statistic family, regardless of
  how many column pairs are requested — pairs add expressions, not
  passes (contrast ``df.stat.corr``, one job per pair).
- The moment table is exactly MERGEABLE (decimal sums add), so
  per-partition moments persisted once can answer later rollups the
  same way the HLL/histogram/CMS sketches do.
- Bit-identical cross-engine results: the sums are exact rationals,
  and the closing float ops (divide, sqrt — both correctly rounded
  under IEEE-754) are applied in the same order on Spark and the
  DuckDB oracle.

Columns are assumed to carry ≤ 2 decimal digits (prices/quantities —
the testdata contract); the DECIMAL(18,2) cast is then exact and
products fit DECIMAL(38,4) without rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.relational import TransformationError

__all__ = [
    "moment_sums",
    "correlation_matrix",
    "linear_fit",
    "zscore_flags",
    "category_drift",
]


def _d(col: Column) -> Column:
    """Decimal → double via a string round-trip: decimal→string is
    exact and string→double is correctly rounded on EVERY engine,
    whereas DuckDB's direct decimal(38,_)→double cast was measured one
    ulp off Java's correctly-rounded conversion on 17-digit values.
    Runs on |groups| rows only — cost irrelevant."""
    return col.cast("string").cast("double")


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,2)")


def _prod(a: str, b: str) -> Column:
    return (_dec(a) * _dec(b)).cast("decimal(38,4)")


def moment_sums(
    df: DataFrame,
    cols: list[str],
    group_by: list[str] | None = None,
) -> DataFrame:
    """The mergeable moment table: per group, ``n`` plus exact
    ``sum_<c>``, ``sumsq_<c>`` for every column and ``sumxy_<a>_<b>``
    for every pair — one hash aggregation, shuffle carries one short
    row per group."""
    if len(cols) < 1:
        raise TransformationError("moment_sums requires at least one column")
    for c in cols:
        if c not in df.columns:
            raise TransformationError(f"moment column not in input schema: {c}")
    group_by = group_by or []
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(_dec(c)).alias(f"sum_{c}"))
        aggs.append(F.sum(_prod(c, c)).alias(f"sumsq_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(_prod(a, b)).alias(f"sumxy_{a}_{b}"))
    grouped = df.groupBy(*group_by) if group_by else df.groupBy()
    return grouped.agg(*aggs)


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    group_by: list[str] | None = None,
) -> DataFrame:
    """Pearson correlation for every column pair, long form
    (group..., col_a, col_b, corr): ``(n·Σxy − Σx·Σy) /
    (sqrt(n·Σx²−(Σx)²) · sqrt(n·Σy²−(Σy)²))``. All pairs from the ONE
    moment aggregation; degenerate (zero-variance) pairs yield NULL."""
    if len(cols) < 2:
        raise TransformationError("correlation_matrix requires >= 2 columns")
    m = moment_sums(df, cols, group_by)
    group_by = group_by or []
    pair_structs = []
    n = F.col("n").cast("double")
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            sx = _d(F.col(f"sum_{a}"))
            sy = _d(F.col(f"sum_{b}"))
            sxx = _d(F.col(f"sumsq_{a}"))
            syy = _d(F.col(f"sumsq_{b}"))
            sxy = _d(F.col(f"sumxy_{a}_{b}"))
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            corr = F.when(
                (vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy))
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    corr.alias("corr"),
                )
            )
    return m.select(
        *group_by, F.explode(F.array(*pair_structs)).alias("_p")
    ).select(*group_by, "_p.col_a", "_p.col_b", "_p.corr")


def linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Per-group simple OLS ``y = slope·x + intercept`` with r²:
    closed-form from the same exact moments. Groups with zero x
    variance yield NULL fit columns."""
    m = moment_sums(df, [x_col, y_col], group_by)
    group_by = group_by or []
    n = F.col("n").cast("double")
    sx = _d(F.col(f"sum_{x_col}"))
    sy = _d(F.col(f"sum_{y_col}"))
    sxx = _d(F.col(f"sumsq_{x_col}"))
    syy = _d(F.col(f"sumsq_{y_col}"))
    sxy = _d(F.col(f"sumxy_{x_col}_{y_col}"))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when(vx > 0, cov / vx)
    intercept = F.when(vx > 0, (sy - (cov / vx) * sx) / n)
    # sqrt-free form: (cov·cov)/(vx·vy) — three exactly-rounded ops in a
    # fixed order; the sqrt-then-square form accumulated a last-ulp
    # difference across engines in practice
    r2 = F.when((vx > 0) & (vy > 0), (cov * cov) / (vx * vy))
    return m.select(
        *group_by,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def zscore_flags(
    df: DataFrame,
    value_col: str,
    group_by: list[str] | None = None,
    threshold: float = 3.0,
    z_col: str = "zscore",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Per-row z-score against the row's group (population σ from the
    exact moments) plus an outlier flag at ``|z| >= threshold``. Two
    passes over the input by necessity (the mean must exist before any
    row can be scored): one moment aggregation, then a broadcast-sized
    join of |groups| moment rows back onto the scan — the input itself
    is never shuffled. Zero-variance groups score NULL/unflagged."""
    if threshold <= 0:
        raise TransformationError("zscore threshold must be > 0")
    group_by = group_by or []
    m = moment_sums(df, [value_col], group_by)
    n = F.col("n").cast("double")
    sx = _d(F.col(f"sum_{value_col}"))
    sxx = _d(F.col(f"sumsq_{value_col}"))
    mean = sx / n
    var = (n * sxx - sx * sx) / (n * n)
    stats = m.select(
        *group_by,
        mean.alias("_mean"),
        F.when(var > 0, F.sqrt(var)).alias("_std"),
    )
    joined = (
        df.join(F.broadcast(stats), on=group_by)
        if group_by
        else df.crossJoin(F.broadcast(stats))
    )
    z = F.when(
        F.col("_std").isNotNull(),
        (F.col(value_col).cast("double") - F.col("_mean")) / F.col("_std"),
    )
    return (
        joined.withColumn(z_col, z)
        .withColumn(
            flag_col,
            F.when(z.isNotNull(), F.abs(z) >= threshold).otherwise(F.lit(False)),
        )
        .drop("_mean", "_std")
    )


def category_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    category_col: str,
) -> DataFrame:
    """Two-sample categorical drift table: per category, counts and
    rates on each side plus the category's χ² contribution under the
    pooled-expectation two-sample test — the feed-monitoring question
    "did this week's source/language/label mix move?" answered from
    two count aggregations (map-side partials; shuffles carry
    |categories| rows) and one |categories|-sized outer join. Neither
    input is scanned twice or shuffled raw.

    All counts are exact integers; rates and χ² close as doubles in a
    fixed operand order (engine-portable). A category absent from one
    side appears with count 0 (its χ² contribution is well-defined via
    the pooled expectation). The TOTAL χ² statistic is the sum of the
    contribution column — summed by the CALLER over the small result
    (float summation order over the full table is engine-dependent;
    per-category rows are not).
    """
    for df, side in ((df_a, "left"), (df_b, "right")):
        if category_col not in df.columns:
            raise TransformationError(
                f"category column not in {side} input schema: {category_col}"
            )
    ca = df_a.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    cb = df_b.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    joined = (
        ca.join(cb, on="category", how="full")
        .select(
            "category",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        )
    )
    totals = joined.agg(
        F.sum("n_a").cast("long").alias("_ta"),
        F.sum("n_b").cast("long").alias("_tb"),
    )
    j = joined.crossJoin(F.broadcast(totals))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ta, tb = F.col("_ta").cast("double"), F.col("_tb").cast("double")
    tot_c = na + nb
    n_all = ta + tb
    e_a = (ta * tot_c) / n_all
    e_b = (tb * tot_c) / n_all
    chi2 = ((na - e_a) * (na - e_a)) / e_a + ((nb - e_b) * (nb - e_b)) / e_b
    return j.select(
        "category",
        "n_a",
        "n_b",
        (na / ta).alias("rate_a"),
        (nb / tb).alias("rate_b"),
        (na / ta - nb / tb).alias("rate_diff"),
        chi2.alias("chi2_contrib"),
    )


class DriftTransformer:
    """Registry adapter (``type: drift``): compares the pipeline frame
    against a registered view. Options: ``categoryColumn`` (required),
    ``otherView`` (required — name registered under ``views:``)."""

    def validate(self, df, config):
        from etl_spark_gradle_spark.plans.config import ValidationResult

        errors = []
        opts = config.options
        if not opts.get("categoryColumn"):
            errors.append("drift requires 'categoryColumn'")
        elif opts["categoryColumn"] not in df.columns:
            errors.append(
                f"category column not in input schema: {opts['categoryColumn']}"
            )
        if not opts.get("otherView"):
            errors.append("drift requires 'otherView'")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def transform(self, df, config, ctx):
        result = self.validate(df, config)
        if not result.is_valid:
            raise TransformationError(
                "drift config invalid: " + "; ".join(result.errors)
            )
        opts = config.options
        try:
            other = ctx.spark.table(opts["otherView"])
        except Exception as exc:
            raise TransformationError(
                f"drift: otherView not found: {opts['otherView']}: {exc}"
            ) from exc
        return category_drift(df, other, opts["categoryColumn"])

    def lineage_step(self, config) -> str:
        opts = ",".join(f"{k}={v}" for k, v in sorted(config.options.items()))
        return f"drift({opts})"


class StatsTransformer:
    """Registry adapter (``type: stats``). Options: ``operation``
    correlation|linear_fit|zscore, ``columns`` (csv — correlation),
    ``xColumn``/``yColumn`` (linear_fit), ``valueColumn``/``threshold``
    (zscore), ``groupBy`` (csv, optional for all)."""

    def validate(self, df, config):
        from etl_spark_gradle_spark.operators.relational import _split_csv
        from etl_spark_gradle_spark.plans.config import ValidationResult

        errors = []
        opts = config.options
        op = opts.get("operation", "correlation")
        cols_needed: list[str] = list(_split_csv(opts.get("groupBy")))
        if op == "correlation":
            cols = _split_csv(opts.get("columns"))
            if len(cols) < 2:
                errors.append("stats correlation requires 'columns' (>= 2)")
            cols_needed += cols
        elif op == "linear_fit":
            for key in ("xColumn", "yColumn"):
                if not opts.get(key):
                    errors.append(f"stats linear_fit requires '{key}'")
                else:
                    cols_needed.append(opts[key])
        elif op == "zscore":
            if not opts.get("valueColumn"):
                errors.append("stats zscore requires 'valueColumn'")
            else:
                cols_needed.append(opts["valueColumn"])
        else:
            errors.append(
                f"stats operation must be correlation|linear_fit|zscore, got '{op}'"
            )
        for c in cols_needed:
            if c not in df.columns:
                errors.append(f"column not in input schema: {c}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def transform(self, df, config, ctx):
        result = self.validate(df, config)
        if not result.is_valid:
            raise TransformationError(
                "stats config invalid: " + "; ".join(result.errors)
            )
        from etl_spark_gradle_spark.operators.relational import _split_csv

        opts = config.options
        op = opts.get("operation", "correlation")
        gb = _split_csv(opts.get("groupBy")) or None
        if op == "correlation":
            return correlation_matrix(df, _split_csv(opts["columns"]), group_by=gb)
        if op == "linear_fit":
            return linear_fit(df, opts["xColumn"], opts["yColumn"], group_by=gb)
        return zscore_flags(
            df,
            opts["valueColumn"],
            group_by=gb,
            threshold=float(opts.get("threshold", 3.0)),
        )

    def lineage_step(self, config) -> str:
        opts = ",".join(f"{k}={v}" for k, v in sorted(config.options.items()))
        return f"stats({opts})"
