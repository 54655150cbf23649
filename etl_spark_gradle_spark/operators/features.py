"""ML feature-engineering transforms: target encoding and one-hot.

Beyond-reference operators (the reference has no feature surface at
all — its transformers stop at relational shapes, SURVEY.md §2.3):
these are the last-mile transforms between a curated table and a
training job, and they are exactly the ops that go subtly wrong at
scale — target leakage, high-cardinality blowups, irreproducible
float means.

Design notes (100 TB):

- ``target_encode`` is ONE map-side-combined aggregation over
  (category → exact decimal Σy, n) plus a null-safe broadcast join
  back; the frame itself never shuffles. The encoded value is the
  smoothed posterior mean ``(Σy + m·prior) / (n + m)`` (the classic
  empirical-Bayes shrinkage: rare categories pull toward the global
  prior instead of memorizing noise).
- ``method="loo"`` (leave-one-out) excludes the ROW'S OWN target from
  its encoding — ``(Σy − y_i + m·prior) / (n − 1 + m)`` — the exact
  algebraic fix for target leakage, at zero extra passes: the same
  aggregate state serves every row because the correction is row-local
  arithmetic. A category with a single row falls back to the prior
  (its LOO sample is empty).
- All means close from EXACT decimal sums via the string round-trip
  (the `sum_exact` posture): a float Σy is partition-order dependent,
  which would make the same feature table encode differently across
  runs — poison for training reproducibility.
- Unseen-at-encode-time categories (NULL category keys included —
  they ride the null-safe join as their own legitimate group) and the
  cold-start path are governed by the same smoothing formula, so
  serving-time behavior is a continuous function of the statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark_gradle_spark.options import parse_bool
from etl_spark_gradle_spark.operators.relational import (
    TransformationError,
    _BaseTransformer,
    _split_csv,
    broadcast_group_join,
)
from etl_spark_gradle_spark.plans.config import (
    TransformationConfig,
    ValidationResult,
)

__all__ = [
    "target_encode",
    "one_hot",
    "robust_scale",
    "feature_hash",
    "TargetEncodeTransformer",
    "OneHotTransformer",
    "RobustScaleTransformer",
    "FeatureHashTransformer",
]


def _exact_mean(sum_col, n_col):
    """decimal Σ → double via string round-trip, / n in fixed order."""
    return sum_col.cast("string").cast("double") / n_col.cast("double")


def _target_encode_stats(
    df: DataFrame, category_cols: list[str], target_col: str
) -> tuple[DataFrame, DataFrame]:
    """The two pin-time relations of :func:`target_encode` BEFORE the
    checkpoint: (category stats, 1-row prior). Exposed so
    tools/plan_audit.py can assert the aggregation plan that runs at
    pin time (ADVICE r12: the final encode plan only shows checkpoint
    scans, so auditing it alone can no longer catch a regression in
    how the stats/prior are computed)."""
    y = F.col(target_col).cast("double")
    ydec = F.col(target_col).cast("decimal(27,6)")
    stats = df.groupBy(*[F.col(c) for c in category_cols]).agg(
        F.sum(ydec).alias("_te_sum"),
        F.count(y).alias("_te_n"),
    )
    prior = df.agg(
        _exact_mean(F.sum(ydec), F.count(y)).alias("_te_prior")
    )
    return stats, prior


def target_encode(
    df: DataFrame,
    category_cols: list[str],
    target_col: str,
    smoothing: float = 20.0,
    method: str = "mean",
    output_col: str | None = None,
) -> DataFrame:
    """Encode a categorical key as the smoothed mean of a numeric
    target: ``(Σy + m·prior) / (n + m)`` with ``prior`` the exact
    global target mean. ``method="loo"`` additionally removes each
    row's own target from its statistic (leave-one-out — the standard
    anti-leakage encoding for training folds); rows whose target is
    NULL receive the plain (non-LOO) encoding, since they contributed
    nothing to the sums.

    One aggregation + one broadcast-sized join; NULL category keys are
    encoded as their own group (null-safe join), not dropped.
    """
    if not category_cols:
        raise TransformationError("target_encode requires category columns")
    for c in [*category_cols, target_col]:
        if c not in df.columns:
            raise TransformationError(f"target_encode column not in schema: {c}")
    if method not in ("mean", "loo"):
        raise TransformationError(
            f"target_encode method must be mean or loo, got '{method}'"
        )
    if float(smoothing) < 0:
        raise TransformationError("target_encode smoothing must be >= 0")
    reserved = {"_te_sum", "_te_n", "_te_prior"}
    clash = reserved & set(df.columns)
    if clash:
        raise TransformationError(
            f"column names reserved by target_encode: {sorted(clash)}"
        )
    out = output_col or f"{'_'.join(category_cols)}_te"
    m = float(smoothing)
    y = F.col(target_col).cast("double")
    # accumulate from the ORIGINAL column: decimal→decimal(27,6) is
    # exact for ≤6-dp inputs, while double→decimal rounding differs
    # between engines in the last digit (targets are quantized to 6 dp
    # — the cusum resolution posture)
    ydec = F.col(target_col).cast("decimal(27,6)")

    # stats (category-cardinality rows) and the 1-row prior are both
    # REUSED bounded relations whose broadcast subtrees would otherwise
    # re-plan the whole input each (3 upstream evaluations per encode,
    # compounding in feature chains — r12 plan audit); pin them once,
    # values unchanged. eager=False (ADVICE r12): same lineage
    # truncation and single materialization, but the pin job fires at
    # the caller's first action instead of at construction, keeping
    # the plan-composition contract action-free.
    stats_raw, prior_raw = _target_encode_stats(df, category_cols, target_col)
    stats = stats_raw.localCheckpoint(eager=False)
    prior_df = F.broadcast(prior_raw.localCheckpoint(eager=False))
    joined = broadcast_group_join(df, stats, category_cols).crossJoin(prior_df)

    s = F.col("_te_sum").cast("string").cast("double")
    n = F.col("_te_n").cast("double")
    prior = F.col("_te_prior")
    plain = (s + F.lit(m) * prior) / (n + F.lit(m))
    if method == "loo":
        # exclude the row's own target; single-row categories (and
        # rows with a NULL target) degrade gracefully
        loo = (s - y + F.lit(m) * prior) / (n - F.lit(1.0) + F.lit(m))
        enc = F.when(y.isNull() | F.isnan(y), plain).otherwise(
            F.when(n + F.lit(m) > 1.0, loo).otherwise(prior)
        )
    else:
        enc = plain
    # a category whose every target is NULL has n=0: pure prior (when
    # m > 0) or NULL (m == 0, nothing to encode from)
    enc = F.when(F.col("_te_n").isNull(), prior).otherwise(enc)
    return joined.withColumn(out, enc).drop("_te_sum", "_te_n", "_te_prior")


def one_hot(
    df: DataFrame,
    column: str,
    values: list[str],
    prefix: str | None = None,
    other_col: str | None = None,
) -> DataFrame:
    """Explicit-vocabulary one-hot: one 0/1 int column per listed
    value (static schema — the vocabulary is part of the pipeline
    config, never inferred from data, so the output schema cannot
    drift between runs; same stance as the pivot operator). Values
    outside the vocabulary (and NULLs) get all-zero flags and set
    ``other_col`` when given — flags are null-safe 0/1, never NULL
    (a NULL feature cell poisons most trainers). Pure narrow
    expressions — zero shuffles."""
    if not values:
        raise TransformationError("one_hot requires an explicit value list")
    if column not in df.columns:
        raise TransformationError(f"one_hot column not in schema: {column}")
    if len(set(values)) != len(values):
        raise TransformationError("one_hot values must be unique")
    pre = prefix if prefix is not None else column
    col = F.col(column).cast("string")
    # column names sanitize non-alnum to "_": distinct vocabulary
    # values like "a.b" and "a_b" would collide and the later flag
    # would silently overwrite the earlier — disambiguate with a
    # stable ordinal suffix on every post-sanitization duplicate
    names: list[str] = []
    used: set[str] = set()
    for v in values:
        safe = "".join(ch if ch.isalnum() else "_" for ch in str(v))
        name, i = f"{pre}_{safe}", 1
        while name in used:
            name = f"{pre}_{safe}__{i}"
            i += 1
        used.add(name)
        names.append(name)
    clash = [n for n in names if n in df.columns]
    if other_col and other_col in df.columns:
        clash.append(other_col)
    if clash:
        raise TransformationError(
            f"one_hot output column(s) already in schema: {clash}"
        )
    out = df
    for v, name in zip(values, names):
        out = out.withColumn(
            name, col.eqNullSafe(F.lit(str(v))).cast("int")
        )
    if other_col:
        out = out.withColumn(
            other_col,
            (col.isNull() | ~col.isin([str(v) for v in values])).cast("int"),
        )
    return out


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_by: list[str] | None = None,
    method: str = "mad",
    scale: float = 1.4826,
    output_col: str | None = None,
) -> DataFrame:
    """Outlier-resistant standardization — the robust counterpart of
    z-scoring (``stats.zscore_flags`` uses mean/σ, which one extreme
    value drags; median and MAD/IQR have a 50%/25% breakdown point).
    Adds ``output_col`` (default ``<value_col>_scaled``) to the frame:

    - ``method='mad'``: ``(x − median) / (scale·MAD)`` with
      ``scale=1.4826`` making MAD a consistent σ estimator under
      normality (sklearn's RobustScaler analog in robust sigmas),
    - ``method='iqr'``: ``(x − median) / (Q3 − Q1)`` (sklearn
      RobustScaler's default quantile_range).

    A zero denominator (constant-majority group) yields NULL — a
    documented "cannot scale" sentinel, never ±Inf. NULL inputs stay
    NULL; rows are never dropped or reordered.

    Every statistic is an EXACT type-1 quantile through the
    ``exact_quantiles`` histogram+CDF path (no executor value
    buffering, no engine sketch — the 100 TB route, same machinery as
    ``mad_outliers``), and the closing arithmetic is fixed-order IEEE
    on table values, so the scaled column reproduces bit-for-bit
    cross-engine. Plan: one or two histogram shuffles for the
    statistics + #groups-row broadcast joins back; the frame itself is
    NEVER re-shuffled (group cardinality assumed dimension-like).
    """
    from etl_spark_gradle_spark.operators.stats import exact_quantiles

    if method not in ("mad", "iqr"):
        raise TransformationError(
            f"robust_scale method must be mad|iqr, got '{method}'"
        )
    if scale <= 0:
        raise TransformationError("robust_scale requires scale > 0")
    if value_col not in df.columns:
        raise TransformationError(
            f"robust_scale: value column not in schema: {value_col}"
        )
    group_by = group_by or []
    for c in group_by:
        if c not in df.columns:
            raise TransformationError(f"group column not in input schema: {c}")
    out_col = output_col or f"{value_col}_scaled"
    if out_col in df.columns:
        raise TransformationError(
            f"robust_scale output column already in schema: {out_col}"
        )

    vals = df.select(
        *group_by, F.col(value_col).cast("double").alias("_x")
    ).where(F.col("_x").isNotNull())
    med = exact_quantiles(vals, "_x", [0.5], group_by=group_by).select(
        *group_by, F.col("value").alias("_med")
    )
    if method == "mad":
        dev = broadcast_group_join(vals, med, group_by).select(
            *group_by, F.abs(F.col("_x") - F.col("_med")).alias("_adev")
        )
        mad = exact_quantiles(dev, "_adev", [0.5], group_by=group_by).select(
            *group_by, F.col("value").alias("_mad")
        )
        stats = broadcast_group_join(med, mad, group_by, how="inner")
        denom = F.lit(float(scale)) * F.col("_mad")
    else:
        qs = exact_quantiles(vals, "_x", [0.25, 0.75], group_by=group_by)
        spread = qs.groupBy(*[F.col(c) for c in group_by]).agg(
            F.min(F.when(F.col("prob") == 0.25, F.col("value"))).alias("_q1"),
            F.min(F.when(F.col("prob") == 0.75, F.col("value"))).alias("_q3"),
        )
        stats = broadcast_group_join(med, spread, group_by, how="inner")
        denom = F.col("_q3") - F.col("_q1")

    if group_by:
        enriched = broadcast_group_join(df, stats, group_by)
    else:
        # global path via a literal-true LEFT join, NOT a crossJoin:
        # with an all-NULL value column exact_quantiles returns an
        # EMPTY stats frame and df.crossJoin(empty) would erase every
        # input row — the left join keeps them with NULL statistics,
        # honoring the rows-are-never-dropped contract, and the
        # literal condition needs no reserved dummy column (review
        # findings x2)
        enriched = df.join(F.broadcast(stats), F.lit(True), "left")
    scaled = F.when(
        denom > 0,
        (F.col(value_col).cast("double") - F.col("_med")) / denom,
    )
    drop = ["_med", "_mad"] if method == "mad" else ["_med", "_q1", "_q3"]
    return enriched.withColumn(out_col, scaled).drop(*drop)


class RobustScaleTransformer(_BaseTransformer):
    """YAML type ``robust_scale``: ``column`` (required), ``groupBy``
    csv, ``method`` mad|iqr, ``scale``, ``outputColumn``."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        col = opts.get("column")
        if not col:
            errors.append("robust_scale requires 'column'")
        elif col not in df.columns:
            errors.append(f"column not in input schema: {col}")
        if opts.get("method", "mad") not in ("mad", "iqr"):
            errors.append(f"method must be mad|iqr, got '{opts['method']}'")
        try:
            if float(opts.get("scale", 1.4826)) <= 0:
                errors.append("scale must be > 0")
        except ValueError:
            errors.append(f"scale is not a number: {opts['scale']}")
        for c in _split_csv(opts.get("groupBy")):
            if c not in df.columns:
                errors.append(f"group column not in input schema: {c}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        return robust_scale(
            df,
            value_col=opts["column"],
            group_by=_split_csv(opts.get("groupBy")) or None,
            method=opts.get("method", "mad"),
            scale=float(opts.get("scale", 1.4826)),
            output_col=opts.get("outputColumn"),
        )


class TargetEncodeTransformer(_BaseTransformer):
    """Registry adapter (``type: target_encode``). Options:
    ``categoryColumns`` csv (required), ``targetColumn`` (required),
    ``smoothing`` (default 20), ``method`` mean|loo, ``outputColumn``."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        cats = _split_csv(opts.get("categoryColumns"))
        if not cats:
            errors.append("target_encode requires 'categoryColumns'")
        tgt = opts.get("targetColumn")
        if not tgt:
            errors.append("target_encode requires 'targetColumn'")
        for c in [*cats, *( [tgt] if tgt else [] )]:
            if c not in df.columns:
                errors.append(f"column not in input schema: {c}")
        if opts.get("method", "mean") not in ("mean", "loo"):
            errors.append("target_encode method must be mean or loo")
        if opts.get("smoothing") is not None:
            try:
                if float(opts["smoothing"]) < 0:
                    errors.append("target_encode smoothing must be >= 0")
            except (TypeError, ValueError):
                errors.append("target_encode smoothing must be numeric")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        return target_encode(
            df,
            _split_csv(opts["categoryColumns"]),
            opts["targetColumn"],
            smoothing=float(opts.get("smoothing", 20.0)),
            method=opts.get("method", "mean"),
            output_col=opts.get("outputColumn"),
        )


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = 256,
    lowercase: bool = True,
    alternate_sign: bool = False,
    salt: str = "fh:",
) -> DataFrame:
    """Hashing-trick term-frequency vectorizer (sklearn
    ``HashingVectorizer`` / Spark MLlib ``HashingTF`` semantics,
    re-expressed as pure Catalyst expressions): map each token to a
    bucket in ``[0, n_features)`` via an ENGINE-PORTABLE hash
    (``md5`` prefix → integer, the same portable-hash posture as
    ``hash_sample``/``weighted_reservoir`` — Spark's ``hash()`` is
    Murmur3-with-Spark-seeding, unreplicable in other engines) and
    emit the sparse long form ``(id, feature, tf)``.

    ``text_col`` may be a raw string column (whitespace-tokenized via
    :func:`~etl_spark_gradle_spark.operators.text.tokens`) or an
    already-tokenized ``array<string>`` column — pre-tokenized input
    skips the split. ``alternate_sign=True`` applies sklearn's
    hash-sign trick (±1 from an independent hash bit, making bucket
    collisions cancel in expectation rather than accumulate); signed
    sums that cancel to 0 are kept as explicit 0 rows (dropping them
    would make "collided to zero" indistinguishable from "absent").
    NULL ids are kept (a legitimate group); NULL/empty texts emit no
    rows (an empty document has an empty sparse vector).

    Plan at 100 TB: tokenize+hash are scan-riding expressions, the
    explode is narrow, and the single shuffle is the map-side-combined
    groupBy on (id, feature) — output bounded by
    ``docs × min(doc_vocab, n_features)``. No UDFs, no vocabulary
    state, no driver collects: the defining property of the hashing
    trick is that (unlike one_hot/BPE) it needs NO fitted dictionary,
    so it composes with streaming and incremental ingestion unchanged.
    """
    if n_features <= 0:
        raise TransformationError("feature_hash requires n_features > 0")
    for c in (id_col, text_col):
        if c not in df.columns:
            raise TransformationError(f"column not in input schema: {c}")
    from pyspark.sql.types import ArrayType

    from etl_spark_gradle_spark.operators.text import tokens as _tokens

    if isinstance(df.schema[text_col].dataType, ArrayType):
        toks = F.col(text_col)
    else:
        toks = _tokens(text_col)
    if lowercase:
        toks = F.transform(toks, F.lower)
    exploded = df.select(F.col(id_col), F.explode(toks).alias("_tok"))
    h = F.md5(F.concat(F.lit(salt), F.col("_tok")))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        % F.lit(int(n_features))
    ).cast("long")
    if alternate_sign:
        sign = F.when(
            F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1),
        ).otherwise(F.lit(-1))
    else:
        sign = F.lit(1)
    return (
        exploded.select(
            F.col(id_col),
            bucket.alias("feature"),
            sign.cast("long").alias("_sgn"),
        )
        .groupBy(id_col, "feature")
        .agg(F.sum("_sgn").cast("long").alias("tf"))
    )


class OneHotTransformer(_BaseTransformer):
    """Registry adapter (``type: one_hot``). Options: ``column``
    (required), ``values`` csv (required, the explicit vocabulary),
    ``prefix``, ``otherColumn``."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        if not opts.get("column"):
            errors.append("one_hot requires 'column'")
        elif opts["column"] not in df.columns:
            errors.append(f"column not in input schema: {opts['column']}")
        vals = _split_csv(opts.get("values"))
        if not vals:
            errors.append("one_hot requires 'values' (explicit vocabulary)")
        elif len(set(vals)) != len(vals):
            errors.append("one_hot values must be unique")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        return one_hot(
            df,
            opts["column"],
            _split_csv(opts["values"]),
            prefix=opts.get("prefix"),
            other_col=opts.get("otherColumn"),
        )


class FeatureHashTransformer(_BaseTransformer):
    """Registry adapter (``type: feature_hash``). Options:
    ``idColumn`` (required), ``textColumn`` (required),
    ``numFeatures`` (default 256), ``lowercase`` (default true),
    ``alternateSign`` (default false)."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        for key in ("idColumn", "textColumn"):
            col = opts.get(key)
            if not col:
                errors.append(f"feature_hash requires '{key}'")
            elif col not in df.columns:
                errors.append(f"{key} not in input schema: {col}")
        try:
            if int(opts.get("numFeatures", 256)) <= 0:
                errors.append("numFeatures must be > 0")
        except (TypeError, ValueError):
            errors.append(f"numFeatures is not an int: {opts['numFeatures']}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        return feature_hash(
            df,
            opts["idColumn"],
            opts["textColumn"],
            n_features=int(opts.get("numFeatures", 256)),
            lowercase=parse_bool(opts.get("lowercase"), default=True),
            alternate_sign=parse_bool(opts.get("alternateSign")),
        )
