"""Salted skew join: an equi-join that survives pathological hot keys.

Beyond-reference operator (the reference's only join is the plain
equi-join of ``transformer/JoinTransformer.scala:31-95``; nothing in
``src/main`` addresses key skew — SURVEY.md §2.3). At 100 TB the
single most common join failure is one hot key (the null-ish sentinel
customer, the crawler's ``unknown`` domain, the one viral document)
owning 10%+ of the fact side: every row of that key lands on ONE
reducer, which spills, retries, and eventually OOMs while the other
999 executors idle.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) already
splits oversized *partitions* of a sort-merge join, and it should stay
on — but it only triggers post-shuffle on sort-merge plans, can't help
when the hot key's right-side rows must still be colocated into one
partition to build the hash side, and does nothing for joins AQE
picked a different strategy for. ``skew_join`` is the explicit,
plan-level counterpart (the aggregation-side twin is
``relational.salted_aggregate``):

1. **Find hot keys** — either caller-supplied, or one map-side-combined
   count aggregation over the left side's keys (optionally on a
   seeded sample at very large scale); keys with ``count >=
   hot_threshold``, capped at ``max_hot_keys`` by descending count.
   The hot set is collected to the driver (bounded by the cap) so both
   sides split against the SAME frozen set — a recomputed,
   nondeterministic hot set could disagree between the two uses and
   silently lose or duplicate rows.
2. **Split both sides** by hot-key membership with a broadcast
   semi/anti join (the hot set is ≤ ``max_hot_keys`` rows — KBs).
   Because hotness is a property of the KEY, a cold left row can never
   match a hot right row: the cold⋈cold and hot⋈hot unions partition
   the full join exactly.
3. **Cold path**: plain equi-join, strategy left to Catalyst/AQE.
4. **Hot path**: the left side gets a deterministic per-row salt
   (``row_fingerprint % salt_buckets`` — content-derived, so retried
   tasks recompute the same salt; ``rand()`` here would break
   exactly-once row accounting under speculative execution), the right
   side's hot rows are replicated ``salt_buckets`` times via
   ``explode``, and the join runs on ``keys + salt`` — the hot key now
   spreads over ``salt_buckets`` reducers instead of one.

Results are row-for-row identical to the plain join (property-tested
against it in ``tests/test_skew.py``); only the physical distribution
changes. Cost model: the hot path replicates ONLY the hot keys' right
rows ×``salt_buckets`` — for the classic fact⋈dimension skew (huge hot
fact side, a handful of dimension rows per hot key) that is a few
hundred duplicated dimension rows in exchange for an N-way spread of
the hot key's fact rows.

``how`` supports ``inner`` and ``left``. Right/full-outer are refused
with a guided error: an unmatched REPLICATED right row would emit one
null-padded output per salt bucket — ``salt_buckets``× duplicates —
and deduplicating them afterwards costs the very shuffle the salt was
avoiding (flip the sides and use ``left`` instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.delta import row_fingerprint
from etl_spark_gradle_spark.operators.relational import (
    TransformationError,
    _BaseTransformer,
    _split_csv,
)
from etl_spark_gradle_spark.plans.config import (
    TransformationConfig,
    ValidationResult,
)

__all__ = ["skew_join", "skew_report", "SkewJoinTransformer", "SkewReportTransformer"]

_SALT = "__skew_salt"


def _validate(left: DataFrame, right: DataFrame, on, how, salt_buckets) -> None:
    if not on:
        raise TransformationError("skew_join requires at least one join key")
    for c in on:
        if c not in left.columns:
            raise TransformationError(f"join key not in left schema: {c}")
        if c not in right.columns:
            raise TransformationError(f"join key not in right schema: {c}")
    if how not in ("inner", "left"):
        raise TransformationError(
            f"skew_join supports how in ('inner', 'left'), got '{how}' — "
            "for right/full-outer, unmatched REPLICATED right rows would "
            "null-pad once per salt bucket; flip the sides and use 'left'"
        )
    if salt_buckets < 2:
        raise TransformationError("skew_join salt_buckets must be >= 2")
    if _SALT in left.columns or _SALT in right.columns:
        raise TransformationError(f"column name '{_SALT}' is reserved by skew_join")


def _detect_hot_keys(
    left: DataFrame,
    on: list[str],
    hot_threshold: int,
    max_hot_keys: int,
    sample_fraction: float | None,
) -> list:
    """Hot-key tuples by left-side key frequency, ordered by descending
    count then key (deterministic cap). The count aggregation is
    map-side combined, so its shuffle carries |distinct keys| rows; at
    extreme scale pass ``sample_fraction`` to count a seeded sample
    instead (the threshold is scaled accordingly — hotness detection
    tolerates sampling noise because MISSING a borderline-hot key only
    costs performance, never correctness)."""
    base = left.select(*on)
    threshold = float(hot_threshold)
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=42)
        threshold = threshold * sample_fraction
    counts = (
        base.groupBy(*[F.col(c) for c in on])
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= F.lit(threshold))
        .orderBy(F.col("__cnt").desc(), *[F.col(c) for c in on])
        .limit(max_hot_keys)
    )
    return counts.drop("__cnt").collect()


def skew_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    hot_keys: list | None = None,
    hot_threshold: int | None = None,
    max_hot_keys: int = 1000,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Equi-join ``left`` with ``right`` on same-named ``on`` keys with
    explicit salting of hot keys. Output schema and rows are identical
    to ``left.join(right, on, how)`` (keys once, then left non-key,
    then right non-key columns).

    Exactly one of ``hot_keys`` (explicit key values: scalars for a
    single key, tuples for composite keys) or ``hot_threshold``
    (auto-detect from left-side key counts) must be given. If no key
    reaches the threshold the plain join is returned untouched.
    """
    how = how.lower()
    _validate(left, right, on, how, salt_buckets)
    if (hot_keys is None) == (hot_threshold is None):
        raise TransformationError(
            "skew_join requires exactly one of hot_keys / hot_threshold"
        )

    # NULL join keys can never equi-match, so (a) they are excluded from
    # hot candidacy (membership semi-joins couldn't route them anyway),
    # (b) null-key RIGHT rows are dropped up front (they contribute
    # nothing under inner/left), and (c) null-key LEFT rows BYPASS the
    # join entirely: dropped for inner (matching the plain join) or
    # null-padded directly for left — which means the classic "NULL
    # sentinel owns 10% of the facts" hot spot never even enters the
    # join shuffle, stronger than any salting.
    null_key = None
    for c in on:
        e = F.col(c).isNull()
        null_key = e if null_key is None else null_key | e
    left_nullpad = left.filter(null_key) if how == "left" else None
    left = left.filter(~null_key)
    right = right.filter(~null_key)

    out_cols_early = (
        on
        + [c for c in left.columns if c not in on]
        + [c for c in right.columns if c not in on]
    )

    def _with_null_rows(joined):
        if left_nullpad is None:
            return joined
        padded = left_nullpad
        for c in right.columns:
            if c not in on:
                padded = padded.withColumn(
                    c, F.lit(None).cast(right.schema[c].dataType)
                )
        return joined.unionByName(padded.select(*out_cols_early))

    if hot_keys is not None:
        rows = [k if isinstance(k, (tuple, list)) else (k,) for k in hot_keys]
        rows = [r for r in rows if all(v is not None for v in r)]
    else:
        rows = [
            tuple(r)
            for r in _detect_hot_keys(
                left, on, hot_threshold, max_hot_keys, sample_fraction
            )
        ]
    if not rows:
        return _with_null_rows(left.join(right, on=on, how=how))

    spark = left.sparkSession
    key_schema = left.select(*on).schema
    hot = F.broadcast(spark.createDataFrame(rows, schema=key_schema))

    left_hot = left.join(hot, on=on, how="left_semi")
    left_cold = left.join(hot, on=on, how="left_anti")
    right_hot = right.join(hot, on=on, how="left_semi")
    right_cold = right.join(hot, on=on, how="left_anti")

    # plain-join output contract: keys once, left non-key, right non-key
    out_cols = (
        on
        + [c for c in left.columns if c not in on]
        + [c for c in right.columns if c not in on]
    )

    cold = left_cold.join(right_cold, on=on, how=how).select(*out_cols)

    salt = F.pmod(row_fingerprint(list(left.columns)), F.lit(salt_buckets))
    salted_left = left_hot.withColumn(_SALT, salt)
    replicated_right = right_hot.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    hot_joined = (
        salted_left.join(replicated_right, on=on + [_SALT], how=how)
        .select(*out_cols)
    )
    return _with_null_rows(cold.unionByName(hot_joined))


class SkewJoinTransformer(_BaseTransformer):
    """Registry adapter (``type: skew_join``). Right side is a named
    temp view (``rightTable``), matching ``JoinTransformer``. Options:
    ``joinKeys`` (csv, required — same-named equi-keys; ``on`` is
    accepted as an alias but must be quoted in YAML, where a bare
    ``on:`` key parses as boolean true), ``rightOn`` (csv — the right table's key
    columns when their names differ; renamed to ``on`` positionally
    before the join), ``joinType`` (inner|left, default inner),
    ``saltBuckets`` (default 16), exactly one of ``hotKeys`` (csv of
    single-key values, cast to the key's type) / ``hotThreshold``,
    plus ``maxHotKeys`` and ``sampleFraction``."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        keys = _split_csv(opts.get("joinKeys") or opts.get("on"))
        if not keys:
            errors.append("skew_join requires 'joinKeys' (csv of join keys)")
        else:
            for c in keys:
                if c not in df.columns:
                    errors.append(f"join key not in input schema: {c}")
        if not opts.get("rightTable"):
            errors.append("skew_join requires 'rightTable'")
        jt = opts.get("joinType", "inner").lower()
        if jt not in ("inner", "left"):
            errors.append(f"skew_join joinType must be inner or left, got {jt}")
        has_keys = bool(opts.get("hotKeys"))
        has_thresh = opts.get("hotThreshold") is not None
        if has_keys == has_thresh:
            errors.append("skew_join requires exactly one of hotKeys / hotThreshold")
        if has_keys and keys and len(keys) > 1:
            errors.append("hotKeys csv supports single-key joins; use the API for composite keys")
        right_on = _split_csv(opts.get("rightOn"))
        if right_on and keys and len(right_on) != len(keys):
            errors.append("rightOn must list exactly one column per 'on' key")
        for num_key in ("saltBuckets", "hotThreshold", "maxHotKeys"):
            if opts.get(num_key) is not None:
                try:
                    int(opts[num_key])
                except (TypeError, ValueError):
                    errors.append(f"{num_key} must be an integer")
        if opts.get("sampleFraction") is not None:
            try:
                float(opts["sampleFraction"])
            except (TypeError, ValueError):
                errors.append("sampleFraction must be numeric")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        keys = _split_csv(opts.get("joinKeys") or opts.get("on"))
        right = ctx.spark.table(opts["rightTable"])
        right_on = _split_csv(opts.get("rightOn"))
        if right_on:
            for src, dst in zip(right_on, keys):
                right = right.withColumnRenamed(src, dst)
        hot_keys = None
        if opts.get("hotKeys"):
            key_type = dict(df.dtypes)[keys[0]]
            raw = _split_csv(opts["hotKeys"])
            if key_type in ("tinyint", "smallint", "int", "bigint"):
                hot_keys = [int(v) for v in raw]
            elif key_type in ("float", "double"):
                hot_keys = [float(v) for v in raw]
            else:
                hot_keys = raw
        ht = opts.get("hotThreshold")
        sf = opts.get("sampleFraction")
        return skew_join(
            df,
            right,
            on=keys,
            how=opts.get("joinType", "inner"),
            salt_buckets=int(opts.get("saltBuckets", 16)),
            hot_keys=hot_keys,
            hot_threshold=int(ht) if ht is not None else None,
            max_hot_keys=int(opts.get("maxHotKeys", 1000)),
            sample_fraction=float(sf) if sf is not None else None,
        )


def skew_report(
    df: DataFrame,
    columns: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Key-skew diagnostics: for each candidate key column, the top-k
    heaviest values with exact counts and their share of the table —
    the report that decides WHICH keys need `skew_join`/
    `salted_aggregation` before a 100 TB run melts one reducer.
    Output (column, value, n, share, rank), values rendered as
    strings so heterogeneous columns stack in one relation (NULL keys
    reported as a real value — they are the most common hot key in
    the wild).

    Plan: ONE pass — the candidate columns stack via a narrow
    ``explode`` into (column, value) pairs, then a single
    map-side-combined groupBy; the total is a 1-row broadcast and the
    top-k close is a per-column WindowGroupLimit (partial limits run
    map-side, the exchange carries ≤ k·tasks rows per column).
    """
    from pyspark.sql.window import Window

    if not columns:
        raise TransformationError("skew_report requires candidate columns")
    if top_k < 1:
        raise TransformationError("skew_report requires top_k >= 1")
    for c in columns:
        if c not in df.columns:
            raise TransformationError(f"column not in input schema: {c}")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in columns
                ]
            )
        ).alias("p")
    ).select("p.column", "p.value")
    counts = pairs.groupBy("column", "value").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = df.select(F.count(F.lit(1)).cast("long").alias("_total"))
    w = Window.partitionBy("column").orderBy(
        F.desc("n"), F.asc_nulls_first("value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(top_k))
        .crossJoin(F.broadcast(total))
        .select(
            "column",
            "value",
            "n",
            (F.col("n").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
            "rank",
        )
    )


class SkewReportTransformer(_BaseTransformer):
    """Registry adapter (``type: skew_report``). Options: ``columns``
    csv (required), ``topK`` (default 10)."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        cols = _split_csv(config.options.get("columns"))
        if not cols:
            errors.append("skew_report requires 'columns'")
        for c in cols:
            if c not in df.columns:
                errors.append(f"column not in input schema: {c}")
        try:
            if int(config.options.get("topK", 10)) < 1:
                errors.append("topK must be >= 1")
        except (TypeError, ValueError):
            errors.append(f"topK is not an int: {config.options['topK']}")
        return (
            ValidationResult.ok()
            if not errors
            else ValidationResult.fail(*errors)
        )

    def _apply(self, df, config, ctx):
        return skew_report(
            df,
            columns=_split_csv(config.options["columns"]),
            top_k=int(config.options.get("topK", 10)),
        )
