"""Snapshot diff / change-data-capture between two table versions.

The reference pipeline reloads whole tables per run (``loader/
S3Loader.scala`` overwrite mode; upserts exist only at the JDBC sink,
``loader/PostgresLoader.scala:152``). At 100 TB a daily full rewrite is
the dominant cost of the whole platform, so the missing primitive is a
*diff*: given yesterday's snapshot and today's, emit exactly the rows
that changed — the input to an incremental MERGE/upsert, an SCD feed,
or a downstream incremental dedup pass.

Scale design:

- Each side is projected to ``keys + one 64-bit fingerprint`` BEFORE the
  shuffle (``emit="keys"``), so the full-outer join moves ~16 bytes/row
  regardless of row width. With ``emit="rows"`` the current side carries
  its row image (the caller wants those bytes anyway — they feed the
  MERGE) while the previous side still ships only its fingerprint.
- ONE shuffle per side, hash-partitioned on the key — with bucketed
  snapshots (``bucketBy`` on the same keys, see ``sinks/loaders.py``)
  even that disappears and the diff is a zero-shuffle zip of buckets.
- The fingerprint is ``xxhash64(*cols, null_bitmap)``. Spark's hash
  functions skip null inputs (a null column leaves the running seed
  untouched), so ``("a", NULL)`` and ``(NULL, "a")`` would collide;
  folding an explicit null-position bitmap into the hash restores
  null-position sensitivity. A residual 2^-64 collision (missed update)
  per changed row is the standard CDC trade and is documented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.relational import (
    TransformationError,
    _BaseTransformer,
    _split_csv,
)
from etl_spark_gradle_spark.plans.config import (
    TransformationConfig,
    ValidationResult,
)

__all__ = [
    "row_fingerprint",
    "table_diff",
    "apply_changes",
    "scd2_init",
    "scd2_apply",
    "table_checksum",
    "consolidate",
    "DiffTransformer",
    "Scd2Transformer",
    "ConsolidateTransformer",
]


def row_fingerprint(cols: list[str]) -> F.Column:
    """64-bit null-position-sensitive fingerprint of the named columns.

    ``xxhash64`` alone treats a null column as "skip" (seed passes
    through), making ``("a", NULL)`` collide with ``(NULL, "a")``; the
    appended isnull-bitmap string disambiguates. Column ORDER is part of
    the fingerprint — callers must pass a canonical order (``table_diff``
    sorts the compare set).
    """
    if not cols:
        raise ValueError("row_fingerprint requires at least one column")
    bitmap = F.concat_ws("", *[F.isnull(F.col(c)).cast("int").cast("string") for c in cols])
    return F.xxhash64(*[F.col(c) for c in cols], bitmap)


def table_diff(
    current: DataFrame,
    previous: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    emit: str = "keys",
) -> DataFrame:
    """Classify every key as insert / delete / update (/ unchanged).

    - ``emit="keys"`` (default): returns ``keys + change_type`` — the
      minimal-shuffle plan (both sides reduced to key + fingerprint
      before the exchange). Feed this to a semi-join against the current
      snapshot to materialize changed rows.
    - ``emit="rows"``: returns ``keys + change_type + current row
      image`` (non-key columns; NULL for deletes) in one pass — the
      current side rides the shuffle in full, the previous side still
      ships only its fingerprint.
    - ``emit="both"``: additionally carries the PREVIOUS image as
      ``prev_<col>`` columns (NULL for inserts) — the Debezium-style
      before/after feed that downstream incremental maintenance
      (:func:`incremental_aggregate`) needs to subtract retired
      contributions. Both sides ride the shuffle in full.

    ``compare_cols`` defaults to the non-key columns present on BOTH
    sides (sorted, so schema evolution that adds a column to one side
    doesn't silently flip everything to "update"). Rows with a NULL key
    never join (same as SQL ``USING``): they surface as one insert and
    one delete rather than matching each other.
    """
    if emit not in ("keys", "rows", "both"):
        raise ValueError("emit must be 'keys', 'rows' or 'both'")
    if not keys:
        raise ValueError("table_diff requires at least one key column")
    for k in keys:
        if k not in current.columns:
            raise ValueError(f"key column not in current snapshot: {k}")
        if k not in previous.columns:
            raise ValueError(f"key column not in previous snapshot: {k}")
    if compare_cols is None:
        compare_cols = sorted(
            (set(current.columns) & set(previous.columns)) - set(keys)
        )
    else:
        for c in compare_cols:
            if c not in current.columns or c not in previous.columns:
                raise ValueError(f"compare column not on both sides: {c}")
        compare_cols = list(compare_cols)
    if not compare_cols:
        raise ValueError("no compare columns (snapshots share only the keys)")

    fp = row_fingerprint(compare_cols)
    if emit == "both":
        prev = previous.select(
            *keys,
            *[F.col(c).alias(f"prev_{c}") for c in compare_cols],
            fp.alias("_fp_prev"),
            F.lit(1).alias("_in_prev"),
        )
    else:
        prev = previous.select(*keys, fp.alias("_fp_prev"), F.lit(1).alias("_in_prev"))
    if emit == "keys":
        cur = current.select(*keys, fp.alias("_fp_cur"), F.lit(1).alias("_in_cur"))
    else:
        cur = current.select(
            *keys, *compare_cols, fp.alias("_fp_cur"), F.lit(1).alias("_in_cur")
        )

    joined = cur.join(prev, on=keys, how="full_outer")
    change = (
        F.when(F.col("_in_prev").isNull(), F.lit("insert"))
        .when(F.col("_in_cur").isNull(), F.lit("delete"))
        .when(F.col("_fp_cur") != F.col("_fp_prev"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type")
    )
    if emit == "keys":
        out_cols = [*keys, change]
    elif emit == "rows":
        out_cols = [*keys, change, *compare_cols]
    else:
        out_cols = [
            *keys, change, *compare_cols,
            *[f"prev_{c}" for c in compare_cols],
        ]
    out = joined.select(*out_cols)
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def apply_changes(
    previous: DataFrame,
    changes: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Consume a ``table_diff(emit="rows")`` feed: produce the NEXT
    snapshot from the previous one — drop deleted/updated keys, append
    insert/update images. The algebraic inverse of ``table_diff``:
    ``apply_changes(prev, table_diff(cur, prev, emit="rows"))`` equals
    ``cur`` row-for-row (property-tested), which is what makes the
    diff feed a safe incremental replication format.

    Plan shape: one anti-join of the previous snapshot against the
    (small) change keys — broadcast when Spark sizes it so — plus a
    union of the change images; the previous snapshot is never
    shuffled on its data columns. With bucketed snapshots the anti-join
    needs no exchange at all.
    """
    if not keys:
        raise ValueError("apply_changes requires at least one key column")
    if "change_type" not in changes.columns:
        raise ValueError("changes must come from table_diff (missing change_type)")
    for k in keys:
        if k not in previous.columns or k not in changes.columns:
            raise ValueError(f"key column not on both inputs: {k}")
    image_cols = [c for c in changes.columns if c != "change_type"]
    missing = [c for c in previous.columns if c not in image_cols]
    if missing:
        raise ValueError(
            f"changes lack previous-snapshot columns {missing} — diff must be "
            "emit='rows' over the same compare set"
        )
    touched = changes.filter(F.col("change_type") != "unchanged").select(*keys)
    kept = previous.join(touched, on=keys, how="left_anti")
    new_images = (
        changes.filter(F.col("change_type").isin("insert", "update"))
        .select(*previous.columns)
    )
    return kept.unionByName(new_images)


class DiffTransformer(_BaseTransformer):
    """YAML step ``type: diff``: diff the pipeline's current DataFrame
    against a named temp view (the previous snapshot, registered via the
    multi-source ``views:`` block like ``JoinTransformer``'s right side).

    Options: ``previousTable`` (view name, required), ``keys`` (csv,
    required), ``compareColumns`` (csv, optional), ``emit``
    (``keys``/``rows``), ``includeUnchanged`` (bool-ish string).
    """

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        if not (opts.get("previousTable") or "").strip():
            errors.append("diff requires 'previousTable' (a registered view)")
        keys = _split_csv(opts.get("keys"))
        if not keys:
            errors.append("diff requires 'keys'")
        for k in keys:
            if k not in df.columns:
                errors.append(f"key not in input schema: {k}")
        if opts.get("emit", "keys") not in ("keys", "rows"):
            errors.append("emit must be 'keys' or 'rows'")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        try:
            previous = ctx.spark.table(opts["previousTable"])
        except Exception as exc:
            raise TransformationError(
                f"diff: previousTable view '{opts['previousTable']}' not found "
                f"(register it under the pipeline's 'views:' block): {exc}"
            ) from exc
        return table_diff(
            df,
            previous,
            keys=_split_csv(opts.get("keys")),
            compare_cols=_split_csv(opts.get("compareColumns")) or None,
            include_unchanged=opts.get("includeUnchanged", "").lower()
            in ("true", "1", "yes"),
            emit=opts.get("emit", "keys"),
        )


def scd2_init(
    snapshot: DataFrame,
    keys: list[str],
    attr_cols: list[str],
    effective_ts,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Bootstrap an SCD Type-2 dimension from a plain snapshot: every
    row becomes version 1, open-ended and current. ``effective_ts`` is
    a Column or literal string timestamp."""
    ts = (
        F.lit(effective_ts).cast("timestamp")
        if isinstance(effective_ts, str)
        else effective_ts
    )
    return snapshot.select(
        *keys,
        *attr_cols,
        ts.alias(valid_from_col),
        F.lit(None).cast("timestamp").alias(valid_to_col),
        F.lit(True).alias(current_col),
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    attr_cols: list[str],
    effective_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge: apply a batch of change
    rows to a versioned dimension, producing the next dimension state.

    Semantics (Delta-Lake-style APPLY CHANGES, fully sequenced): change
    rows are ordered per key by ``effective_col``; consecutive rows with
    identical attributes (by :func:`row_fingerprint` — same 2^-64
    residual as ``table_diff``) collapse to one version, including a
    leading change equal to the key's CURRENT dimension row. Every
    surviving change closes its predecessor (``valid_to`` = its
    effective timestamp, exclusive) and opens a new version; the last
    one per key stays current. Keys absent from the change feed — and
    all historical (non-current) rows — pass through untouched. New
    keys enter at their first change. Deletes are out of scope (route
    tombstones through ``table_diff``/``apply_changes``).

    Contract: effective timestamps must be unique per key within a
    batch and later than the key's current ``valid_from`` (late-arriving
    updates need a reprocessing run over the widened feed, same as any
    watermarked system).

    Scale design: the ONLY shuffle is the per-key window over
    ``changes + touched current rows`` — churn-sized, not
    dimension-sized. Historical rows and untouched current rows are a
    scan-through union (no exchange); the touched/untouched split is a
    semi/anti join against the distinct change keys, dimension-sized
    only in the broadcast-able key column. At 100 TB a daily 0.1% churn
    batch moves ~0.1% of the dimension through the window, not the
    dimension itself.
    """
    from pyspark.sql.window import Window

    if not keys:
        raise ValueError("scd2_apply requires at least one key column")
    if not attr_cols:
        raise ValueError("scd2_apply requires at least one attribute column")
    for c in (*keys, *attr_cols, valid_from_col, valid_to_col, current_col):
        if c not in dim.columns:
            raise ValueError(f"dimension is missing column: {c}")
    for c in (*keys, *attr_cols, effective_col):
        if c not in changes.columns:
            raise ValueError(f"change feed is missing column: {c}")

    fp = row_fingerprint(list(attr_cols))
    out_cols = [*keys, *attr_cols, valid_from_col, valid_to_col, current_col]

    cur = dim.filter(F.col(current_col))
    hist = dim.filter(~F.col(current_col)).select(*out_cols)
    chg_keys = changes.select(*keys).distinct()
    cur_rest = cur.join(chg_keys, on=keys, how="left_anti").select(*out_cols)

    seed = cur.join(chg_keys, on=keys, how="left_semi").select(
        *keys,
        *attr_cols,
        F.col(valid_from_col).alias("_ts"),
        F.lit(0).alias("_src"),
    )
    feed = changes.select(
        *keys,
        *attr_cols,
        F.col(effective_col).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_src"),
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("_src", "_ts")
    timeline = (
        seed.unionByName(feed)
        .withColumn("_fp", fp)
        .withColumn("_prev_fp", F.lag("_fp").over(w))
    )
    surv = timeline.filter(
        F.col("_prev_fp").isNull() | (F.col("_fp") != F.col("_prev_fp"))
    )
    versions = (
        surv.withColumn("_next_ts", F.lead("_ts").over(w))
        .select(
            *keys,
            *attr_cols,
            F.col("_ts").alias(valid_from_col),
            F.col("_next_ts").alias(valid_to_col),
            F.col("_next_ts").isNull().alias(current_col),
        )
    )
    return hist.unionByName(cur_rest).unionByName(versions)


class Scd2Transformer(_BaseTransformer):
    """YAML step ``type: scd2``: the pipeline's current DataFrame is the
    CHANGE FEED; the versioned dimension comes from a registered view
    (the multi-source ``views:`` block). Output is the next dimension
    state — route it to the sink that rewrites (or MERGEs) the
    dimension table.

    Options: ``dimTable`` (view name, required), ``keys`` (csv,
    required), ``attrColumns`` (csv; defaults to the non-key columns
    the feed shares with the dimension, minus the SCD bookkeeping
    columns), ``effectiveColumn`` (required), ``validFromColumn`` /
    ``validToColumn`` / ``currentColumn`` (default ``valid_from`` /
    ``valid_to`` / ``is_current``).
    """

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        if not (opts.get("dimTable") or "").strip():
            errors.append("scd2 requires 'dimTable' (a registered view)")
        keys = _split_csv(opts.get("keys"))
        if not keys:
            errors.append("scd2 requires 'keys'")
        for k in keys:
            if k not in df.columns:
                errors.append(f"key not in change-feed schema: {k}")
        eff = (opts.get("effectiveColumn") or "").strip()
        if not eff:
            errors.append("scd2 requires 'effectiveColumn'")
        elif eff not in df.columns:
            errors.append(f"effectiveColumn not in change-feed schema: {eff}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        try:
            dim = ctx.spark.table(opts["dimTable"])
        except Exception as exc:
            raise TransformationError(
                f"scd2: dimTable view '{opts['dimTable']}' not found "
                f"(register it under the pipeline's 'views:' block): {exc}"
            ) from exc
        keys = _split_csv(opts.get("keys"))
        valid_from = opts.get("validFromColumn", "valid_from")
        valid_to = opts.get("validToColumn", "valid_to")
        current = opts.get("currentColumn", "is_current")
        attrs = _split_csv(opts.get("attrColumns"))
        if not attrs:
            scd_cols = {valid_from, valid_to, current}
            attrs = sorted(
                (set(df.columns) & set(dim.columns)) - set(keys) - scd_cols
            )
        if not attrs:
            raise TransformationError(
                "scd2: no attribute columns (feed and dimension share only keys)"
            )
        return scd2_apply(
            dim,
            df,
            keys=keys,
            attr_cols=attrs,
            effective_col=opts["effectiveColumn"],
            valid_from_col=valid_from,
            valid_to_col=valid_to,
            current_col=current,
        )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    time_col: str,
    dim_cols: list[str] | None = None,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    include_valid_from: bool = False,
) -> DataFrame:
    """Point-in-time (temporal) join: attach to every fact row the
    dimension attributes of the version that was valid AT THE FACT'S
    EVENT TIME — ``valid_from <= t < valid_to`` (open version:
    ``valid_to IS NULL``). The query-side complement of
    :func:`scd2_apply`: that operator maintains the version timeline,
    this one reads it correctly (joining facts to ``is_current`` rows
    is the classic time-travel bug — it rewrites history with today's
    attributes).

    LEFT join semantics: facts before the key's first version (or with
    an unknown key) keep NULL dimension columns. Versions produced by
    ``scd2_apply`` are non-overlapping per key by construction, so each
    fact matches at most one version (guaranteed one output row per
    fact row).

    Scale design: one equi-join shuffle on the key (or a dim broadcast
    when it fits) with the interval predicate evaluated inside the
    join — the row multiplication BEFORE the interval filter is
    facts × versions-per-key, and version counts are churn-bounded
    (per-key change counts), not data-sized. For pathological per-key
    version histories, route through ``asof_join`` on ``valid_from``
    (union-merge, no multiplication) and post-filter ``valid_to`` —
    same result, different constant.
    """
    if not keys:
        raise TransformationError("scd2_lookup requires at least one key column")
    for c in (*keys, time_col):
        if c not in facts.columns:
            raise TransformationError(f"fact column not in input schema: {c}")
    for c in (*keys, valid_from_col, valid_to_col):
        if c not in dim.columns:
            raise TransformationError(f"dimension is missing column: {c}")
    scd_cols = {valid_from_col, valid_to_col, "is_current"}
    dim_cols = dim_cols or sorted(set(dim.columns) - set(keys) - scd_cols)
    for c in dim_cols:
        if c not in dim.columns:
            raise TransformationError(f"dimension is missing column: {c}")
    clash = [c for c in dim_cols if c in facts.columns]
    if clash:
        raise TransformationError(
            f"dimension columns collide with fact columns: {clash} — "
            "rename on one side or pass dim_cols"
        )

    # internal interval-bound aliases must not collide with ANY fact
    # or selected dimension column — a fact column literally named
    # "_vf" would otherwise be silently dropped at the end
    taken = set(facts.columns) | set(dim_cols) | set(keys)
    vf, vt, i = "_vf", "_vt", 0
    while vf in taken or vt in taken:
        i += 1
        vf, vt = f"_vf{i}", f"_vt{i}"
    d = dim.select(
        *keys,
        *dim_cols,
        F.col(valid_from_col).alias(vf),
        F.col(valid_to_col).alias(vt),
    )
    t = F.col(time_col)
    cond = (t >= F.col(vf)) & (F.col(vt).isNull() | (t < F.col(vt)))
    for k in keys:
        cond = cond & (facts[k] == d[k])
    out = facts.join(d, cond, "left").drop(*[d[k] for k in keys])
    if include_valid_from:
        out = out.withColumn(valid_from_col, F.col(vf))
    return out.drop(vf, vt)


class Scd2LookupTransformer(_BaseTransformer):
    """YAML step ``type: scd2_lookup``: the pipeline's current frame is
    the FACT table; the versioned dimension comes from a registered
    view. Options: ``dimTable`` (view name, required), ``keys`` (csv,
    required), ``timeColumn`` (required), ``dimColumns`` (csv; default
    = all non-key non-SCD dimension columns), ``validFromColumn`` /
    ``validToColumn``, ``includeValidFrom`` (attach the matched
    version's start for provenance)."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        if not (opts.get("dimTable") or "").strip():
            errors.append("scd2_lookup requires 'dimTable' (a registered view)")
        keys = _split_csv(opts.get("keys"))
        if not keys:
            errors.append("scd2_lookup requires 'keys'")
        for k in keys:
            if k not in df.columns:
                errors.append(f"key not in fact schema: {k}")
        tc = (opts.get("timeColumn") or "").strip()
        if not tc:
            errors.append("scd2_lookup requires 'timeColumn'")
        elif tc not in df.columns:
            errors.append(f"timeColumn not in fact schema: {tc}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        try:
            dim = ctx.spark.table(opts["dimTable"])
        except Exception as exc:
            raise TransformationError(
                f"scd2_lookup: dimTable view '{opts['dimTable']}' not found "
                f"(register it under the pipeline's 'views:' block): {exc}"
            ) from exc
        return scd2_lookup(
            df,
            dim,
            keys=_split_csv(opts.get("keys")),
            time_col=opts["timeColumn"],
            dim_cols=_split_csv(opts.get("dimColumns")) or None,
            valid_from_col=opts.get("validFromColumn", "valid_from"),
            valid_to_col=opts.get("validToColumn", "valid_to"),
            include_valid_from=str(opts.get("includeValidFrom", "false")).lower()
            == "true",
        )


_INCR_AGG_FNS = ("sum", "count", "min", "max")


def incremental_aggregate(
    state: DataFrame,
    group_by: list[str],
    aggregations: list,
    inserted: DataFrame | None = None,
    deleted: DataFrame | None = None,
    count_alias: str = "cnt",
) -> DataFrame:
    """Maintain a materialized per-group rollup from a change feed
    WITHOUT re-scanning the base table: ``new_state = state ⊕
    agg(inserted) ⊖ agg(deleted)``.

    ``state`` is a previously materialized output of the same spec
    (group columns + one column per ``AggregateExpr`` alias).
    ``aggregations`` must include a ``count`` over ``*`` (aliased
    ``count_alias``) — it is the group-liveness witness: groups whose
    maintained count reaches 0 are dropped (all members deleted), and
    brand-new groups enter from the inserted side.

    Supported functions: ``sum`` and ``count`` are fully maintainable
    (commutative group ops). ``min``/``max`` are maintainable under
    INSERTS ONLY (least/greatest merge) — a delete could retire the
    current extremum, which only a re-scan of that group can replace,
    so passing ``deleted`` with a min/max spec raises with guidance
    (re-aggregate the affected groups instead). ``avg`` is the caller's
    division of a maintained sum by the maintained count.

    At 100 TB: a daily rollup over a 0.1 % churn feed costs three
    churn-sized aggregations and a |groups|-sized outer join — the
    base table is never touched. This completes the CDC chain:
    ``table_diff(emit="both")`` → snapshots via ``apply_changes``,
    dimensions via ``scd2_apply``, rollups via this.
    """
    from etl_spark_gradle_spark.plans.config import AggregateExpr  # noqa: F401

    if not group_by:
        raise ValueError("incremental_aggregate requires group columns")
    if not aggregations:
        raise ValueError("incremental_aggregate requires aggregations")
    specs = []
    has_count = False
    for a in aggregations:
        fn = a.function.lower()
        if fn not in _INCR_AGG_FNS:
            raise ValueError(
                f"incremental_aggregate supports {_INCR_AGG_FNS}, got '{a.function}'"
            )
        if fn == "count":
            has_count = True
            if a.alias != count_alias:
                raise ValueError(
                    f"the count spec must be aliased '{count_alias}' "
                    "(the group-liveness witness)"
                )
        if fn in ("min", "max") and deleted is not None:
            raise ValueError(
                f"{fn}('{a.column}') is not maintainable under deletes — a "
                "delete can retire the current extremum; re-aggregate the "
                "affected groups instead (or maintain inserts-only)"
            )
        specs.append((a.column, fn, a.alias))
    if not has_count:
        raise ValueError(
            f"aggregations must include count(*) AS {count_alias} "
            "(group-liveness witness)"
        )
    for c in group_by:
        if c not in state.columns:
            raise ValueError(f"state is missing group column: {c}")
    for _, _, alias in specs:
        if alias not in state.columns:
            raise ValueError(f"state is missing aggregate column: {alias}")

    def _agg(df: DataFrame, tag: str) -> DataFrame:
        aggs = []
        for col, fn, alias in specs:
            if fn == "count":
                aggs.append(F.count("*").alias(f"{tag}_{alias}"))
            elif fn == "sum":
                aggs.append(F.sum(F.col(col)).alias(f"{tag}_{alias}"))
            elif fn == "min":
                aggs.append(F.min(F.col(col)).alias(f"{tag}_{alias}"))
            else:
                aggs.append(F.max(F.col(col)).alias(f"{tag}_{alias}"))
        return df.groupBy(*group_by).agg(*aggs)

    out = state
    if inserted is not None:
        out = out.join(_agg(inserted, "_ins"), on=group_by, how="full_outer")
    if deleted is not None:
        out = out.join(_agg(deleted, "_del"), on=group_by, how="full_outer")

    proj = [*group_by]
    for col, fn, alias in specs:
        cur = F.col(alias)
        ins = F.col(f"_ins_{alias}") if inserted is not None else F.lit(None)
        dele = F.col(f"_del_{alias}") if deleted is not None else F.lit(None)
        if fn in ("sum", "count"):
            merged = (
                F.coalesce(cur, F.lit(0))
                + F.coalesce(ins, F.lit(0))
                - F.coalesce(dele, F.lit(0))
            )
            if fn == "count":
                merged = merged.cast("long")
        else:
            merged = (F.least if fn == "min" else F.greatest)(cur, ins)
            # least/greatest skip nulls only with >1 non-null arg; a
            # brand-new group has NULL state -> take the inserted value
            merged = F.coalesce(merged, ins, cur)
        proj.append(merged.alias(alias))
    out = out.select(*proj)
    return out.where(F.col(count_alias) > 0)


def table_checksum(
    df: DataFrame,
    columns: list[str] | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Order-independent table checksum: the exact decimal SUM of
    per-row 64-bit fingerprints plus the row count — equal checksums
    (at 2^-64 per-row collision odds) mean equal multisets of rows.
    The cheap pre-flight for replication/migration validation: compare
    two checksums before paying for a full :func:`table_diff`, or
    persist per-partition checksums and ROLL THEM UP (decimal sums
    add) the way the sketch family does.

    ``hash_fn="xxhash64"`` is the fast JVM path (with the same
    null-position bitmap as :func:`row_fingerprint`);``"md5"`` derives
    the row hash from the first 16 hex chars of md5 over a '|'-joined
    canonical string — engine-portable (the DuckDB oracle reproduces
    the checksum bit-for-bit), at md5 cost. Plan: one scan, one 1-row
    aggregate; zero shuffles beyond the final partial-agg gather."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"table_checksum hash_fn must be xxhash64|md5, got '{hash_fn}'")
    cols = columns if columns is not None else sorted(df.columns)
    if not cols:
        raise ValueError("table_checksum requires at least one column")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"checksum column not in schema: {c}")
    if hash_fn == "xxhash64":
        row_hash = row_fingerprint(list(cols))
    else:
        canon = F.concat_ws(
            "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
        )
        row_hash = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return df.agg(
        F.sum(row_hash.cast("decimal(38,0)")).alias("checksum"),
        F.count("*").alias("row_count"),
    )


_CONSOLIDATE_STRATEGIES = (
    "max", "min", "first", "last", "first_non_null", "last_non_null",
    "sum_exact", "collect_set",
)


def consolidate(
    df: DataFrame,
    keys: list[str],
    rules: dict[str, str],
    order_by: list[str] | None = None,
    count_col: str | None = "n_rows",
) -> DataFrame:
    """Golden-record consolidation (MDM survivorship): collapse every
    entity's duplicate rows into ONE row, choosing each output column
    by an explicit per-column rule — the step after duplicate
    detection (``dedup_from_pairs`` keeps one *source row*; this
    *merges* the cluster field-by-field, which is what master-data
    pipelines actually ship):

    - ``max`` / ``min``: extreme value,
    - ``first`` / ``last``: value of the first/last row in ``order_by``
      order (NULL if that row's value is NULL — positional semantics),
    - ``first_non_null`` / ``last_non_null``: earliest/latest OBSERVED
      value in ``order_by`` order (the classic "most recent known
      email" rule),
    - ``sum_exact``: exact decimal(18,6) sum closed to double via the
      string round-trip (partition-order free),
    - ``collect_set``: sorted array of distinct values (lossless
      audit column).

    Ordered rules need ``order_by`` — and it must be a TOTAL order per
    entity (include a unique tiebreak column), or first/last are
    nondeterministic; the operator refuses ordered rules without it.
    First/last are selected via lexicographic struct min/max over
    ``(order_by…, value)`` — both Spark and DuckDB compare structs
    field-by-field, so the oracle replays the survivorship exactly.

    Plan at 100 TB: ONE map-side-combined groupBy on the entity keys —
    every rule is an aggregate expression with constant-size partials
    (``collect_set`` bounded by per-entity distinct values); no
    windows, no self-joins, no second pass.
    """
    if not keys:
        raise TransformationError("consolidate requires entity key columns")
    if not rules:
        raise TransformationError("consolidate requires at least one rule")
    for c in keys:
        if c not in df.columns:
            raise TransformationError(f"key column not in input schema: {c}")
    order_by = order_by or []
    for c in order_by:
        if c not in df.columns:
            raise TransformationError(
                f"order column not in input schema: {c}"
            )
    ordered_rules = {"first", "last", "first_non_null", "last_non_null"}
    aggs = []
    for col, strat in rules.items():
        if col not in df.columns:
            raise TransformationError(
                f"rule column not in input schema: {col}"
            )
        if col in keys:
            raise TransformationError(
                f"rule column is an entity key: {col}"
            )
        if strat not in _CONSOLIDATE_STRATEGIES:
            raise TransformationError(
                f"unknown consolidate strategy '{strat}' for {col} "
                f"(supported: {sorted(_CONSOLIDATE_STRATEGIES)})"
            )
        if strat in ordered_rules and not order_by:
            raise TransformationError(
                f"consolidate strategy '{strat}' needs order_by "
                "(a TOTAL order per entity — include a tiebreak)"
            )
        v = F.col(col)
        if strat == "max":
            aggs.append(F.max(v).alias(col))
        elif strat == "min":
            aggs.append(F.min(v).alias(col))
        elif strat == "sum_exact":
            aggs.append(
                F.sum(v.cast("decimal(18,6)"))
                .cast("string")
                .cast("double")
                .alias(col)
            )
        elif strat == "collect_set":
            aggs.append(F.array_sort(F.collect_set(v)).alias(col))
        else:
            key = F.struct(
                *[F.col(o).alias(f"o{i}") for i, o in enumerate(order_by)],
                v.alias("v"),
            )
            if strat == "first":
                aggs.append(F.min(key)["v"].alias(col))
            elif strat == "last":
                aggs.append(F.max(key)["v"].alias(col))
            elif strat == "first_non_null":
                aggs.append(
                    F.min(F.when(v.isNotNull(), key))["v"].alias(col)
                )
            else:  # last_non_null
                aggs.append(
                    F.max(F.when(v.isNotNull(), key))["v"].alias(col)
                )
    if count_col:
        aggs.append(F.count(F.lit(1)).cast("long").alias(count_col))
    return df.groupBy(*keys).agg(*aggs)


class ConsolidateTransformer(_BaseTransformer):
    """Registry adapter (``type: consolidate``). Options: ``keys`` csv
    (required), ``rules`` csv of ``column:strategy`` (required),
    ``orderBy`` csv (required when any ordered rule is used),
    ``countColumn`` (default ``n_rows``; empty string drops it)."""

    @staticmethod
    def _parse_rules(spec: str | None) -> dict[str, str]:
        rules: dict[str, str] = {}
        for part in _split_csv(spec):
            if ":" not in part:
                raise TransformationError(
                    f"consolidate rule must be column:strategy, got '{part}'"
                )
            col, strat = part.split(":", 1)
            rules[col.strip()] = strat.strip()
        return rules

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        if not _split_csv(opts.get("keys")):
            errors.append("consolidate requires 'keys'")
        try:
            rules = self._parse_rules(opts.get("rules"))
            if not rules:
                errors.append("consolidate requires 'rules'")
            for col, strat in rules.items():
                if strat not in _CONSOLIDATE_STRATEGIES:
                    errors.append(f"unknown strategy '{strat}' for {col}")
                elif col not in df.columns:
                    errors.append(f"rule column not in input schema: {col}")
        except TransformationError as e:
            errors.append(str(e))
        for c in _split_csv(opts.get("keys")) + _split_csv(opts.get("orderBy")):
            if c not in df.columns:
                errors.append(f"column not in input schema: {c}")
        return (
            ValidationResult.ok()
            if not errors
            else ValidationResult.fail(*errors)
        )

    def _apply(self, df, config, ctx):
        opts = config.options
        count_col = opts.get("countColumn", "n_rows") or None
        return consolidate(
            df,
            keys=_split_csv(opts["keys"]),
            rules=self._parse_rules(opts["rules"]),
            order_by=_split_csv(opts.get("orderBy")) or None,
            count_col=count_col,
        )
