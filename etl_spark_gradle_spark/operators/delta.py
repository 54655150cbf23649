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

__all__ = ["row_fingerprint", "table_diff", "apply_changes", "DiffTransformer"]


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

    ``compare_cols`` defaults to the non-key columns present on BOTH
    sides (sorted, so schema evolution that adds a column to one side
    doesn't silently flip everything to "update"). Rows with a NULL key
    never join (same as SQL ``USING``): they surface as one insert and
    one delete rather than matching each other.
    """
    if emit not in ("keys", "rows"):
        raise ValueError("emit must be 'keys' or 'rows'")
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
    out_cols = [*keys, change] if emit == "keys" else [*keys, change, *compare_cols]
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
