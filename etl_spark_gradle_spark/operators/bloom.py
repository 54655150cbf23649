"""Bloom-pruned semi join: filter a huge probe side with a relational
split-block Bloom bitmap BEFORE the exact join shuffles it.

Beyond-reference operator (the reference's only join is the plain
equi-join of ``transformer/JoinTransformer.scala:31-95``; nothing in
``src/main`` pre-prunes a probe side). The classic 100 TB shape this
serves: ``fact ⋈ (selective slice of a big dimension)`` where the
build side's ROWS are too many to broadcast (so Catalyst picks a
sort-merge join and shuffles the full fact table) but its KEY-SET
DIGEST fits in under a megabyte. Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, SPARK-32268)
exists for exactly this reason, but it is an optimizer heuristic —
thresholds, creation-side size caps, and join-type support decide
whether it fires, and the ``bloom_filter_agg`` / ``might_contain``
expressions it uses are not registered for SQL/DataFrame use (checked:
``UNRESOLVED_ROUTINE`` on pyspark 4.1). This operator is the explicit,
always-on counterpart, built from plain Catalyst bit expressions so it
runs JVM-side inside whole-stage codegen on ANY Spark.

Layout: SPLIT-BLOCK Bloom (the design Parquet's SBBF and Impala use —
Putze/Sanders/Singler 2007 "Cache-, Hash- and Space-Efficient Bloom
Filters"): each key hashes to exactly ONE 64-bit word (its block) and
sets ``num_hashes`` bits WITHIN that word. An earlier revision used a
classic Bloom over the whole bit domain, whose ``num_hashes``
independent positions forced ``num_hashes`` sequential broadcast
probe joins (and Spark does not reuse the broadcast exchange across
them — measured: build side re-scanned per probe, zero
ReusedExchange, plus a collect/re-parallelize materialization
workaround whose cost exceeded what it saved at bench scale; two
rounds of worst-in-suite bench drift). The block layout needs ONE
equi-join however many bits are set — probe cost is independent of
``num_hashes``:

1. **Build** (``build_bloom``): distinct build keys → one
   ``(word_idx, mask)`` pair each — ``word_idx = pmod(xxhash64(key,
   seed_a), num_bits/64)``, ``mask`` = OR of ``num_hashes`` bits
   drawn from 6-bit slices of ``xxhash64(key, seed_b)`` — folded into
   a bitmap RELATION ``(word_idx, word)`` via ``bit_or`` aggregation.
   One shuffle whose payload is two longs per key, output bounded by
   ``num_bits/64`` rows (= bitmap bytes/8, e.g. 64 Ki word rows for
   the default 2^22 bits) regardless of build cardinality.
2. **Probe** (``bloom_filter_rows``): the probe side computes the same
   (word_idx, mask) pair per row and checks it with a SINGLE broadcast
   hash join against the bitmap — all narrow stages: the probe side
   never shuffles, never leaves codegen. A row survives iff its whole
   mask is set in its word: ``word & mask == mask``.
3. **Verify** (``bloom_semi_join``): the surviving rows — true matches
   plus the Bloom's false positives — run through an EXACT left-semi
   join against the distinct build keys. Only survivors reach this
   shuffle: at 1% join selectivity that is a ~99% cut of the fact-side
   shuffle, the whole point of the operator. The final result is
   row-identical to the plain semi join (the bitmap is correctness-
   transparent; property-tested in ``tests/test_bloom.py``), so the
   cross-engine oracle is ordinary ``WHERE key IN (SELECT …)`` SQL.

False-positive arithmetic (document, don't guess): with ``n`` distinct
build keys, ``B = num_bits/64`` blocks, ``k = num_hashes``, a block
holding ``j`` keys has ≤ ``jk`` of 64 bits set, so FP(j) ≤ (jk/64)^k;
summed over the Poisson block load (λ = n/B) the default 2^22 bits,
k=3 holds FPs under ~1% to n ≈ 400k keys — a whisker above the classic
Bloom's bound at equal size (the block constraint costs a small
constant; Putze et al. §3). Size ``num_bits`` at roughly 10× the
expected distinct build keys and the verify join stays survivor-sized.
Oversubscribing (n ≫ num_bits) only costs pruning power, never
correctness.

Nulls: ``xxhash64(NULL, seed)`` is NULL, so null probe keys get a NULL
word_idx and drop out of the inner probe join — identical to equi-join
semantics (NULL never equals anything), keeping bloom_semi_join ≡
plain semi join even on dirty keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.relational import (
    TransformationError,
    _BaseTransformer,
)
from etl_spark_gradle_spark.plans.config import (
    TransformationConfig,
    ValidationResult,
)

__all__ = [
    "build_bloom",
    "bloom_filter_rows",
    "bloom_semi_join",
    "BloomSemiJoinTransformer",
]

DEFAULT_NUM_BITS = 1 << 22  # 4M bits = 512 KiB bitmap = 64Ki word rows
DEFAULT_NUM_HASHES = 3

_WORD_IDX = "__bloom_word_idx"
_WORD = "__bloom_word"

# independent xxhash64 seeds: block selector / in-block bit generator
_SEED_BLOCK = 0xB10C
_SEED_BITS = 0x5EED


def _check_params(num_bits: int, num_hashes: int) -> None:
    if num_bits < 64:
        raise TransformationError("bloom num_bits must be >= 64")
    if not 1 <= num_hashes <= 8:
        raise TransformationError("bloom num_hashes must be in 1..8")


def _block_idx(key_col: str, num_bits: int):
    """Word (block) index for a key; NULL keys propagate NULL (a
    guaranteed probe miss through the inner join)."""
    return F.pmod(
        F.xxhash64(F.col(key_col), F.lit(_SEED_BLOCK)), F.lit(num_bits // 64)
    ).cast("long")


def _block_mask(key_col: str, num_hashes: int):
    """In-block bit mask: ``num_hashes`` bits, each a 6-bit slice of a
    second xxhash64 (8 hashes consume 48 of its 64 bits). Pure SQL bit
    expressions — stays inside whole-stage codegen."""
    h = f"xxhash64(`{key_col}`, {_SEED_BITS})"
    parts = [
        f"shiftleft(CAST(1 AS BIGINT),"
        f" CAST((shiftright({h}, {6 * i}) & 63) AS INT))"
        for i in range(num_hashes)
    ]
    return F.expr(" | ".join(parts))


def build_bloom(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Fold ``df[key_col]``'s distinct values into a split-block Bloom
    bitmap relation ``(word_idx: long, word: long)``.

    Only words with at least one set bit are materialized (absent
    word_idx ⇒ all-zero word ⇒ probe miss), so the result is at most
    ``min(num_bits/64, |keys|)`` rows. ``shiftleft(1, 63)`` wraps
    negative — irrelevant, the words are opaque two's-complement bit
    buckets consumed only by ``&``.
    """
    _check_params(num_bits, num_hashes)
    if key_col not in df.columns:
        raise TransformationError(f"bloom key column not in schema: {key_col}")
    return (
        df.select(F.col(key_col))
        .where(F.col(key_col).isNotNull())
        .select(
            _block_idx(key_col, num_bits).alias(_WORD_IDX),
            _block_mask(key_col, num_hashes).alias("__mask"),
        )
        .groupBy(_WORD_IDX)
        .agg(F.bit_or("__mask").alias(_WORD))
    )


def bloom_filter_rows(
    probe: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep probe rows the bitmap MIGHT contain (true matches + false
    positives; null keys always dropped). ONE broadcast join, zero
    probe-side shuffle; schema is unchanged.

    The probe key's TYPE must match the build key's type —
    ``xxhash64`` hashes the binary representation, so ``int 5`` and
    ``bigint 5`` digest differently (``bloom_semi_join`` validates
    this; direct callers align types themselves). ``num_bits`` and
    ``num_hashes`` must equal the build-side parameters or probes
    address the wrong blocks/bits.
    """
    _check_params(num_bits, num_hashes)
    if key_col not in probe.columns:
        raise TransformationError(f"bloom key column not in schema: {key_col}")
    for c in (_WORD_IDX, _WORD, "__mask"):
        if c in probe.columns:
            raise TransformationError(
                f"column name '{c}' is reserved by bloom_filter_rows"
            )
    out_cols = [F.col(c) for c in probe.columns]
    return (
        probe.withColumn(_WORD_IDX, _block_idx(key_col, num_bits))
        .withColumn("__mask", _block_mask(key_col, num_hashes))
        .join(F.broadcast(bitmap), on=_WORD_IDX, how="inner")
        .where(F.col(_WORD).bitwiseAND(F.col("__mask")) == F.col("__mask"))
        .select(*out_cols)
    )


def bloom_semi_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str | None = None,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    exact: bool = True,
    materialize_bitmap: bool = False,
) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` appears in ``build[build_key]``
    — a left-semi join whose fact-side shuffle carries only Bloom
    survivors. With ``exact=False`` the verify join is skipped and the
    result is the raw Bloom superset (true matches + FPs): useful as a
    cheap pre-filter feeding a later exact stage, never as a final
    answer.

    ``materialize_bitmap`` (default OFF): the single-join block layout
    references the bitmap subtree exactly once, so the build side is
    scanned once per plan and there is nothing to reuse — the
    materialization the old multi-probe layout needed (collect +
    re-parallelize to stop ``num_hashes`` rebuild scans) is obsolete
    for the common case. Pass ``True`` only when the RETURNED frame
    will be executed several times (e.g. a bench harness re-collecting
    the same plan) and the build scan is expensive: the bitmap is then
    collected to the driver (≤ 2^26 bits ⇒ ≤ 8 MiB of (long, long)
    rows — crash-safe, a lost executor cannot strand it) and
    re-parallelized, or pinned with ``localCheckpoint`` above that
    cap.
    """
    build_key = build_key or fact_key
    if fact_key not in fact.columns:
        raise TransformationError(f"fact key not in schema: {fact_key}")
    if build_key not in build.columns:
        raise TransformationError(f"build key not in schema: {build_key}")
    f_type = dict(fact.dtypes)[fact_key]
    b_type = dict(build.dtypes)[build_key]
    if f_type != b_type:
        raise TransformationError(
            f"bloom_semi_join key types differ (fact {fact_key}: {f_type}, "
            f"build {build_key}: {b_type}) — xxhash64 digests the binary "
            "representation, so cast both sides to one type first"
        )
    keys = build.select(F.col(build_key).alias(fact_key)).where(
        F.col(fact_key).isNotNull()
    )
    bitmap = build_bloom(keys, fact_key, num_bits, num_hashes)
    if materialize_bitmap:
        if num_bits <= (1 << 26):
            spark = fact.sparkSession
            bitmap = spark.createDataFrame(bitmap.toPandas(), schema=bitmap.schema)
        else:
            bitmap = bitmap.localCheckpoint(eager=True)
    pruned = bloom_filter_rows(fact, fact_key, bitmap, num_bits, num_hashes)
    if not exact:
        return pruned
    return pruned.join(keys.distinct(), on=fact_key, how="left_semi")


class BloomSemiJoinTransformer(_BaseTransformer):
    """YAML type ``bloom_semi_join``: build side is a registered temp
    view (same convention as ``join``'s ``rightTable``)."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        if not opts.get("leftKey"):
            errors.append("bloom_semi_join requires 'leftKey'")
        elif opts["leftKey"] not in df.columns:
            errors.append(f"leftKey not in input schema: {opts['leftKey']}")
        if not opts.get("rightTable"):
            errors.append("bloom_semi_join requires 'rightTable'")
        try:
            _check_params(
                int(opts.get("numBits", DEFAULT_NUM_BITS)),
                int(opts.get("numHashes", DEFAULT_NUM_HASHES)),
            )
        except (TransformationError, ValueError) as exc:
            errors.append(str(exc))
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        build = ctx.spark.table(opts["rightTable"])
        return bloom_semi_join(
            df,
            build,
            fact_key=opts["leftKey"],
            build_key=opts.get("rightKey") or opts["leftKey"],
            num_bits=int(opts.get("numBits", DEFAULT_NUM_BITS)),
            num_hashes=int(opts.get("numHashes", DEFAULT_NUM_HASHES)),
            exact=str(opts.get("exact", "true")).lower() != "false",
        )
