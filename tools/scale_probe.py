"""Empirical scaling probe: run key operators at sf0.001 / sf0.01 / sf0.1
and report steady-state throughput (rows/s) at each size. Linear
operators hold or improve their throughput as input grows 100x (fixed
costs amortize); a super-linear operator would show throughput decaying
with scale — the early-warning signal for something that won't survive
the next 100x to the 100 TB design point.

Round 4 adds a SKEW section (the classic 100x killer the uniform
testdata can't show): a 10M-row events table whose hottest key carries
50% of all rows, probed three ways with results compared for equality:

1. asof_join unsalted vs salt_buckets=8 — the window sort serializes
   the hot key in ONE task (AQE cannot split a window partition), so
   salting must WIN wall-clock here, and does (measured ~1.5x on
   local[32]; grows with hot-partition size — 2.2x at 20M rows).
   The action hash-sums the attached payload: a bare count() lets
   Catalyst prune the Window node entirely and the timings become
   fiction (measured 0.44s "sort" of 10M rows before forcing).
2. plain algebraic aggregation vs salted_aggregate — plain WINS
   (measured ~2x at 10M rows): map-side partial aggregation already
   collapses the hot key per task, so plain hash aggregation with
   algebraic functions is skew-immune BY DESIGN; salting buys nothing
   here and pays a second shuffle phase. The probe pins that claim and
   bounds the salted path's overhead (<=3x) instead of pretending a
   straggler exists — salted_aggregate is for the regimes where the
   hot key's PARTIAL STATE itself is too big per task, not for
   algebraic sums.
3. count_distinct plain vs value-hash salted two-phase — Spark's
   Expand-based distinct rewrite already spreads the hot key's distinct
   state; recorded to document that the native plan survives.

Usage: python tools/scale_probe.py [--skip-skew] [--skip-incremental] [--skip-bloom] [--skip-rollup]
Prints one line per (operator, sf) plus the incremental-economics and
skew sections; exit 1 if any 10x throughput step drops below 0.8x, the
incremental exact-dedup path fails to beat a full corpus rerun >=2x,
the salted asof fails to beat unsalted by >=1.2x, any salted/unsalted
result pair differs, or salted-agg overhead exceeds 3x. The
incremental section generates (once, cached in /tmp) an 8 GB synthetic
corpus.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SKEW_DIR = "/tmp/spark_graft_scale_probe"

SF_DIRS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]


def main() -> int:
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators import dedup as dd
    from etl_spark_gradle_spark.operators import lm
    from etl_spark_gradle_spark.operators import sketch as sk
    from etl_spark_gradle_spark.operators import text as tx
    from etl_spark_gradle_spark.session import get_spark

    spark = get_spark(app_name="scale-probe", master="local[32]",
                      conf={"spark.sql.shuffle.partitions": "32",
                            # skew section sorts a 5M-row hot partition in
                            # one task; default 1g heap OOMs the distinct
                            # Expand plan at 10M rows
                            "spark.driver.memory": "8g"})

    def probes(sf_dir: str):
        from etl_spark_gradle_spark import tpch

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(ev.dtypes)["ts"] == "bigint":
            ev = ev.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        else:
            ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
        return {
            "tpch_star": (
                lambda: tpch.q5(spark, sf_dir),
                li.count(),
            ),
            "bm25": (
                lambda: _bm25_probe(docs),
                docs.count(),
            ),
            "exact_dedup": (
                lambda: dd.exact_dedup(docs, content_col="text", tiebreak_col="doc_id"),
                docs.count(),
            ),
            "minhash_lsh": (
                lambda: dd.minhash_lsh_candidates(
                    docs, id_col="doc_id", text_col="text", n=3, num_hashes=64, bands=16
                ),
                docs.count(),
            ),
            "text_stats": (
                lambda: tx.with_text_stats(docs, "text"),
                docs.count(),
            ),
            "clean_text": (
                lambda: tx.with_clean_text(docs, "text"),
                docs.count(),
            ),
            "histogram": (
                lambda: sk.build_histogram_sketch(
                    li, ["l_returnflag"], "l_quantity", 0.0, 60.0, bins=32
                ),
                li.count(),
            ),
            "scan_agg": (
                lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
                    F.sum("l_quantity"), F.count(F.lit(1))
                ),
                li.count(),
            ),
            "lm_score": (
                lambda: lm.score_with_bigram_lm(
                    docs, lm.train_bigram_lm(docs, "text"), id_col="doc_id"
                ),
                docs.count(),
            ),
            "table_diff": (
                lambda: _diff_probe(li),
                li.count(),
            ),
            "bpe": (
                lambda: _bpe_probe(docs),
                docs.count(),
            ),
            "resample": (
                lambda: _resample_probe(ev),
                ev.count(),
            ),
            "pmi": (
                lambda: _pmi_probe(docs),
                docs.count(),
            ),
            "ks_drift": (
                lambda: _ks_probe(ev),
                ev.count(),
            ),
            "intervals": (
                lambda: _intervals_probe(ev),
                ev.count(),
            ),
            "quantiles": (
                lambda: _quantiles_probe(li),
                li.count(),
            ),
            "auc": (
                lambda: _auc_probe(li),
                li.count(),
            ),
            "auc_continuous": (
                lambda: _auc_continuous_probe(li),
                li.count(),
            ),
            "ad_wass_drift": (
                lambda: _ad_wass_probe(li),
                li.count(),
            ),
            "ewma": (
                lambda: _ewma_probe(li),
                li.count(),
            ),
            "pettitt": (
                lambda: _pettitt_probe(li),
                li.count(),
            ),
            "bootstrap_ci": (
                lambda: _bootstrap_probe(li),
                li.count(),
            ),
            "rolling_med": (
                lambda: _rolling_median_probe(ev),
                ev.count(),
            ),
        }

    # warm python workers + codegen families once
    for build, _ in probes(SF_DIRS[0][1]).values():
        build().count()

    rates: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in SF_DIRS:
        for op, (build, n_rows) in probes(sf_dir).items():
            df = build()
            df.count()  # plan/codegen warm for THIS size
            best = min(
                (lambda t0: (df.count(), time.perf_counter() - t0))(time.perf_counter())[1]
                for _ in range(3)
            )
            rate = n_rows / best
            rates.setdefault(op, {})[sf_name] = rate
            print(f"{op:12s} {sf_name:7s} rows={n_rows:>8d} best={best:6.3f}s "
                  f"rate={rate:>12,.0f} rows/s", flush=True)

    print("\nscaling verdict (throughput at sf0.1 vs sf0.01 — >=0.8 means the")
    print("operator amortizes rather than degrades across a 10x size step):")
    worst = 1e9
    for op, r in rates.items():
        ratio = r["sf0.1"] / r["sf0.01"]
        worst = min(worst, ratio)
        print(f"  {op:12s} x{ratio:5.2f}")
    print(f"worst ratio: {worst:.2f}")
    linear_ok = worst >= 0.8

    incr_ok = True
    if "--skip-incremental" not in sys.argv:
        incr_ok = incremental_probe(spark)

    skew_ok = True
    if "--skip-skew" not in sys.argv:
        skew_ok = skew_probe(spark)

    bloom_ok = True
    if "--skip-bloom" not in sys.argv:
        bloom_ok = bloom_probe(spark)

    rollup_ok = True
    if "--skip-rollup" not in sys.argv:
        rollup_ok = rollup_probe(spark)
    return 0 if (linear_ok and incr_ok and skew_ok and bloom_ok and rollup_ok) else 1


def rollup_probe(spark) -> bool:
    """time_rollup economics: the hierarchical plan (raw scanned once,
    coarser levels re-aggregate the pinned finer bucket table) must
    beat L direct groupBys over the raw data, with IDENTICAL results.
    10M synthetic events (reuses the skew table's shape), 4 levels —
    the deeper the hierarchy, the bigger the claimed saving, so assert
    the hierarchy is at least not SLOWER (>= 0.9x) and report the
    measured ratio; results compared value-for-value."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.timeseries import time_rollup

    n = 10_000_000
    ev = (
        spark.range(n)
        .select(
            (F.col("id") % 8).cast("string").alias("g"),
            F.timestamp_micros(
                F.lit(1700000000) * 1_000_000 + (F.col("id") * 37) % (90 * 86400) * 1_000_000
            ).alias("ts"),
            (F.pmod(F.col("id") * 7919, F.lit(10000)) / 100.0).alias("v"),
        )
    )
    ev.write.mode("overwrite").parquet(f"{SKEW_DIR}/rollup_events")
    ev = spark.read.parquet(f"{SKEW_DIR}/rollup_events")
    levels = [3600, 21600, 86400, 7 * 86400]

    def force(df):
        return tuple(
            df.agg(
                F.sum(F.xxhash64("g", "level_seconds", "bucket_ts", "value_cnt")).alias("h"),
                F.sum(F.hash("value_sum")).alias("hs"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
        )

    def hierarchical():
        return force(time_rollup(ev, "ts", ["v"], levels=levels, group_by=["g"])
                     .withColumnRenamed("v_cnt", "value_cnt")
                     .withColumnRenamed("v_sum", "value_sum"))

    def direct():
        frames = []
        for step in levels:
            sec = F.unix_timestamp("ts")
            b = (sec - F.pmod(sec, F.lit(step))).alias("bucket_ts")
            frames.append(
                ev.groupBy("g", b)
                .agg(
                    F.count("v").cast("long").alias("value_cnt"),
                    F.sum(F.col("v").cast("decimal(38,6)"))
                    .cast("decimal(38,6)").cast("string").cast("double")
                    .alias("value_sum"),
                )
                .withColumn("level_seconds", F.lit(step).cast("long"))
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return force(out)

    # warm both, then best-of-2 each
    h_r = hierarchical()
    d_r = direct()
    best_h = best_d = 1e18
    for _ in range(2):
        t0 = time.perf_counter()
        h_r = hierarchical()
        best_h = min(best_h, time.perf_counter() - t0)
        t0 = time.perf_counter()
        d_r = direct()
        best_d = min(best_d, time.perf_counter() - t0)
    same = h_r == d_r
    ratio = best_d / best_h
    print(
        chr(10)
        + f"rollup probe   hierarchical={best_h:6.3f}s direct-{len(levels)}-"
        f"scans={best_d:6.3f}s speedup=x{ratio:4.2f} identical={same}"
    )
    if not same:
        print("FAIL rollup: hierarchical result != direct per-level groupBys")
        return False
    if ratio < 0.9:
        print("FAIL rollup: hierarchy slower than 0.9x the L-scan plan")
        return False
    return True


def _resample_probe(ev):
    """Per-user hourly grid with linear fill; forced through a hash-sum
    aggregate — a bare count() would let Catalyst prune the fill
    Window nodes (same rule as the skew asof probe)."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.timeseries import resample
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    grid = resample(
        ev,
        time_col="ts",
        step_seconds=3600,
        aggregations=[AggregateExpr("value", "avg", "avg_value")],
        group_by=["user_id"],
        fill="linear",
    )
    return grid.agg(
        F.sum(F.xxhash64(F.col("avg_value"), F.col("n_obs"))).alias("h")
    )


def _rolling_median_probe(ev):
    """Per-user trailing rolling median + p90 over the last 25 events;
    forced through a hash-sum aggregate (a bare count() would prune
    the sorted-window projection entirely)."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.timeseries import rolling_median

    out = rolling_median(
        ev, ["user_id"], "ts", "value", 25,
        out_col="rm", tiebreak=["event_id"],
    )
    out = rolling_median(
        out, ["user_id"], "ts", "value", 25,
        out_col="rq", tiebreak=["event_id"], prob=0.9,
    )
    return out.agg(
        F.sum(
            F.xxhash64((F.col("rm") * 1000000).cast("long"),
                       (F.col("rq") * 1000000).cast("long"))
        ).alias("h")
    )


def _pmi_probe(docs):
    from etl_spark_gradle_spark.operators.collocations import pmi_bigrams

    return pmi_bigrams(docs, "text", min_count=2, top_k=100)


def _ks_probe(ev):
    from etl_spark_gradle_spark.operators.stats import ks_drift

    return ks_drift(
        ev.where("event_type = 'click'"),
        ev.where("event_type = 'purchase'"),
        "value",
    )


def _intervals_probe(ev):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.timeseries import merge_intervals

    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.expr(
            "timestampadd(MINUTE, CAST(30 + pmod(event_id, 90) AS INT), ts)"
        ).alias("e"),
    )
    return merge_intervals(iv, "s", "e", group_by=["user_id"])


def _auc_probe(li):
    """Round-9 evaluation family: exact AUC throughput. Score
    cardinality is FIXED (l_quantity: 50 distinct), so the rank window
    input stays constant while raw rows grow 10x — the probe verifies
    the map-side distinct-score reduction holds (throughput should not
    degrade with size). The hash-sum close forces the auc column
    (under a bare count() Catalyst prunes the rank window and the
    timing is fiction — the repo-wide window-benchmark rule)."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.evaluation import auc

    out = auc(
        li.select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("score"),
            (F.col("l_linestatus") == "F").cast("int").alias("label"),
        ),
        "score",
        "label",
        group_by=["l_returnflag"],
    )
    return out.agg(F.sum(F.hash("l_returnflag", "auc", "n")).alias("h"))


def _auc_continuous_probe(li):
    """VERDICT r9 ask #2: the fixed-cardinality `auc` probe is exactly
    why the ungrouped single-partition window slipped through — its
    distinct-score table never grew. This probe is the adversarial
    complement: UNGROUPED auc over a CONTINUOUS synthetic score
    (near-unique per row), so the distinct-score table is O(n) and the
    cumulative prefix sum MUST be distributed (stats._prefix_sums) for
    throughput to hold as rows grow 100x."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.evaluation import auc

    scored = li.select(
        # hash-derived double: near-unique, deterministic
        (
            F.abs(F.hash("l_orderkey", "l_linenumber")).cast("double")
            / F.lit(2147483647.0)
        ).alias("score"),
        (F.col("l_linestatus") == "F").cast("int").alias("label"),
    )
    out = auc(scored, "score", "label")
    return out.agg(F.sum(F.hash("auc", "n")).alias("h"))


def _ad_wass_probe(li):
    """Round-11 continuation: the two newest prefix-sum drift members
    (anderson_darling + wasserstein) over a CONTINUOUS near-unique
    synthetic value — the pooled histogram is O(n), so throughput
    only holds across the 10x step if the cumulative counts ride the
    distributed two-level scan and (for W1) the value-gap lead stays
    _pid-partitioned. Both statistics fold into one hash so the probe
    runs a single job per size."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.stats import (
        anderson_darling_drift,
        wasserstein_drift,
    )

    scored = li.select(
        (
            F.abs(F.hash("l_orderkey", "l_linenumber")).cast("double")
            / F.lit(2147483647.0)
        ).alias("v"),
        (F.col("l_linestatus") == "F").alias("is_a"),
    )
    a = scored.where("is_a").select("v")
    b = scored.where("NOT is_a").select("v")
    ad = anderson_darling_drift(a, b, "v").select(
        F.hash("a2", "n_values").alias("h")
    )
    w1 = wasserstein_drift(a, b, "v").select(
        F.hash("w1", "n_values").alias("h")
    )
    return ad.unionByName(w1).agg(F.sum("h").alias("h"))


def _pettitt_probe(li):
    """Round-11 late: the changepoint test's two chained prefix-sum
    scans over a CONTINUOUS near-unique value (worst case for both
    histograms: the value-rank map AND the per-distinct-time table
    are O(n)). Throughput across the 10x step only holds if both
    scans stay two-level and the rank join shuffles on the value key
    — a single-partition window anywhere would crater it."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.stats import pettitt_test

    src = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("t"),
        (
            F.abs(F.hash("l_orderkey", "l_linenumber")).cast("double")
            / F.lit(2147483647.0)
        ).alias("v"),
    )
    out = pettitt_test(src, "t", "v")
    return out.select(F.hash("k_num", "change_at").alias("h"))


def _bootstrap_probe(li):
    """Round-11 late: the one-pass Poisson bootstrap — 2B+2 agg
    columns with B/4 md5 calls per row. The whole point is NO data×B
    explosion, so throughput must IMPROVE across the 10x step like
    every other single-aggregation shape (a hidden explode/resample
    would show the B× cliff immediately)."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.stats import bootstrap_ci

    src = li.select(
        F.col("l_extendedprice").alias("v"),
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        ).alias("rid"),
    )
    out = bootstrap_ci(src, "v", "rid", replicates=40)
    return out.select(F.hash("estimate", "ci_lo", "ci_hi").alias("h"))


def _ewma_probe(li):
    """Round-11: the applyInPandas sequential-recursion operator. Keys
    (l_partkey) grow with SF while per-key series length stays ~O(30),
    so the Arrow exchange + per-key python fold must amortize across a
    10x size step — the probe that would catch a driver-side collect
    or a single-task funnel hiding in the grouped-map path."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.timeseries import ewma

    src = li.select(
        "l_partkey",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("seq"),
        F.col("l_extendedprice").alias("price"),
    )
    out = ewma(src, ["l_partkey"], "seq", "price", alpha=0.3,
               output_col="sm")
    return out.agg(F.sum(F.hash("l_partkey", "seq", "sm")).alias("h"))


def _quantiles_probe(li):
    from etl_spark_gradle_spark.operators.stats import exact_quantiles

    return exact_quantiles(
        li, "l_extendedprice", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    )


def _diff_probe(li):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.delta import table_diff

    keyed = li.withColumn("__k", F.concat_ws("|", "l_orderkey", "l_linenumber"))
    prev = keyed.filter("l_orderkey % 5 != 0")
    cur = keyed.filter("l_orderkey % 3 != 0")
    return table_diff(cur, prev, keys=["__k"])


def _bpe_probe(docs):
    from etl_spark_gradle_spark.operators.bpe import bpe_tokenize, train_bpe

    model = train_bpe(docs, "text", num_merges=40)
    return bpe_tokenize(docs, "doc_id", "text", model["merges"])


def incremental_probe(spark) -> bool:
    """The incremental-dedup economics claim, MEASURED at a size where
    the asymptotic term dominates fixed costs: a generated corpus of
    4M ~2KB documents (8 GB of text) plus a 100k-doc daily
    batch. Full rerun = exact_dedup over all 4.1M texts (re-read,
    re-normalize, re-hash 8 GB); incremental = hash the 100k batch and
    probe the persisted 32-byte-per-doc
    content-hash store (store scanned once, never shuffled, corpus
    text never re-read). The increment must win >= 2x — that ratio is
    the whole reason the store-backed path exists, and it GROWS with
    corpus size (the full rerun is O(corpus), the increment O(batch +
    store scan)) — measured x1.78 at a 2M-doc corpus and x2.70 at 4M
    with the increment wall-clock FLAT (~3.1 s both times), i.e. the
    increment cost is independent of corpus size exactly as designed. Minhash candidates probed the same way at sf0.1
    documents (reported; fixed Arrow costs still dominate there)."""
    import os

    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators import dedup as dd

    corpus_path = os.path.join(SKEW_DIR, "incr_corpus_v4")
    batch_path = os.path.join(SKEW_DIR, "incr_batch_v4")
    # both _SUCCESS markers, not just the directory: a run killed
    # mid-generation must regenerate, not read a partial dataset
    if not (os.path.exists(os.path.join(corpus_path, "_SUCCESS"))
            and os.path.exists(os.path.join(batch_path, "_SUCCESS"))):
        # ~2 KB texts: document-shaped bytes. The full rerun has to
        # re-read and re-hash all of them; the increment reads only
        # the 32-byte hash store.
        filler = F.repeat(F.lit("repeated filler sentence for crawl body "), 50)
        text = F.concat(F.lit("corpus doc "), F.col("id").cast("string"),
                        F.lit(" "), filler)
        spark.range(0, 4_000_000).select(
            F.col("id").alias("doc_id"), text.alias("text")
        ).repartition(32).write.mode("overwrite").parquet(corpus_path)
        # 10% of the batch duplicates corpus docs, 90% is new
        spark.range(4_000_000, 4_100_000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 == 0,
                   F.concat(F.lit("corpus doc "),
                            (F.col("id") % 4_000_000).cast("string"),
                            F.lit(" "), filler))
             .otherwise(F.concat(F.lit("fresh batch doc "),
                                 F.col("id").cast("string"),
                                 F.lit(" "), filler)).alias("text"),
        ).repartition(8).write.mode("overwrite").parquet(batch_path)

    corpus = spark.read.parquet(corpus_path)
    batch = spark.read.parquet(batch_path)
    full = corpus.unionByName(batch)
    seen = dd.content_hash_store(corpus, "text").localCheckpoint(eager=True)

    def best_of(fn, n=3):
        fn()
        return min(
            (lambda t0: (fn(), time.perf_counter() - t0))(time.perf_counter())[1]
            for _ in range(n)
        )

    t_full = best_of(
        lambda: dd.exact_dedup(full, content_col="text", tiebreak_col="doc_id").count()
    )
    t_incr = best_of(
        lambda: dd.exact_dedup_incremental(
            batch, seen, content_col="text", tiebreak_col="doc_id"
        ).count()
    )
    r_exact = t_full / max(t_incr, 1e-9)

    docs = spark.read.parquet(f"{dict(SF_DIRS)['sf0.1']}/documents.parquet")
    mh_corpus = docs.filter("doc_id % 10 != 0")
    mh_batch = docs.filter("doc_id % 10 = 0")
    band_store = dd.minhash_band_store(
        mh_corpus, "doc_id", "text", n=3, num_hashes=64, bands=16
    ).localCheckpoint(eager=True)
    t_full_mh = best_of(
        lambda: dd.minhash_lsh_candidates(
            docs, id_col="doc_id", text_col="text", n=3, num_hashes=64, bands=16
        ).count()
    )
    t_incr_mh = best_of(
        lambda: dd.incremental_minhash_candidates(
            mh_batch, band_store, "doc_id", "text", n=3, num_hashes=64, bands=16
        ).count()
    )
    r_mh = t_full_mh / max(t_incr_mh, 1e-9)
    print("\nincremental economics (100k batch vs full corpus rerun):")
    print(f"  exact dedup (4M x 2KB):  full={t_full:.3f}s incr={t_incr:.3f}s -> x{r_exact:.2f}")
    print(f"  minhash cands (sf0.1):   full={t_full_mh:.3f}s incr={t_incr_mh:.3f}s -> x{r_mh:.2f}")

    # ANN index economics: building the IVF assignment per search vs
    # probing a prebuilt index (the build-once path every repeated
    # search workload should take)
    from pyspark.sql import functions as F2

    from etl_spark_gradle_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{dict(SF_DIRS)['sf0.1']}/embeddings.parquet")
    qs = emb.filter("vec_id < 20").select(
        F2.col("vec_id").alias("query_id"), F2.col("embedding").alias("query_vec")
    )
    assignments, cents = sim.build_ivf_index(emb, num_cells=16)
    prebuilt = assignments.localCheckpoint(eager=True)
    t_scratch = best_of(lambda: sim.ivf_topk(emb, qs, k=10, num_cells=16, nprobe=4).count())
    t_index = best_of(lambda: sim.ivf_search(prebuilt, cents, qs, k=10, nprobe=4).count())
    r_ann = t_scratch / max(t_index, 1e-9)
    print(f"  ivf search (sf0.1):      rebuild={t_scratch:.3f}s prebuilt={t_index:.3f}s -> x{r_ann:.2f}")

    ok = r_exact >= 2.0 and r_ann >= 1.2
    if not ok:
        print("  FAIL: incremental/index paths did not beat rebuilds "
              "(need exact >=2x, ivf prebuilt >=1.2x)")
    return ok


def _bm25_probe(docs):
    from etl_spark_gradle_spark.operators import retrieval as rt

    return rt.bm25_scores(docs, "doc_id", "text", ["the", "data", "model"])


def skew_probe(spark) -> bool:
    """Hot-key probe: 10M rows, hottest key = 50% of the table (see
    module docstring for why each assertion is shaped the way it is)."""
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.relational import (
        aggregate,
        asof_join,
        salted_aggregate,
    )
    from etl_spark_gradle_spark.plans.config import AggregateExpr

    n = 10_000_000
    # deterministic zipf-ish skew: key 0 holds 50%, remainder spreads
    # over ~10k keys via a Knuth-multiplicative scatter
    ev = (
        spark.range(n)
        .withColumn(
            "k",
            F.when(F.col("id") % 10 < 5, F.lit(0)).otherwise(
                F.pmod(F.col("id") * F.lit(2654435761), F.lit(10000))
            ),
        )
        .withColumn("v", F.pmod(F.col("id") * F.lit(7919), F.lit(1_000_000)))
        .withColumn(
            "ts",
            F.timestamp_micros(F.lit(1700000000) * 1_000_000 + F.col("id") * 1000),
        )
    )
    ev.write.mode("overwrite").parquet(f"{SKEW_DIR}/events")
    ev = spark.read.parquet(f"{SKEW_DIR}/events")
    right = (
        spark.range(100_000)
        .withColumn(
            "k",
            F.when(F.col("id") % 10 < 5, F.lit(0)).otherwise(
                F.pmod(F.col("id") * F.lit(2654435761), F.lit(10000))
            ),
        )
        .withColumn(
            "rts",
            F.timestamp_micros(F.lit(1700000000) * 1_000_000 + F.col("id") * 100000),
        )
        .withColumn("rv", (F.col("id") % 31).cast("double"))
        .select("k", "rts", "rv")
    )
    right.write.mode("overwrite").parquet(f"{SKEW_DIR}/right")
    right = spark.read.parquet(f"{SKEW_DIR}/right")

    def force(df, cols):
        # hash-sum every probe column so Catalyst cannot prune the
        # operator under test out of the plan
        return tuple(
            df.agg(
                *[F.sum(F.hash(c)).alias(f"h_{c}") for c in cols],
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
        )

    def timed(build, cols, runs=2):
        force(build(), cols)  # warm
        best, out = 1e18, None
        for _ in range(runs):
            t0 = time.perf_counter()
            out = force(build(), cols)
            best = min(best, time.perf_counter() - t0)
        return best, out

    ok = True

    # 1. asof: window sort serializes the hot key -> salting must win
    un_t, un_r = timed(
        lambda: asof_join(ev, right, "k", "k", "ts", "rts", ["rv"]), ["rv"]
    )
    sa_t, sa_r = timed(
        lambda: asof_join(ev, right, "k", "k", "ts", "rts", ["rv"], salt_buckets=8),
        ["rv"],
    )
    speedup = un_t / sa_t
    same = un_r == sa_r
    print(
        f"\nskew asof      unsalted={un_t:6.3f}s salted8={sa_t:6.3f}s "
        f"speedup=x{speedup:4.2f} identical={same}"
    )
    if speedup < 1.2 or not same:
        print("FAIL skew asof: salted path must win >=1.2x with identical results")
        ok = False

    # 2. algebraic agg: partial agg makes the plain plan skew-immune;
    # salting must stay within 1.5x (bounded overhead) and agree
    aggs = [
        AggregateExpr("v", "sum", "s"),
        AggregateExpr("v", "avg", "a"),
        AggregateExpr("*", "count", "c"),
    ]
    pl_t, pl_r = timed(lambda: aggregate(ev, ["k"], aggs), ["s", "a", "c"])
    sg_t, sg_r = timed(
        lambda: salted_aggregate(ev, ["k"], aggs, salt_buckets=32), ["s", "a", "c"]
    )
    same = pl_r == sg_r
    print(
        f"skew agg       plain={pl_t:6.3f}s salted32={sg_t:6.3f}s "
        f"ratio=x{sg_t / pl_t:4.2f} identical={same} "
        f"(plain partial-agg is skew-immune for algebraic fns — by design)"
    )
    if sg_t > 3.0 * pl_t or not same:
        print("FAIL skew agg: salted overhead must stay <=3x with identical results")
        ok = False

    # 3. count_distinct: Spark's Expand rewrite vs explicit value-hash
    # two-phase — recorded to pin that the native plan survives skew
    # (4M-row slice: the distinct state is per-VALUE, so this probe's
    # memory footprint is rows x distinct-values, much fatter than the
    # algebraic probes at equal row count)
    evd = ev.filter(F.col("id") < 4_000_000)
    cd_t, cd_r = timed(
        lambda: evd.groupBy("k").agg(F.countDistinct("v").alias("d")), ["d"]
    )

    def salted_cd():
        s = evd.withColumn("__vsalt", F.pmod(F.xxhash64("v"), F.lit(32)))
        p1 = s.groupBy("k", "__vsalt").agg(F.countDistinct("v").alias("pd"))
        return p1.groupBy("k").agg(F.sum("pd").alias("d"))

    vs_t, vs_r = timed(salted_cd, ["d"])
    same = cd_r == vs_r
    print(
        f"skew distinct  native={cd_t:6.3f}s value-salted={vs_t:6.3f}s "
        f"ratio=x{vs_t / cd_t:4.2f} identical={same} "
        f"(Expand-based distinct rewrite spreads hot-key state natively)"
    )
    if not same:
        print("FAIL skew distinct: value-hash salted distinct must match native")
        ok = False

    # 4. fact⋈dim equi-join under the same 50%-hot key, dim forced past
    # the broadcast threshold (the 100-TB shape: dims routinely exceed
    # it). Three variants, all row-identical:
    #   a) plain join, AQE skew split ON  — Spark's native post-shuffle
    #      fix for sort-merge plans (the baseline a user gets for free)
    #   b) plain join, AQE skew split OFF — the unprotected plan
    #      (stands in for the strategies AQE cannot re-split)
    #   c) skew_join salted, AQE split OFF — the explicit operator must
    #      recover (b)'s loss: >= 1.15x over (b), overhead vs (a) <= 2x
    from etl_spark_gradle_spark.operators.skew import skew_join

    dim = (
        spark.range(10_000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("dv"),
        )
    )
    dim.write.mode("overwrite").parquet(f"{SKEW_DIR}/dim")
    dim = spark.read.parquet(f"{SKEW_DIR}/dim")
    bcast0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    aqe_skew0 = spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        aqe_t, aqe_r = timed(lambda: ev.join(dim, on=["k"]), ["v", "dv"])
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        pl_t, pl_r = timed(lambda: ev.join(dim, on=["k"]), ["v", "dv"])
        # hot set frozen explicitly: the probe measures the join, not
        # the (one-off, map-side-combined) detection aggregation
        sj_t, sj_r = timed(
            lambda: skew_join(ev, dim, on=["k"], hot_keys=[0], salt_buckets=8),
            ["v", "dv"],
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast0)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew0)
    same = aqe_r == pl_r == sj_r
    print(
        f"skew join      aqe-split={aqe_t:6.3f}s unprotected={pl_t:6.3f}s "
        f"salted8={sj_t:6.3f}s recover=x{pl_t / sj_t:4.2f} "
        f"vs-aqe=x{sj_t / aqe_t:4.2f} identical={same}"
    )
    if not same:
        print("FAIL skew join: salted join must be row-identical to plain")
        ok = False
    if pl_t / sj_t < 1.15 and sj_t > aqe_t * 2.0:
        print(
            "FAIL skew join: salted path must beat the unprotected plan "
            "(>=1.15x) or stay within 2x of the AQE-split baseline"
        )
        ok = False
    return ok


def bloom_probe(spark) -> bool:
    """Bloom-prune economics in the forced-shuffle regime (round 5):
    with autoBroadcastJoinThreshold=-1 the plain left-semi join must
    sort-merge the FULL fact side — the 100 TB shape where the build
    side's rows don't fit a broadcast. bloom_semi_join's bitmap probes
    stay broadcast by construction (explicit hint), so only Bloom
    survivors reach its verify shuffle. On a ~1.4%-selective build the
    probe measures the wall-clock effect of that fact-shuffle cut and
    asserts (a) result parity with the plain join and (b) the bloom
    path is not slower than 1.3x plain per invocation. Honest local
    numbers (quiet local[32], sf1, full-width rows): per-invocation
    ~0.9x plain — a single-JVM shuffle moves memory, not network, so
    the avoided cost is minimized HERE by construction, and the bitmap
    build+checkpoint (~0.25 s, proportional to the small build side)
    eats the rest; steady-state exec on a pre-built plan measured
    0.46 s vs 0.66 s (1.4x win). The cluster economics scale the win,
    not the overhead: savings grow with fact bytes x network cost,
    the bitmap cost stays build-side-proportional."""
    import os
    import time

    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.bloom import bloom_semi_join

    sf_dir = "/root/repo/testdata_sf1"
    if not os.path.isdir(sf_dir):
        sf_dir = "/root/testdata/sf0.1"
    # FULL-width fact rows: the economics being probed is "prune before
    # shuffling wide payloads" — hashing every column in the closing
    # aggregate stops Catalyst pruning the payload out of the shuffle
    # (with a 2-column hash the scan narrows to 2 columns and the probe
    # would time a toy shuffle no 100 TB pipeline ships)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        "o_orderpriority = '1-URGENT' AND o_totalprice > 350000"
    )
    n_fact = li.count()
    n_build = od.count()
    fact_cols = li.columns

    def force(df):
        return tuple(
            df.agg(
                F.sum(F.xxhash64(*fact_cols)).alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
        )

    def timed(build, runs=3):
        res = force(build())  # warm (plan + IO cache)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            r = force(build())
            best = min(best, time.perf_counter() - t0)
            assert r == res
        return res, best

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        keys = od.select(F.col("o_orderkey").alias("l_orderkey")).distinct()
        r_plain, t_plain = timed(lambda: li.join(keys, "l_orderkey", "left_semi"))
        r_bloom, t_bloom = timed(
            lambda: bloom_semi_join(li, od, "l_orderkey", "o_orderkey")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    survivors = r_bloom[1]
    print(
        f"bloom probe [{sf_dir}]: fact={n_fact} build={n_build} "
        f"survivors={survivors} ({survivors / n_fact:.1%}) | "
        f"plain-SMJ best {t_plain:.2f}s vs bloom {t_bloom:.2f}s "
        f"(x{t_plain / t_bloom:.2f})"
    )
    parity = r_plain == r_bloom
    fast_enough = t_bloom <= 1.3 * t_plain
    if not parity:
        print("  FAIL: bloom result differs from plain semi join")
    if not fast_enough:
        print("  FAIL: bloom path slower than 1.3x the plain join")
    return parity and fast_enough


if __name__ == "__main__":
    raise SystemExit(main())
