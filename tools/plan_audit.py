"""Physical-plan audit: assert the scale-critical properties of the
headline queries (predicate pushdown, column pruning, broadcast joins,
WindowGroupLimit top-k, partial aggregation, codegen coverage).

Usage: python tools/plan_audit.py [sf_dir]
Prints PASS/FAIL per assertion; exit 1 on any FAIL.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def unpartitioned_window_count(df) -> int:
    """Number of Window nodes with an EMPTY partition spec in the
    optimized logical plan. Each one plans as a single-partition
    WindowExec — the whole frame funnels through ONE task, the scale
    cliff that hit ecdf (r6), lift_table v1 (r9) and ungrouped auc
    (r9). Parsed from the plan's JSON form, not the explain string
    (the formatted text is ambiguous about empty partition specs)."""
    import json

    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    return sum(
        1
        for nd in nodes
        if nd.get("class", "").endswith(".Window")
        and not nd.get("partitionSpec")
    )


# Queries ALLOWED to plan N unpartitioned Window NODES because each
# such node provably runs on a BOUNDED frame (size independent of
# data scale) — the only legitimate use. Everything else must have
# ZERO. Counts are optimized-plan node counts: a bounded subtree
# referenced from k branches appears k times (Spark does not dedupe
# logical subtrees), so the number encodes plan shape too — a count
# increase means either a NEW unpartitioned window (audit it) or a
# new reference to a bounded lineage (cheap, but worth knowing).
# Bounded classes in this repo:
#   [PS] stats._prefix_sums offsets: Window.orderBy(_pid) over the
#        <=P-row per-bucket totals table (P = shuffle partitions);
#   [LT] lift_table bucket close: cumulative/total windows over the
#        <=B-row bucket table (B = ntile count, default 10);
#   [CT] category-cell tables: mutual_information's marginal windows
#        over the |X|x|Y| joint-cell table;
#   [BK] negative_sample's dense-bucket index: row_number over the
#        per-frequency-bucket size table (<= #buckets rows);
#   [WK] weekly_trend's lag over the per-WEEK count table (bounded by
#        calendar span / 7);
#   [SL] theil_sen's weighted-median CDF over the pairwise-slope
#        table (<= cells² rows under the operator's bounded-
#        cardinality contract).
# Update ONLY with a boundedness argument in the comment.
BOUNDED_WINDOW_EXEMPT: dict[str, int] = {
    "calibration": 1,          # [PS] via stats.ecdf
    "conversion_latency": 1,   # [PS] via exact_quantiles
    "ecdf": 1,                 # [PS]
    "kaplan_meier": 1,         # [PS] the quantized-log/dead-flag CDF
                               # over the distinct-duration histogram
                               # (the first, removed-count CDF is
                               # behind its eager localCheckpoint and
                               # never appears in the final plan)
    "kruskal_wallis": 1,       # [PS] pooled-rank CDF
    "logrank": 1,              # [PS] pooled-time at-risk CDF (totals
                               # derive from the pinned histogram, so
                               # the offsets window appears once)
    "anderson_darling": 1,     # [PS] pooled-histogram cumulative
                               # counts (pinned, same shape as
                               # ks_drift)
    "wasserstein": 2,          # [PS] + the next-nonempty-bucket
                               # firsts window over the <=P-row
                               # bucket-minima table (the value-gap
                               # repair at bucket boundaries)
    "kuiper": 1,               # [PS] pooled-histogram cumulative
                               # counts (the ks_drift shape)
    "cramer_von_mises": 1,     # [PS] pooled-histogram cumulative
                               # counts (the anderson_darling shape)
    "energy_distance": 2,      # [PS] + the bucket-firsts gap repair
                               # (the wasserstein shape)
    "pettitt": 2,              # [PS] x2: value-rank CDF + the
                               # time-ordered U_t scan (both
                               # two-level; only the <=P-row offsets
                               # windows are global)
    "aalen_johansen": 2,       # [PS] x2: the all-cause at-risk scan
                               # + the quantized-log/dead scan (the
                               # kaplan_meier shape; the CIF window
                               # partitions on the cause key)
    "ks_drift": 1,             # [PS]
    "lift_table": 2,           # [PS] + [LT]
    "mutual_information": 1,   # [CT]
    "theil_u": 1,              # [CT] marginal/total windows over the
                               # |X|x|Y| joint-cell table
    "negative_sample": 1,      # [BK]
    "pareto": 1,               # [PS] (cum revenue over the rank)
    "average_precision": 1,    # [PS] cumulative tp/at-or-above counts
                               # (the pinned histogram feeds the scan
                               # and the 1-row totals branch once)
    "pr_curve": 1,             # [PS] cumulative tp/fp counts
    "roc_curve": 1,            # [PS] cumulative tp/at-or-above counts
                               # (same pinned-histogram shape)
    "nelson_aalen": 1,         # [PS] the quantized-hazard CDF over
                               # the distinct-duration histogram (the
                               # at-risk CDF sits behind the first
                               # _prefix_sums' internal pin)
    "psi_drift": 4,            # [PS] edges lineage referenced 4x
    "quantile_normalize": 2,   # [PS] both sides' CDFs
    "quantiles": 1,            # [PS] via exact_quantiles
    "rmst": 2,                 # [PS] via kaplan_meier + the lead()
                               # over the bounded KM step table (the
                               # lit(1) partition spec constant-folds
                               # to empty in the optimized plan)
    "rank_sum": 1,             # [PS]
    "reorder_intervals": 1,    # [PS] via exact_quantiles
    "spearman": 2,             # [PS] one CDF per rank map (x and y)
    "theil_sen": 3,            # [SL] slope-table CDF + 2x [PS] via
                               # exact_quantiles (x and y medians)
    "weekly_trend": 1,         # [WK]
}


# Queries allowed a CartesianProduct / BroadcastNestedLoopJoin with a
# DATA-SIZED side. Most BNLJ uses in the repo are 1-row or k-row
# broadcast attaches (totals, centroids, edges) — those are fine and
# NOT flagged; this list is for queries whose plan contains a genuine
# pair expansion, each a documented ORACLE BASELINE, never the scale
# path (the LSH/prefix-filter variants are the production routes).
# Empty by construction — the r10 sweep proved NO registered query
# plans a CartesianProduct node: even the documented quadratic oracle
# baselines (edit_join, ngram_jaccard, embedding_cosine_dups, the ANN
# recall joins) expand pairs through KEYED shingle/bucket joins, never
# a physical cartesian. Any future entry needs a boundedness argument.
CARTESIAN_EXEMPT: dict[str, str] = {}

# Queries allowed Arrow-batched python stages (ArrowEvalPython /
# MapInPandas / FlatMapGroupsInPandas) — the operators whose semantics
# Spark's built-ins genuinely can't express (the brief's sanctioned
# escape hatch). Row-at-a-time BatchEvalPython is NEVER allowed.
ARROW_EXEMPT: dict[str, str] = {
    "keyword_tag": "Aho-Corasick automaton over Arrow batches",
    "image_decode": "media codec decode (real codecs, Arrow batches)",
    "image_resize": "same codec path (decode + resample)",
    "audio_decode": "same codec path (WAV/PCM)",
    "frame_sample": "video frame sampling over Arrow batches",
    "embed_media": "deterministic media embedding over decoded bytes",
    "bpe_tokenize": "trained-vocab BPE encoding over Arrow batches",
    "model_score": "pluggable python scorer (documented escape hatch)",
    "ewma": "inherently sequential per-key recursion (α·x + β·y_prev) "
            "— no associative reformulation reproduces its float "
            "semantics; mapInPandas over key-sorted partitions (one "
            "python call per BATCH, not per key), keys parallelize",
    "simhash": "64-bit simhash signature fold over Arrow batches",
    "incremental_minhash": "store fold reuses the simhash/minhash "
                           "Arrow signature path",
    "parquet_stats": "footer/row-group statistics reader (pyarrow "
                     "metadata, not a data scan)",
}


def battery_sweep(spark, entrymod, sf_dir: str) -> int:
    """Battery rules over EVERY registered query's plan (VERDICT r9
    ask #3 generalized): manual audits caught auc's unpartitioned
    window; these catch the next one for free.

    1. no unpartitioned Window beyond the annotated-bounded
       exemptions (single-partition scale cliff);
    2. no CartesianProduct beyond the documented quadratic oracle
       baselines;
    3. no row-at-a-time python (BatchEvalPython) EVER; Arrow python
       stages only where annotated."""
    failed = 0
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, sf_dir)
            cnt = unpartitioned_window_count(df)
            plan = plan_of(df)
        except Exception as exc:  # plan construction itself failed
            failed += 1
            print(f"FAIL {name}: plan construction error: {exc!r}")
            continue
        problems = []
        used = []
        allowed = BOUNDED_WINDOW_EXEMPT.get(name, 0)
        if cnt > allowed:
            problems.append(
                f"{cnt} unpartitioned Window(s), {allowed} exempt"
            )
        elif cnt:
            used.append(f"window({cnt})")
        has_cart = "CartesianProduct" in plan
        if has_cart and name not in CARTESIAN_EXEMPT:
            problems.append("CartesianProduct (pair expansion)")
        elif has_cart:
            used.append("cartesian")
        if "BatchEvalPython" in plan:
            problems.append("BatchEvalPython (row-at-a-time python)")
        has_arrow = any(
            m in plan
            for m in (
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
            )
        )
        if has_arrow and name not in ARROW_EXEMPT:
            problems.append("unannotated Arrow python stage")
        elif has_arrow:
            used.append("arrow")
        # stale-annotation hygiene: an exemption the plan no longer
        # needs is a dormant loophole — fail it so the list stays true
        if name in CARTESIAN_EXEMPT and not has_cart:
            problems.append("stale CARTESIAN_EXEMPT entry (unused)")
        if name in ARROW_EXEMPT and not has_arrow:
            problems.append("stale ARROW_EXEMPT entry (unused)")
        if allowed and cnt == 0:
            problems.append("stale BOUNDED_WINDOW_EXEMPT entry (unused)")
        if problems:
            failed += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        elif used:
            print(f"PASS {name}: {', '.join(used)} within annotation")
    print(f"battery sweep: {failed} failures")
    return failed


# backwards-compatible alias (r10 ask #3 shipped as --window-sweep)
window_sweep = battery_sweep


CHECKS: list[tuple[str, str, list[str], list[str]]] = [
    # (query, description, must_contain, must_not_contain)
    (
        "filter",
        "predicate pushed to parquet scan + pruned columns",
        ["PushedFilters: [IsNotNull(l_quantity)", "codegen id"],
        [],
    ),
    (
        "aggregation",
        "partial (map-side) aggregation before the exchange",
        ["partial_sum", "hashpartitioning"],
        [],
    ),
    (
        "join_inner",
        "small dimension broadcast (no fact-table shuffle)",
        ["BroadcastHashJoin"],
        ["SortMergeJoin"],
    ),
    (
        "robust_scale",
        "row-level robust scaling: statistics come back as BROADCAST joins, the frame is never re-shuffled for enrichment",
        ["BroadcastHashJoin"],
        ["CartesianProduct"],
    ),
    (
        "line_dedup",
        "corpus line dedup: first-occurrence agg partial-combines map-side (min-struct before the exchange); no window over the hash (AQE can split join skew, not window skew)",
        ["partial_min", "hashpartitioning"],
        ["Window", "CartesianProduct"],
    ),
    (
        "gopher_rules",
        "Gopher rule battery rides the scan: zero exchanges, whole-stage codegen",
        ["codegen id"],
        ["Exchange", "SortMergeJoin", "CartesianProduct"],
    ),
    (
        "prefix_jaccard",
        "lossless prefix-filter Jaccard: keyed shingle joins only (doc-frequency agg partial-combined), never a cartesian pair expansion",
        ["partial_count", "hashpartitioning"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    (
        "keyword_tag",
        "dictionary tagging (automaton engine): one Arrow mapInPandas stage riding the scan, no joins, no shuffles of the corpus",
        ["MapInPandas"],
        ["SortMergeJoin", "CartesianProduct", "Exchange"],
    ),
    (
        "bloom_semi_join",
        "bitmap bit-probes broadcast; fact side never sort-merges",
        ["BroadcastHashJoin"],
        ["SortMergeJoin", "CartesianProduct"],
    ),
    (
        "ranking",
        "top-k pushed below the shuffle as WindowGroupLimit",
        ["WindowGroupLimit"],
        [],
    ),
    (
        "window_tumbling",
        "single aggregation shuffle for the windowed groupBy",
        ["partial_count", "hashpartitioning"],
        [],
    ),
    (
        "dedup_exact_keys",
        "survivor selection via WindowGroupLimit (partial top-1 before exchange)",
        ["WindowGroupLimit"],
        [],
    ),
    (
        "cosine_topk",
        "corpus stays in place: broadcast join + top-k window limit",
        ["BroadcastNestedLoopJoin", "WindowGroupLimit"],
        ["SortMergeJoin"],
    ),
    (
        "join_semi",
        "existence join planned as a real semi join (no row blow-up)",
        ["LeftSemi"],
        [],
    ),
    (
        "join_anti",
        "subtraction join planned as a real anti join",
        ["LeftAnti"],
        [],
    ),
    (
        "asof_join",
        "union-merge asof: ONE key shuffle + running-window match, no range explosion",
        ["Window", "hashpartitioning(__k"],
        ["BroadcastNestedLoopJoin", "CartesianProduct"],
    ),
    (
        "range_join",
        "binned range join: equi-join on bin id with residual BETWEEN, never nested-loop",
        ["BroadcastHashJoin"],
        ["BroadcastNestedLoopJoin", "CartesianProduct"],
    ),
    (
        "rollup",
        "rollup = one Expand + one partial-agg shuffle",
        ["Expand", "partial_sum", "hashpartitioning"],
        [],
    ),
    (
        "sort_limit",
        "global top-n plans as TakeOrderedAndProject (no full sort)",
        ["TakeOrderedAndProject"],
        [],
    ),
    (
        "analytics",
        "all analytic columns share one window spec: one sort, one exchange",
        ["Window", "hashpartitioning(o_custkey"],
        [],
    ),
    (
        "pivot",
        "conditional-agg pivot: partial agg + ONE shuffle, no pivotfirst re-agg",
        ["partial_sum", "hashpartitioning(l_returnflag"],
        ["pivotfirst"],
    ),
    (
        "sketch_distinct",
        "HLL sketch build AND rollup both map-side partial (KB partials, not values)",
        ["partial_hll_sketch_agg", "partial_hll_union_agg"],
        [],
    ),
    (
        "asof_nearest",
        "nearest asof: both direction windows share ONE key shuffle, no nested loop",
        ["hashpartitioning(__k"],
        ["BroadcastNestedLoopJoin", "CartesianProduct"],
    ),
    (
        "contamination",
        "decontamination: benchmark set broadcast, corpus never sort-merge shuffled",
        ["BroadcastHashJoin"],
        ["SortMergeJoin"],
    ),
    (
        "pii_scan",
        "PII counts + redaction are a pure projection: no shuffle, no UDF",
        ["codegen id"],
        ["Exchange", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "hash_split",
        "hash split is a shuffle-free Catalyst CASE projection",
        ["codegen id"],
        ["Exchange", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "repetition_stats",
        "repetition metrics are per-row array expressions: no shuffle",
        [],
        ["Exchange", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "top_bigram",
        "top-ngram: both aggregations partial before their exchange",
        ["partial_count", "partial_max"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "chunk_docs",
        "chunking is narrow: expressions + generate, no shuffle",
        ["Generate"],
        ["Exchange", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "pack_sequences",
        "packing: ONE shuffle (hash by shard), windows within shards",
        ["hashpartitioning(pack_shard"],
        ["SinglePartition", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "token_frequency",
        "vocab top-k: partial count before exchange, heap top-k (no global sort)",
        ["partial_count", "TakeOrderedAndProject"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "hash_sample",
        "hash sampling is a pure scan predicate: no shuffle, no UDF",
        ["Filter"],
        ["Exchange", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "cap_per_group",
        "per-group cap: partial top-N before the exchange (WindowGroupLimit), "
        "shuffle carries <= groups x cap rows",
        ["WindowGroupLimit"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "histogram_sketch",
        "histogram build: bins+2 conditional sums partial-agg before ONE exchange "
        "(vector-per-task shuffle, never raw values)",
        ["partial_sum", "hashpartitioning"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "clean_text",
        "HTML strip + boilerplate filter are a pure regex projection: no shuffle, no UDF",
        ["codegen id"],
        ["Exchange", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "image_decode",
        "image decode: ONE Arrow mapInPandas stage on a narrow scan, no shuffle "
        "(payload projected away at the stage boundary)",
        ["MapInPandas"],
        ["Exchange", "BatchEvalPython"],
    ),
    (
        "audio_decode",
        "audio decode: ONE Arrow mapInPandas stage, no shuffle",
        ["MapInPandas"],
        ["Exchange", "BatchEvalPython"],
    ),
    (
        "minhash_lsh",
        "LSH recall summary: banded candidates + exact truth join, never all-pairs",
        ["hashpartitioning"],
        ["CartesianProduct"],
    ),
    (
        "simhash",
        "simhash invariant summary: key-equality truth join, never all-pairs",
        ["hashpartitioning"],
        ["CartesianProduct"],
    ),
    (
        "composite",
        "cross-operator DAG: nation dim broadcast into the events branch, "
        "dedup survivor via WindowGroupLimit, no sort-merge/nested-loop anywhere",
        ["BroadcastHashJoin", "WindowGroupLimit", "partial_count"],
        ["SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"],
    ),
    (
        "lm_score",
        "LM scoring: count tables broadcast onto exploded bigrams (corpus "
        "never sort-merge shuffled), partial aggs before every exchange",
        ["BroadcastHashJoin", "partial_count"],
        ["SortMergeJoin", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "substring_dedup",
        "substring dedup: window-hash shuffle carries (hash,id,pos) only, "
        "partial aggs, no python, no all-pairs",
        ["partial_count", "hashpartitioning"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "table_diff",
        "snapshot CDC: fingerprint projection below the full-outer join, "
        "no python, no nested-loop",
        ["xxhash64", "FullOuter"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "BroadcastNestedLoopJoin"],
    ),
    (
        "incremental_dedup",
        "incremental exact dedup: store side joined via broadcast "
        "(never shuffled), md5 keys, no python",
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "mix",
        "mixture solver: pure scan predicate over md5 thresholds — "
        "zero joins/shuffles of the corpus, no python",
        [],
        ["SortMergeJoin", "CartesianProduct", "Exchange",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "resample_linear",
        "time-series grid: distributed sequence+explode spine "
        "(Generate), grid join, series-keyed fill Window — no python, "
        "no cartesian; both raw-table branches are pruned aggregates",
        ["Generate", "Window", "hashpartitioning(user_id"],
        ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    ),
    (
        "weighted_sample",
        "PPS sampling: corpus side goes scan→filter→1-row-broadcast "
        "cross join — the corpus itself never shuffles",
        ["BroadcastNestedLoopJoin"],
        ["SortMergeJoin", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "pmi",
        "collocations: map-side partial counts before every exchange "
        "(shuffles carry vocab-sized state), broadcast marginal joins",
        ["partial_count", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "drift",
        "two-sample drift: partial counts before the category-sized "
        "exchanges; no python (SMJ on |categories| rows is fine — "
        "full-outer can't broadcast)",
        ["partial_count"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "profile",
        "column profiler: single aggregation job; the exact-distinct "
        "Expand is the one visible cost (approx mode removes it)",
        ["Expand"],
        ["BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"],
    ),
    (
        "ks_drift",
        "exact KS: value-count partial agg (side tags summed, so "
        "partial_sum), prefix sums over the PINNED range-partitioned "
        "frame (localCheckpoint — shows as ExistingRDD; the range "
        "exchange lives inside it, pinned so every branch sees one "
        "boundary draw), broadcast offsets/totals joins — no python, "
        "no cartesian",
        ["ExistingRDD", "partial_sum", "BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "SortMergeJoin"],
    ),
    (
        "intervals",
        "interval union: ONE user-keyed exchange feeds both island "
        "windows and the closing agg — no python, no joins",
        ["hashpartitioning(user_id", "Window"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "interval_join",
        "binned interval-overlap join: EQUI hash join on (supplier, "
        "bin) with the residual overlap predicate inside it (broadcast "
        "at this SF; shuffled-hash/sort-merge at scale) — never a "
        "nested loop or cartesian product over the interval sets",
        ["HashJoin"],
        ["BroadcastNestedLoopJoin", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "time_rollup",
        "hierarchical rollup: every level reads a PINNED bucket table "
        "(ExistingRDD boundaries) — the raw scan ran exactly once in "
        "the finest level's checkpoint job; no parquet scan, no joins, "
        "no python in the final plan",
        ["ExistingRDD", "Union"],
        ["Scan parquet", "CartesianProduct", "SortMergeJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "mutual_information",
        "MI/chi2/CramersV from ONE joint groupBy: marginals via windows "
        "over the joint (category-product-sized) table — one scan, no "
        "second pass over raw data, no python",
        ["partial_count"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "entropy",
        "entropy/Simpson: one category groupBy then a group-level agg — "
        "no joins at all, no python",
        ["partial_count"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "quantiles",
        "exact quantiles: the value-histogram partial agg runs once "
        "into an eager checkpoint (ExistingRDD boundary — its "
        "partial_count lives in the checkpoint job, not this plan); "
        "the final plan is the prefix-sum CDF over deterministic "
        "driver-collected bucket boundaries plus one closing "
        "aggregation for all probs — no python, no cartesian, no "
        "sort-merge",
        ["ExistingRDD"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "SortMergeJoin"],
    ),
    (
        "pagerank",
        "fixed-point PageRank: final plan reads the checkpointed ranks "
        "(ExistingRDD boundary — the per-iteration join+agg live behind "
        "it, truncated so the plan stays fixed-size across rounds) — "
        "no python, no cartesian",
        ["ExistingRDD"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "scd2_lookup",
        "point-in-time join: interval predicate INSIDE the key join "
        "(dim broadcast at this size; flips to shuffle join on stats "
        "with no code change), one row out per fact — no cartesian, "
        "no python",
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "skew_join",
        "salted skew join: hot/cold splits run as BROADCAST semi/anti "
        "joins against the frozen KB hot-key set, the hot path joins on "
        "(key, salt) so the hot key spreads across salt_buckets "
        "reducers, and the two paths reunite under Union — no python, "
        "no cartesian",
        ["BroadcastHashJoin", "__skew_salt", "Union"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "discretize",
        "equal-frequency binning: quantile edges via the grouped "
        "histogram+CDF pass come back as a BROADCAST join (#groups "
        "rows); the per-row bin closes as an array-aggregate "
        "expression — the fact side is never re-shuffled, no python, "
        "no cartesian, no sort-merge, no single-partition ntile window",
        ["BroadcastHashJoin", "aggregate("],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "SortMergeJoin"],
    ),
    (
        "kmv_distinct",
        "KMV sketch: the per-group top-k hash cut runs as a PARTIAL "
        "WindowGroupLimit before the exchange, so the group shuffle "
        "carries <= k hashes per group per map task — never the full "
        "distinct set; merge + estimate close as array expressions, no "
        "python, no cartesian",
        ["WindowGroupLimit", "Partial"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "cusum",
        "CUSUM change-points: exact-mean table comes back as a "
        "BROADCAST join; all four window columns (2 prefix sums + 2 "
        "running mins, integer units) share ONE series-keyed sort — "
        "no python, no cartesian, no sort-merge join, no recursion",
        ["BroadcastHashJoin", "Window"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "SortMergeJoin"],
    ),
    (
        "target_encode",
        "target encoding: category statistics and the 1-row prior are "
        "PINNED bounded relations (r12 — their aggregations run once at "
        "pin time, so no aggregate appears in the final plan) and come "
        "back as BROADCAST joins (null-safe keys stay hashable); the "
        "frame itself is never re-shuffled; LOO closes as row-local "
        "arithmetic — no python, no cartesian, no sort-merge",
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "SortMergeJoin"],
    ),
    (
        "triangle_count",
        "degree-ordered triangles: three equi-join shuffles "
        "(hashpartitioning), the wedge intermediate bounded O(m^1.5) "
        "by the orientation — no cartesian, no nested loop, no python",
        ["hashpartitioning"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "ecdf",
        "global percent-rank: prefix-sum CDF over the value histogram "
        "(range partitioning + pinned checkpoint boundary), CDF joined "
        "back on the value — the full-data single-partition cume_dist "
        "window never appears (the only SinglePartition node is the "
        "documented <=P-row offsets window inside _prefix_sums), no "
        "python, no cartesian",
        ["ExistingRDD"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "trimmed_mean",
        "trimmed mean: quantile thresholds come back as BROADCAST "
        "joins, map-side partial aggregation, the frame is never "
        "re-shuffled; no python, no cartesian",
        ["BroadcastHashJoin", "partial_count"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "SortMergeJoin"],
    ),
    (
        "rolling_median",
        "rolling median: ONE key exchange feeds both window passes; "
        "the sorted-window array is a single materialized column "
        "(one collect_list buffer per pass, not one per order-"
        "statistic reference); no joins, no python",
        ["Window", "hashpartitioning"],
        ["BroadcastHashJoin", "SortMergeJoin", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "quantile_normalize",
        "quantile normalization: totals as driver literals (fused "
        "pin — no 1-row nested-loop attach), rank lookup via the "
        "binned range join, no cartesian, no python",
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "mad_outliers",
        "MAD outliers: both medians via grouped histogram+CDF, the "
        "#groups-row median/MAD tables come back as BROADCAST joins — "
        "the data is never re-shuffled for the enrichment, no python, "
        "no cartesian, no sort-merge",
        ["BroadcastHashJoin", "partial_count"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "SortMergeJoin"],
    ),
    (
        "batch_sessionize",
        "sessionization: boundary flag, running session index and the "
        "per-session rollup all ride ONE user-keyed exchange (the "
        "rollup groups a prefix of the window clustering) — no joins, "
        "no cartesian, no python",
        ["Window", "hashpartitioning(user_id"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "debounce",
        "debounce: one key-keyed window shuffle + scan predicate — "
        "no joins, no python",
        ["Window", "hashpartitioning(user_id"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "ohlc",
        "OHLC bars: ONE map-side-combined aggregation (struct min/max "
        "partials before the exchange) — no windows, no joins, no "
        "python",
        ["partial_min", "hashpartitioning"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "twap",
        "TWAP: one lead() window on the series key + one "
        "map-side-combined aggregation of exact decimal products — "
        "no joins, no python",
        ["Window", "partial_sum"],
        ["CartesianProduct", "SortMergeJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "lag_features",
        "lag features: all lags + deltas ride one series-keyed window "
        "(no extra exchange per lag), rows pass through — no joins, "
        "no python",
        ["Window", "hashpartitioning(user_id"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "negative_sample",
        "negative sampling: the dense bucket table and the 1-row "
        "bucket count come back BROADCAST (nested-loop on the 1-row "
        "cross join is fine); the candidate rank is bucket-local — "
        "no cartesian, no python",
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "association_rules",
        "association rules: item stats broadcast onto the pair table, "
        "total as a 1-row broadcast — the raw feed shuffles only for "
        "the basket grouping, no cartesian, no python",
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "feature_hash",
        "feature hashing: tokenize+hash ride the scan, ONE "
        "map-side-combined shuffle on (id, feature) — no windows, no "
        "joins, no python",
        ["partial_sum", "hashpartitioning"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "auc",
        "exact AUC: raw rows partial-agg map-side onto the distinct-"
        "score table BEFORE the rank window; filters pushed; no "
        "python, no joins",
        ["partial_count", "PushedFilters: [IsNotNull(o_totalprice)",
         "Window"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "cohens_kappa",
        "kappa contingency: the shared cell table is checkpointed so "
        "the raw table is scanned ONCE (no duplicate parquet scans "
        "across the three marginal branches)",
        ["ExistingRDD"],
        ["Scan parquet", "CartesianProduct"],
    ),
    (
        "lift_table",
        "decile lift: NO single-partition ntile — global rank is the "
        "two-level scan (literal range bounds -> per-_pid row_number, "
        "P-way parallel) with the closed-form NTILE in (rank, n); "
        "bucket-level cumulative windows run on the 10-row bucket "
        "table; no python, no joins of the raw rows",
        ["row_number", "hashpartitioning(_pid", "partial_count"],
        ["ntile(", "CartesianProduct", "SortMergeJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "l_diversity",
        "l-diversity: single-distinct two-phase rewrite — "
        "partial_count on (QI, sensitive) BEFORE the first exchange, "
        "merged then re-keyed on QI (map-side distinct state, no "
        "Expand needed for one distinct agg); no windows, no joins, "
        "no python",
        ["partial_count", "merge_count", "hashpartitioning"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "kmeans_spread",
        "spread-seeded kmeans keeps the first-k posture: broadcast "
        "centroid attach, zero python, no cartesian blowup",
        ["BroadcastNestedLoopJoin"],
        ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"],
    ),
    (
        "brier_ece",
        "Brier+ECE: one map-side-combined (group, bin) shuffle then a "
        "bounded second agg — no windows, no joins, no python",
        ["partial_sum", "partial_count"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "t_closeness",
        "t-closeness: global value spine broadcast onto the group "
        "table (1-row totals via nested-loop attach), cell join "
        "broadcast, EMD window partitioned on the QI group; no python",
        ["BroadcastHashJoin", "BroadcastNestedLoopJoin", "Window"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "spearman",
        "spearman: rank maps from value histograms + distributed "
        "prefix sums (per-_pid windows), histogram-sized joins come "
        "back broadcast; no python, no cartesian",
        ["hashpartitioning(_pid", "partial_count", "BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "ndcg",
        "ndcg: both rank windows partition on the query key, one "
        "aggregation, no joins of the scored rows, no python",
        ["Window", "row_number", "partial_count"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "decontaminate",
        "decontaminate: eval shingles broadcast — the training corpus "
        "is never shuffled before the per-doc aggregation; no python",
        ["BroadcastHashJoin", "partial_count"],
        ["SortMergeJoin", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "rfm",
        "rfm (r10 rewrite): fused three-order two-level rank — "
        "per-_pid row_number windows, closed-form NTILE, no "
        "single-partition ntile, no joins back, no python",
        ["hashpartitioning(_pid", "row_number"],
        ["ntile(", "SortMergeJoin", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "pareto",
        "pareto (r10 rewrite): _global_rank_desc + decimal prefix "
        "sums over the rank, total as a 1-row broadcast attach — "
        "every stage P-way parallel",
        ["hashpartitioning(_pid", "partial_sum",
         "BroadcastNestedLoopJoin"],
        ["ntile(", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "spend_gini",
        "spend_gini (r10 rewrite): ascending rank via the two-level "
        "scan mirror (i = n+1-rank_desc); the Gini close is one "
        "exact-decimal aggregation",
        ["hashpartitioning(_pid", "row_number", "partial_sum"],
        ["ntile(", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "anova",
        "one-way ANOVA: one map-side-combined (group, level) shuffle; "
        "the cross-level fold runs on the bounded level table; no "
        "windows, no joins, no python",
        ["partial_count", "hashpartitioning"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "tukey_hsd",
        "Tukey HSD: pairwise table built from the PINNED <=k-row "
        "level histogram (ExistingRDD — raw scanned once, feeding "
        "the MSE fold and both join sides); the non-equi pair join "
        "is a broadcast over bounded level tables, never a "
        "data-sized cartesian; no windows, no python",
        ["ExistingRDD", "BroadcastNestedLoopJoin"],
        ["Scan parquet", "Window", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "cronbach_alpha",
        "Cronbach alpha: ONE moment aggregation carrying 2k+3 exact "
        "decimals — no joins, no windows, no python; the item "
        "variance numerators fold in literal item order inside the "
        "projection",
        ["partial_sum", "partial_count"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "cohens_d",
        "Cohen's d: the welch_ttest conditional-moment shape — one "
        "map-side-combined aggregation per group, fixed-order double "
        "close; no joins, no windows, no python",
        ["partial_sum", "partial_count", "hashpartitioning"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "kruskal_wallis",
        "Kruskal-Wallis: pooled ranks from the value histogram via "
        "the distributed prefix-sum scan (per-_pid windows), the "
        "rank map joins back broadcast; no python, no cartesian",
        ["hashpartitioning(_pid", "partial_count", "BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "average_precision",
        "average precision: the distinct-score histogram is pinned "
        "ONCE (ExistingRDD — raw parquet scanned a single time behind "
        "the eager checkpoint, feeding both the scan and the totals "
        "branch), cumulative tp/at-or-above ride the two-level "
        "prefix-sum scan (per-_pid windows), totals attach as driver "
        "literals from the fused pin observation; nano-quantized terms sum as longs; no python",
        ["hashpartitioning(_pid", "ExistingRDD"],
        ["Scan parquet", "CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "anderson_darling",
        "Anderson-Darling drift: both sides reduce onto ONE pinned "
        "pooled histogram (ExistingRDD); midrank cumulative counts "
        "ride the two-level scan; totals as driver literals (fused pin); nano-quantized "
        "per-value terms sum as longs; no python",
        ["hashpartitioning(_pid", "ExistingRDD"],
        ["Scan parquet", "CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "wasserstein",
        "Wasserstein-1 drift: pinned pooled histogram (ExistingRDD), "
        "cumulative counts via the two-level scan, value gaps from a "
        "_pid-partitioned lead + bounded bucket-firsts repair; "
        "nano-quantized segment terms sum as longs; no python",
        ["hashpartitioning(_pid", "ExistingRDD"],
        ["Scan parquet", "CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "kuiper",
        "Kuiper drift: pinned pooled histogram (ExistingRDD), "
        "cumulative counts via the two-level scan, totals as driver literals (fused pin); "
        "both directional maxima are exact decimal maxes in ONE "
        "bounded aggregation; no python",
        ["hashpartitioning(_pid", "ExistingRDD"],
        ["Scan parquet", "CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "cramer_von_mises",
        "Cramer-von Mises drift: pinned pooled histogram "
        "(ExistingRDD), cumulative counts via the two-level scan, "
        "totals as driver literals (fused pin); nano-quantized per-value terms sum as "
        "longs; no python",
        ["hashpartitioning(_pid", "ExistingRDD"],
        ["Scan parquet", "CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "energy_distance",
        "Energy distance drift: pinned pooled histogram "
        "(ExistingRDD), two-level scan for cumulative counts, value "
        "gaps from the _pid-partitioned lead + bounded bucket-firsts "
        "repair; nano-quantized segment terms sum as longs; no python",
        ["hashpartitioning(_pid", "ExistingRDD"],
        ["Scan parquet", "CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "aalen_johansen",
        "Aalen-Johansen: (duration, cause) cells pinned once; "
        "all-cause at-risk/log scans ride the two-level prefix sums; "
        "per-time columns join back on the duration key; the CIF "
        "scan partitions on the CAUSE key; no python",
        ["hashpartitioning(_pid", "ExistingRDD",
         "hashpartitioning(_k"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "bland_altman",
        "Bland-Altman: ONE moment aggregation over the per-unit "
        "difference (exact decimal sum/sum-of-squares); header-detail "
        "join is the only exchange of data; fixed-order closes; no "
        "windows, no python",
        ["partial_sum", "partial_count"],
        ["Window", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "fdr_by",
        "Benjamini-Yekutieli: ascending p-rank rides the two-level "
        "scan (hashpartitioning on _pid); the harmonic constant and "
        "k are 1-row broadcast aggregates of the SAME ranked frame; "
        "division-free comparison; no python",
        ["hashpartitioning(_pid", "BroadcastNestedLoopJoin"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "ratio_ttest",
        "Delta-method ratio test: 12 exact decimal moments in ONE "
        "map-side-combined aggregation over the unit-level frame; "
        "fixed-order delta closes; the customer-arm attach is the "
        "only join; no windows, no python",
        ["partial_sum"],
        ["Window", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "cuped",
        "CUPED: 12 exact decimal moments in ONE map-side-combined "
        "aggregation; theta and every derived close are fixed-order "
        "expressions over that single short row; no joins, no "
        "windows, no python",
        ["partial_sum", "PushedFilters"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "permutation_test",
        "Randomization test: exact observed counts broadcast as ONE "
        "row; all B label swaps ride one 2B+4-column aggregation -- "
        "no data x B explosion, no raw-row shuffle; no python",
        ["partial_sum", "BroadcastNestedLoopJoin", "PushedFilters"],
        ["Window", "CartesianProduct", "SortMergeJoin", "Generate",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "bootstrap_ci",
        "Poisson bootstrap: ALL replicates ride ONE map-side-combined "
        "aggregation (2B+2 exact numbers per group) -- no data x B "
        "explosion, no second scan; order-statistic CI + fold SE over "
        "the bounded sorted-means array; no python",
        ["partial_sum", "partial_count", "PushedFilters"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "Generate", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "tfidf",
        "TF-IDF top terms: tokenize -> ONE (doc, term) shuffle; the "
        "vocabulary-sized df table joins back on the term key; N is "
        "a 1-row broadcast; the top-k window partitions on the DOC "
        "key with WindowGroupLimit pushdown; no python",
        ["WindowGroupLimit", "hashpartitioning(doc_id",
         "BroadcastNestedLoopJoin"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "mantel_haenszel",
        "Mantel-Haenszel: ONE map-side-combined (group, stratum) "
        "shuffle carrying four exact longs; all four cross-stratum "
        "sums close by ordered folds over the bounded stratum table; "
        "no joins, no windows, no python",
        ["partial_sum", "PushedFilters"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "cochran_armitage",
        "Cochran-Armitage trend: every term is a row-level exact "
        "decimal sum in ONE map-side-combined aggregation (the level "
        "table never materializes); fixed-order sqrt close; no "
        "joins, no windows, no python",
        ["partial_sum", "PushedFilters"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "concordance_index",
        "Harrell's C: ONE map-side-combined (duration, score) cell "
        "shuffle; pair expansion is a broadcast nested-loop over the "
        "BOUNDED cell table (the kendall_tau cardinality contract), "
        "never a raw-row shuffle; exact decimal pair counts, one "
        "closing division; no python",
        ["partial_sum", "BroadcastNestedLoopJoin", "ExistingRDD"],
        ["CartesianProduct", "SortMergeJoin", "Window",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "hosmer_lemeshow",
        "Hosmer-Lemeshow: ONE map-side-combined (group, bin) shuffle "
        "carrying three exact numbers per cell; the chi2 closes by "
        "the ordered fold over the bounded bin table; no joins, no "
        "windows, no python",
        ["partial_sum", "partial_count"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "weighted_kappa",
        "Weighted kappa: ONE map-side-combined contingency pass; "
        "class spine, marginal k x k products, and the exact w.O/w.RC "
        "sums all run on bounded cell tables with broadcast spine "
        "attach; one closing division; no python",
        ["partial_sum", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "pettitt",
        "Pettitt changepoint: value ranks and time-ordered U_t both "
        "ride two-level prefix-sum scans; one value-keyed rank join; "
        "totals as driver literals (fused pin); K + argmax close in a single "
        "max(struct) aggregation; no python",
        ["hashpartitioning(_pid", "ExistingRDD"],
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "cochran_q",
        "Cochran Q: one conditional aggregation carrying k+3 exact "
        "longs — no joins, no windows, no python; single final "
        "division",
        ["partial_sum", "partial_count"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "friedman",
        "Friedman: within-row doubled ranks are pure per-row Catalyst "
        "comparisons (no sort, no window); ONE aggregation carries "
        "k+2 exact numbers; the tie-corrected close squares AFTER "
        "the final merge; no python",
        ["partial_sum", "partial_count"],
        ["Window", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "mrr",
        "MRR: the rank window partitions on the QUERY key (parallel "
        "across queries); per-query reciprocals nano-quantized, "
        "summed as longs; no joins, no global window, no python",
        ["partial_min", "hashpartitioning"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "roc_curve",
        "ROC curve: pinned distinct-score histogram (ExistingRDD — "
        "raw parquet scanned once), cumulative counts via the "
        "two-level scan, totals as driver literals (fused pin); "
        "per-row divisions only, no python",
        ["hashpartitioning(_pid", "ExistingRDD"],
        ["Scan parquet", "CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "mcc",
        "Matthews correlation: the four confusion cells come from ONE "
        "conditional aggregation riding the scan — no joins, no "
        "windows, no python; exact integer numerator, one sqrt close",
        ["partial_sum", "PushedFilters"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "fleiss_kappa",
        "Fleiss kappa: raw ratings reduce map-side to (item, "
        "category) cells; item close + category marginals are keyed "
        "aggregations on the shared cell table; panel-size max and "
        "dropped count attach as 1-row broadcasts; no windows, no "
        "python",
        ["partial_count", "BroadcastNestedLoopJoin"],
        ["Window", "CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "nelson_aalen",
        "Nelson-Aalen: duration histogram reduces map-side; at-risk "
        "and quantized-hazard CDFs ride the two-level scan (per-_pid "
        "windows, the first pass behind _prefix_sums' internal pin); "
        "totals broadcast; integer prefix sums, no float fold, no "
        "python",
        ["hashpartitioning(_pid", "partial_sum", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "fdr_bh",
        "BH FDR: ascending p-rank via the two-level scan; the cutoff "
        "is a 1-row broadcast max; no python",
        ["hashpartitioning(_pid", "row_number",
         "BroadcastNestedLoopJoin"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "chi_square",
        "chi-square independence: ONE (x, y) count shuffle reduces "
        "the data to its contingency cells; the r x c grid builds "
        "from broadcast-joined bounded tables; the cell fold is an "
        "aggregation, never a window; no python",
        ["partial_count", "hashpartitioning", "BroadcastHashJoin"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "mcnemar",
        "McNemar: the four paired cells come from ONE conditional "
        "aggregation riding the scan — no joins, no windows, no "
        "python, single final exchange",
        ["partial_count"],
        ["Window", "CartesianProduct", "SortMergeJoin",
         "BroadcastHashJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "brown_forsythe",
        "Brown-Forsythe: per-(group, level) medians via group-keyed "
        "windows over the value histogram (parallel across levels), "
        "the <=k-row median table joins back null-safe broadcast, "
        "then anova's single moment shuffle; no python",
        ["BroadcastHashJoin", "partial_count", "hashpartitioning"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "ewma",
        "EWMA: exactly the sanctioned Arrow stage — one key exchange, "
        "partition-sorted, MapInPandas fold; never per-key grouped-map "
        "(FlatMapGroupsInPandas) and never row-at-a-time python",
        ["MapInPandas", "hashpartitioning", "Sort"],
        ["FlatMapGroupsInPandas", "BatchEvalPython",
         "CartesianProduct", "Window"],
    ),
    (
        "kaplan_meier",
        "Kaplan-Meier: cumulative counts ride the two-level prefix-"
        "sum scan (per-_pid windows); the histogram reduction sits "
        "behind the scan's eager pin, so the visible plan is the "
        "bounded CDF close; no python",
        ["hashpartitioning(_pid"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "dsir",
        "DSIR: the corpus reduces ONCE to pinned (doc, bucket) cells "
        "(behind the eager pin); the <=B-row log-ratio table attaches "
        "as a BROADCAST hash join — the corpus is never shuffled on "
        "the FEATURE key (the one corpus-sized SMJ is the id-keyed "
        "left join re-attaching featureless docs, co-partitioned with "
        "the scoring groupBy); no python, no cartesian",
        ["BroadcastHashJoin"],
        ["CartesianProduct", "BatchEvalPython",
         "ArrowEvalPython", "Window"],
    ),
    (
        "zipf",
        "Zipf fit: vocabulary ranks via the two-level scan (per-_pid "
        "row_number), exact decimal moment close; no python",
        ["hashpartitioning(_pid", "row_number", "partial_count"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "readability",
        "readability rides the scan: zero exchanges, whole-stage "
        "codegen, pure per-row regexp/fold expressions",
        ["codegen id"],
        ["Exchange", "SortMergeJoin", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython", "Window"],
    ),
    (
        "kendall_tau",
        "Kendall tau-b: the cell-table inequality join is a keyed "
        "range join over the pinned bounded cells, never a physical "
        "cartesian over data rows; exact decimal pair counts close "
        "in one aggregation; no python",
        ["partial_sum"],
        ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
         "Window"],
    ),
    (
        "logrank",
        "log-rank: at-risk counts ride the two-level prefix-sum scan "
        "(per-_pid windows), arm totals attach as driver literals "
        "from the fused pin observation; quantized O-E/variance sum "
        "exactly; no python",
        ["hashpartitioning(_pid"],
        ["CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython"],
    ),
    (
        "theil_u",
        "Theil's U: ONE joint groupBy, marginal windows over the "
        "bounded cell table, one closing aggregation; no joins of "
        "data-sized relations, no python",
        ["partial_count"],
        ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
         "ArrowEvalPython"],
    ),
    (
        "pca",
        "PCA projection: the fitted basis is driver-side literals; "
        "the per-row path is k pure-Catalyst dot products riding the "
        "scan — zero exchanges, zero python (the Gram pass ran at "
        "fit time, not in this plan)",
        ["codegen id"],
        ["Exchange", "SortMergeJoin", "CartesianProduct",
         "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
         "Window"],
    ),
]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from etl_spark_gradle_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[4]",
                      conf={"spark.sql.shuffle.partitions": "4"})
    if "--window-sweep" in sys.argv[1:]:
        return 1 if window_sweep(spark, entrymod, sf_dir) else 0
    qs = entrymod.queries()
    failed = 0
    for name, desc, must, must_not in CHECKS:
        plan = plan_of(qs[name](spark, sf_dir))
        problems = [f"missing '{m}'" for m in must if m not in plan]
        problems += [f"unwanted '{m}'" for m in must_not if m in plan]
        if problems:
            failed += 1
            print(f"FAIL {name}: {desc} -> {'; '.join(problems)}")
        else:
            print(f"PASS {name}: {desc}")

    # scan width check: the filter query must read only the 5 projected
    # columns, not the full 11-column lineitem schema
    plan = plan_of(qs["filter"](spark, sf_dir))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    if read_schema and read_schema[0].count(",") <= 5:
        print("PASS filter: ReadSchema pruned to projected columns")
    else:
        failed += 1
        print(f"FAIL filter: ReadSchema not pruned: {read_schema}")

    # target_encode PIN-TIME plan (ADVICE r12): the category stats /
    # prior aggregations run at checkpoint time and never appear in the
    # final encode plan, so audit them directly — partial (map-side)
    # aggregation over the raw scan, no join, no python — and assert
    # the final plan consumes checkpointed RDDs instead of
    # re-aggregating
    from etl_spark_gradle_spark.operators.features import (
        _target_encode_stats,
        target_encode,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    stats_raw, prior_raw = _target_encode_stats(
        li, ["l_returnflag"], "l_extendedprice"
    )
    pin_problems = []
    sp = plan_of(stats_raw)
    if "partial_sum" not in sp or "hashpartitioning" not in sp:
        pin_problems.append("stats pin-time plan lost partial aggregation")
    if "Join" in sp or "EvalPython" in sp:
        pin_problems.append("stats pin-time plan grew a join/python stage")
    pp = plan_of(prior_raw)
    if "partial_sum" not in pp:
        pin_problems.append("prior pin-time plan lost partial aggregation")
    final = plan_of(
        target_encode(li, ["l_returnflag"], "l_extendedprice")
    )
    if "ExistingRDD" not in final:
        pin_problems.append("final plan no longer scans checkpointed RDDs")
    if "partial_sum" in final:
        pin_problems.append("final plan re-aggregates the pinned stats")
    if pin_problems:
        failed += 1
        print(f"FAIL target_encode_pins: {'; '.join(pin_problems)}")
    else:
        print(
            "PASS target_encode_pins: pin-time aggregation partial+"
            "shuffled, final plan consumes checkpoint scans only"
        )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
