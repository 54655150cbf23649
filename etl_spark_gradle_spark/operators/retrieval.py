"""Corpus retrieval scoring: TF-IDF vectors and BM25 ranking.

Beyond-reference operators (the reference has no text surface at all):
the standard lexical-retrieval primitives a training-data platform
needs — "find the documents most relevant to these probe terms" powers
targeted decontamination sweeps, topical subcorpus extraction, and
quality probes, all without an embedding model.

Scale design (100 TB corpus):

- ``doc_term_stats`` is the single corpus pass: explode tokens → ONE
  hash aggregation keyed (doc, term) with map-side partials. Document
  frequency and average length derive from that table, never from a
  second raw scan.
- ``bm25_scores`` filters the (doc, term) table to the QUERY'S terms
  with a scan predicate (`isin` over a handful of literals) BEFORE any
  join — the shuffled state is |matching docs × query terms|, not the
  corpus. The per-term df table for those terms is a broadcast.
- Corpus-level scalars (N, avg doclen) ride a 1-row broadcast cross
  join (lazy, no driver collect).
- Float discipline: scores are IEEE doubles with a fixed operand
  order; the driver-gate query emits the INTEGER evidence columns
  (tf/df/doclen/match counts — exact, order-independent) and the float
  BM25/TF-IDF math is pinned to a pure-Python reference in
  ``tests/test_retrieval.py`` — the same split the bigram-LM operator
  uses to avoid cross-engine ``ln`` last-ulp drift.
"""

from __future__ import annotations

import math

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
    "tokenize_terms",
    "doc_term_stats",
    "tfidf_vectors",
    "tfidf_top_terms",
    "bm25_scores",
    "py_bm25",
    "Bm25Transformer",
    "TfidfTransformer",
]

# ASCII whitespace split — matches RE2/DuckDB '\s+' exactly (the
# Unicode-whitespace parity constraint documented on the model-score
# oracle applies here too)
_WS = "[ \\t\\n\\r\\f\\x0b]+"


def tokenize_terms(text_col, lowercase: bool = True):
    """Whitespace terms of a text column as an array expression."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(F.trim(c), _WS), lambda t: t != "")


def doc_term_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool = True,
) -> DataFrame:
    """The corpus pass: one row per (doc, term) with the term frequency
    and the document's total length — everything TF-IDF/BM25 needs.
    ONE shuffle, keyed (doc, term); ``doc_len`` is a window-free
    sum over the same grouping via a second tiny agg on the doc key
    that Spark pipelines off the first (both partial-aggregated).

    NULL doc ids are excluded BEFORE tokenizing: every consumer's
    corpus size N is ``count_distinct(id)`` (NULL-excluding), so a
    NULL-id group contributing to df would let df exceed N and flip
    ln(N/df) negative (ADVICE r12) — the document universe for df and
    N must be the same."""
    toks = docs.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_terms(text_col, lowercase)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    lens = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    return tf.join(lens, "doc_id")


def tfidf_vectors(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool = True,
    min_df: int = 1,
) -> DataFrame:
    """Per-(doc, term) TF-IDF weights: ``tf × ln(N / df)`` (plain IDF;
    BM25's smoothed variant lives in :func:`bm25_scores`). ``min_df``
    prunes hapax noise terms before the weight join. Returns
    (doc_id, term, tf, df, tfidf)."""
    if min_df < 1:
        raise TransformationError("tfidf min_df must be >= 1")
    stats = doc_term_stats(docs, id_col, text_col, lowercase)
    n_docs = docs.select(
        F.count_distinct(F.col(id_col)).alias("_n_docs")
    )
    df_table = (
        stats.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
    )
    return (
        stats.join(df_table, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.col("_n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("tfidf"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 1,
    max_df_frac: float | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document top-k TF-IDF keywords — the extraction read over
    a corpus (:func:`tfidf_vectors` gives the full weight matrix;
    this ranks it per document and keeps the k most characteristic
    terms — doc tagging, index keywords, cluster labeling).

    Ranking determinism (the cross-engine contract): the raw weight
    ``tf·ln(N/df)`` ends in a transcendental whose last ulp differs
    between engines, so ranking on it directly could flip near-ties.
    Instead the IDF is nano-quantized FIRST — ``idf_q =
    round(ln(N/df)·1e9)``, the repo's 9-dp posture (psi_drift/ndcg) —
    and the ranking key ``score_q = tf·idf_q`` is an EXACT long
    product; ties break on the term string. ``tfidf`` is published as
    ``score_q/1e9``, i.e. tf × the 9-dp-rounded idf BY DEFINITION —
    documented semantics, not an approximation of something else.

    Filters: ``min_df`` prunes hapax noise; ``max_df_frac`` drops
    corpus-stopwords (terms in more than that fraction of documents —
    df > frac·N compared in doubles both engines compute identically).

    Plan at 100 TB: tokenize → ONE (doc, term) shuffle for tf; the
    vocabulary-sized df table joins back on the term key (both sides
    hash-partitioned on term); N attaches as a 1-row broadcast; the
    top-k window partitions on the DOCUMENT key (WindowGroupLimit
    pushes k before the sort — parallel across docs, never global).

    Output: ``doc_id, rank, term, tf, df, tfidf`` — k rows per doc
    (fewer when the filtered vocabulary is smaller)."""
    if int(k) < 1:
        raise TransformationError("tfidf_top_terms requires k >= 1")
    if int(min_df) < 1:
        raise TransformationError(
            "tfidf_top_terms requires min_df >= 1"
        )
    if max_df_frac is not None and not 0.0 < float(max_df_frac) <= 1.0:
        raise TransformationError(
            "tfidf_top_terms requires 0 < max_df_frac <= 1"
        )
    from pyspark.sql import Window

    stats = doc_term_stats(docs, id_col, text_col, lowercase)
    n_docs = docs.select(
        F.count_distinct(F.col(id_col)).alias("_n_docs")
    )
    df_table = (
        stats.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= int(min_df))
    )
    j = stats.join(df_table, "term").join(F.broadcast(n_docs))
    if max_df_frac is not None:
        j = j.where(
            F.col("df").cast("double")
            <= F.lit(float(max_df_frac)) * F.col("_n_docs").cast("double")
        )
    idf_q = F.round(
        F.log(
            F.col("_n_docs").cast("double") / F.col("df").cast("double")
        )
        * F.lit(1e9)
    ).cast("long")
    j = j.withColumn("_sq", F.col("tf").cast("long") * idf_q)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("_sq"), F.asc("term")
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            "doc_id",
            "rank",
            "term",
            F.col("tf").cast("long").alias("tf"),
            "df",
            (F.col("_sq").cast("double") / F.lit(1e9)).alias("tfidf"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    top_k: int | None = None,
) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a term query:
    ``Σ_t idf(t) × tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))`` with the
    standard smoothed ``idf = ln(1 + (N−df+0.5)/(df+0.5))``.

    Returns (doc_id, n_match_terms, sum_tf, doc_len, bm25) for every
    document matching ≥ 1 query term; ``top_k`` adds an ordered limit
    (ties broken on doc_id → TakeOrderedAndProject, never a global
    sort). The integer evidence columns are the cross-engine-exact
    part; the float score is pinned to :func:`py_bm25` in tests."""
    if not query_terms:
        raise TransformationError("bm25 requires at least one query term")
    terms = [t.lower() if lowercase else t for t in query_terms]
    stats = doc_term_stats(docs, id_col, text_col, lowercase)
    # scan predicate FIRST: only query-term postings ever join/shuffle.
    # hits (query-term postings — tiny) is referenced twice (df table +
    # probe) and scalars once more; un-pinned, each reference re-ran
    # the whole tokenize+groupBy pipeline (12 scans / 15 exchanges,
    # r12 audit) — pin the two bounded relations, scores unchanged
    hits = stats.where(F.col("term").isin(terms)).localCheckpoint(eager=False)
    scalars = stats.select("doc_id", "doc_len").distinct().agg(
        F.count("*").alias("_n_docs"),
        (F.sum("doc_len").cast("double") / F.count("*")).alias("_avg_len"),
    ).localCheckpoint(eager=False)
    df_table = hits.groupBy("term").agg(F.count("*").alias("df"))
    idf = (
        F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
    )
    tf_d = F.col("tf").cast("double")
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("_avg_len")
    )
    contrib = idf * (tf_d * F.lit(k1 + 1.0)) / norm
    out = (
        hits.join(F.broadcast(df_table), "term")
        .join(F.broadcast(scalars))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_match_terms"),
            F.sum("tf").alias("sum_tf"),
            F.first("doc_len").alias("doc_len"),
            F.sum(contrib).alias("bm25"),
        )
    )
    if top_k is not None:
        out = out.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(top_k)
    return out


def py_bm25(
    corpus: dict[int, list[str]],
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> dict[int, float]:
    """Pure-Python BM25 reference (the float pin for tests): identical
    formula and operand order as :func:`bm25_scores`."""
    n = len(corpus)
    avg_len = sum(len(t) for t in corpus.values()) / n
    df = {
        q: sum(1 for toks in corpus.values() if q in toks) for q in query_terms
    }
    out: dict[int, float] = {}
    for doc, toks in corpus.items():
        score = 0.0
        for q in query_terms:
            tf = toks.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            norm = tf + k1 * ((1.0 - b) + b * len(toks) / avg_len)
            score += idf * (tf * (k1 + 1.0)) / norm
        if score != 0.0:
            out[doc] = score
    return out


class Bm25Transformer(_BaseTransformer):
    """YAML step ``type: bm25``: rank the pipeline's documents against
    ``queryTerms``. Options: ``idColumn``, ``textColumn`` (default
    ``text``), ``queryTerms`` (csv, required), ``k1``/``b``, ``topK``,
    ``lowercase`` (default true)."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        if not _split_csv(opts.get("queryTerms")):
            errors.append("bm25 requires 'queryTerms'")
        for key, default in (("idColumn", None), ("textColumn", "text")):
            col = opts.get(key, default)
            if not col:
                errors.append(f"bm25 requires '{key}'")
            elif col not in df.columns:
                errors.append(f"{key} not in input schema: {col}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        top_k = opts.get("topK")
        return bm25_scores(
            df,
            id_col=opts["idColumn"],
            text_col=opts.get("textColumn", "text"),
            query_terms=_split_csv(opts.get("queryTerms")),
            k1=float(opts.get("k1", 1.2)),
            b=float(opts.get("b", 0.75)),
            lowercase=str(opts.get("lowercase", "true")).lower() != "false",
            top_k=int(top_k) if top_k is not None else None,
        )


class TfidfTransformer(_BaseTransformer):
    """YAML step ``type: tfidf``: per-document top-k TF-IDF keywords.
    Options: ``idColumn`` (required), ``textColumn`` (default
    ``text``), ``k`` (default 5), ``minDf`` (default 1),
    ``maxDfFrac`` (optional stopword cut), ``lowercase`` (default
    true)."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        for key, default in (("idColumn", None), ("textColumn", "text")):
            col = opts.get(key, default)
            if not col:
                errors.append(f"tfidf requires '{key}'")
            elif col not in df.columns:
                errors.append(f"{key} not in input schema: {col}")
        for key, lo in (("k", 1), ("minDf", 1)):
            try:
                if int(opts.get(key, lo)) < lo:
                    errors.append(f"tfidf '{key}' must be an int >= {lo}")
            except (TypeError, ValueError):
                errors.append(f"tfidf '{key}' must be an int >= {lo}")
        if opts.get("maxDfFrac") is not None:
            try:
                if not 0.0 < float(opts["maxDfFrac"]) <= 1.0:
                    errors.append("tfidf 'maxDfFrac' must be in (0, 1]")
            except (TypeError, ValueError):
                errors.append("tfidf 'maxDfFrac' must be numeric")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        frac = opts.get("maxDfFrac")
        return tfidf_top_terms(
            df,
            id_col=opts["idColumn"],
            text_col=opts.get("textColumn", "text"),
            k=int(opts.get("k", 5)),
            min_df=int(opts.get("minDf", 1)),
            max_df_frac=float(frac) if frac is not None else None,
            lowercase=str(opts.get("lowercase", "true")).lower() != "false",
        )
