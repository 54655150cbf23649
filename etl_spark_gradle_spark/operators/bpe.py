"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016).

The brief's token counting (``operators/text.py``) measures whitespace
and BPE-ish regex tokens; this module adds the real thing: LEARN a
merge table from the corpus, then tokenize with it — the step a
training-data pipeline runs to size documents in model tokens, pack
sequences to a context length, and price a corpus in tokens/dollar.

Scale design (how tokenizers are actually trained on 100 TB):
- ``train_bpe`` never moves the corpus. ONE distributed shuffle counts
  word frequencies (explode → groupBy word, partial aggs map-side);
  the learner then runs on the top-``max_words`` (word, count) table on
  the driver — the standard compression: merge statistics over a Zipf
  vocabulary are insensitive to the long tail, and every production
  tokenizer (GPT-2's BPE, sentencepiece) trains on a bounded
  sample/vocab anyway. The driver table is capped and documented, not
  an accidental ``collect()``.
- ``bpe_tokenize`` broadcasts the merge ranks (KBs) and applies them in
  an Arrow-batched pandas UDF with a per-batch word cache — Zipf means
  the cache hit rate is enormous, so the per-word merge loop runs once
  per DISTINCT word per batch, not once per occurrence.
- Tokenization is LOSSLESS by construction: tokens partition the
  word's characters (unknown characters stay as single-char tokens —
  no UNK, no dropped bytes). The driver-gate query exploits this:
  ``sum(len(token))`` per document must equal the document's
  non-whitespace char count, an integer the DuckDB oracle computes
  independently — cross-engine proof that every character survives the
  Arrow round trip. Token-level exactness is pinned against a pure-
  Python reference implementation in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators.relational import _BaseTransformer
from etl_spark_gradle_spark.plans.config import (
    TransformationConfig,
    ValidationResult,
)

__all__ = ["train_bpe", "bpe_tokenize", "bpe_encode_word", "BpeTokenizeTransformer"]

# tokenization contract shared by train/apply/oracle: lowercase, split
# on ASCII whitespace (explicit class — Python/Java/RE2 disagree on
# Unicode \s, see the model_score precedent), drop empties
_WS_SPLIT = r"[ \t\n\f\r]+"


def _words(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), _WS_SPLIT), lambda x: x != "")


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    max_words: int = 100_000,
) -> dict:
    """Learn a BPE merge table from a corpus.

    Distributed part: one explode + word-count shuffle, then the top
    ``max_words`` words by frequency (a bounded, documented driver
    table — the learner's entire input). Driver part: classic greedy
    BPE over the (word, count) pairs — repeatedly merge the most
    frequent adjacent symbol pair (ties broken lexicographically for
    run-to-run determinism) for ``num_merges`` rounds or until no pair
    repeats.

    Returns ``{"merges": [[a, b], ...], "vocab": [...]}`` — JSON-
    serializable; persist it next to the corpus and feed it to
    ``bpe_tokenize``.
    """
    wf = (
        df.select(F.explode(_words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    freqs = {r.w: r.c for r in wf}

    symbolized = {tuple(w): c for w, c in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in symbolized.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        new_symbolized: dict[tuple, int] = {}
        for syms, c in symbolized.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_symbolized[t] = new_symbolized.get(t, 0) + c
        symbolized = new_symbolized

    vocab = sorted(
        {s for syms in symbolized for s in syms} | {a + b for a, b in merges}
    )
    return {"merges": [list(m) for m in merges], "vocab": vocab}


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: start from characters, repeatedly merge the
    lowest-rank adjacent pair. Characters never seen in training stay
    as single-char tokens — lossless, no UNK."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list,
) -> DataFrame:
    """Tokenize with a trained merge table: ``(id, tokens, n_tokens,
    n_chars)`` where ``tokens`` partition each word's characters
    (``n_chars`` = sum of token lengths = non-whitespace char count —
    the lossless invariant the gate query cross-checks).

    One Arrow-batched mapInPandas over (id, text); the merge ranks are
    closure-captured (broadcast with the task, KBs) and a per-batch
    word→tokens cache collapses the Zipf tail: the merge loop runs per
    DISTINCT word per batch.
    """
    import pandas as pd

    ranks = {(a, b): i for i, (a, b) in enumerate(tuple(m) for m in merges)}
    id_field = df.schema[id_col]
    if not id_field.dataType.typeName() in ("long", "integer", "short", "byte"):
        raise ValueError(f"id column must be integral, got {id_field.dataType}")

    import re as _re

    ws = _re.compile(_WS_SPLIT)

    def gen(it):
        # cache value carries (tokens, word char count): n_chars then
        # accumulates per WORD instead of per token (sum-of-token-lens
        # re-walked every token of every doc — the Zipf tail makes the
        # per-word add ~5x rarer than the per-token len it replaces)
        cache: dict[str, tuple[list[str], int]] = {}
        for pdf in it:
            toks_col, n_col, c_col = [], [], []
            for text in pdf["__text"]:
                toks: list[str] = []
                extend = toks.extend
                nch = 0
                for w in ws.split((text or "").lower()):
                    if not w:
                        continue
                    hit = cache.get(w)
                    if hit is None:
                        hit = (bpe_encode_word(w, ranks), len(w))
                        cache[w] = hit
                    extend(hit[0])
                    nch += hit[1]
                toks_col.append(toks)
                n_col.append(len(toks))
                c_col.append(nch)
            yield pd.DataFrame(
                {
                    "id": pdf["__id"],
                    "tokens": toks_col,
                    "n_tokens": n_col,
                    "n_chars": c_col,
                }
            )

    narrow = df.select(
        F.col(id_col).cast("long").alias("__id"), F.col(text_col).alias("__text")
    )
    return narrow.mapInPandas(
        gen, "id long, tokens array<string>, n_tokens long, n_chars long"
    )


class BpeTokenizeTransformer(_BaseTransformer):
    """YAML step ``type: bpe_tokenize``: train-and-apply in one step
    (options ``idColumn``, ``textColumn``, ``numMerges``, ``maxWords``)
    — for split train/apply, call the functions directly and persist
    the merge table."""

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        for k in ("idColumn", "textColumn"):
            if not config.options.get(k):
                errors.append(f"bpe_tokenize requires '{k}'")
            elif config.options[k] not in df.columns:
                errors.append(f"{k} not in input schema: {config.options[k]}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        model = train_bpe(
            df,
            opts["textColumn"],
            num_merges=int(opts.get("numMerges", "200")),
            max_words=int(opts.get("maxWords", "100000")),
        )
        return bpe_tokenize(df, opts["idColumn"], opts["textColumn"], model["merges"])
