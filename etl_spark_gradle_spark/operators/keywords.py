"""Dictionary keyword tagging: which blocklist/topic phrases does each
document contain?

Beyond-reference operator (the reference has no text surface at all —
SURVEY.md §2.3 stops at relational shapes): the curation primitive
behind blocklist filtering, topic routing, licensing-string detection,
and "flag documents mentioning any of these N entities" sweeps over a
training corpus. Output is the FLAT match relation ``(…keys, keyword)``
— one row per (document, distinct matched phrase) — which feeds
directly into a semi/anti join (drop matches), an aggregation (phrase
frequency report), or a tag-array collect.

Two engines, same results (property-tested against each other):

- ``engine='expr'`` (default to 256 phrases): the dictionary becomes an
  ARRAY of literals and the scan evaluates ``filter(array, p ->
  contains(text, p))`` + ``explode`` — pure Catalyst, rides the
  parquet scan inside whole-stage codegen, zero shuffle, zero Python.
  Cost is O(|phrases| · |text|) per row — the right trade while the
  dictionary is small enough to live in the instruction stream.
- ``engine='automaton'``: a pure-Python Aho-Corasick automaton
  (Aho & Corasick 1975, CACM 18(6)) built ONCE per executor from the
  broadcast dictionary, streamed over Arrow batches with
  ``mapInPandas`` — O(|text| + matches) per row regardless of
  dictionary size, the scale path for 10^4..10^6-phrase dictionaries
  where the literal array would blow past codegen limits and the
  per-phrase rescan would dominate. Still zero shuffle: the only data
  movement is the dictionary broadcast (bytes per phrase).

Both engines report SET semantics — each phrase at most once per
document, every phrase that occurs anywhere (overlapping and nested
occurrences included: the automaton's dict-suffix links are what make
"a" inside "ab" reportable, the exact case a one-pass regex
alternation silently drops). Matching is raw substring containment;
pass ``lowercase=True`` to fold both sides for case-insensitive tags.
At 100 TB this is a scan-riding narrow stage: partition count and
pushdown are untouched, so it composes freely with any downstream
dedup/filter plan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from etl_spark_gradle_spark.operators.relational import (
    TransformationError,
    _BaseTransformer,
    _split_csv,
)
from etl_spark_gradle_spark.plans.config import (
    TransformationConfig,
    ValidationResult,
)

__all__ = ["keyword_matches", "KeywordTagTransformer", "AhoCorasick"]

# engine-selection threshold, MEASURED at sf0.1 documents (5k docs,
# ~3 KB texts, local[32]): the JVM contains-array path scales linearly
# with dictionary size (300→0.79s, 600→1.53s, 1500→3.2s, 4000→7.6s)
# while the per-task Python automaton is flat (~1.0s at every size) —
# crossover ≈ 450 phrases. Below it the zero-Python codegen path wins;
# above it the single-pass automaton does.
_EXPR_MAX = 400


class AhoCorasick:
    """Minimal Aho-Corasick matcher: goto trie + fail links + dict-suffix
    output sets. ``find_set`` returns the DISTINCT patterns occurring in
    a text. Pure stdlib on purpose (no C extension in this env); a
    drop-in like ``pyahocorasick`` slots in behind the same method."""

    def __init__(self, patterns: list[str]):
        self.patterns = patterns
        # trie: list of dicts char -> state; output: pattern indexes
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[set[int]] = [set()]
        for idx, pat in enumerate(patterns):
            state = 0
            for ch in pat:
                nxt = self.goto[state].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append(set())
                    nxt = len(self.goto) - 1
                    self.goto[state][ch] = nxt
                state = nxt
            self.out[state].add(idx)
        # BFS fail links; merge output sets along fails (dict-suffix links)
        from collections import deque

        self.fail = [0] * len(self.goto)
        queue = deque()
        for ch, s in self.goto[0].items():
            queue.append(s)
        while queue:
            state = queue.popleft()
            for ch, nxt in self.goto[state].items():
                queue.append(nxt)
                f = self.fail[state]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0)
                self.out[nxt] |= self.out[self.fail[nxt]]

    def find_set(self, text: str) -> set[str]:
        # hot loop: locals bound once (attribute loads per character
        # cost ~25% of the scan — measured 0.235s → 0.179s over the
        # sf0.1 corpus); the in-dict fast path skips the fail walk for
        # the common "transition exists" case
        goto = self.goto
        fail = self.fail
        out = self.out
        state = 0
        found: set[int] = set()
        for ch in text:
            g = goto[state]
            if ch in g:
                state = g[ch]
            else:
                while state and ch not in goto[state]:
                    state = fail[state]
                state = goto[state].get(ch, 0)
            o = out[state]
            if o:
                found |= o
        patterns = self.patterns
        return {patterns[i] for i in found}


# one-slot automaton cache, PID-guarded: a reused Python worker keeps
# the built automaton across tasks (spark.python.worker.reuse default);
# the PID check discards state inherited through fork. One slot bounds
# memory — repeated calls with the SAME dictionary (every task of a
# stage) hit, a new dictionary evicts.
_AC_CACHE: dict = {}


def _automaton_for(needles: list[str]) -> "AhoCorasick":
    import os

    key = (os.getpid(), hash(tuple(needles)))
    hit = _AC_CACHE.get("slot")
    if hit is not None and hit[0] == key and hit[1].patterns == needles:
        return hit[1]
    ac = AhoCorasick(needles)
    _AC_CACHE["slot"] = (key, ac)
    return ac


def keyword_matches(
    df: DataFrame,
    text_col: str,
    phrases: list[str],
    id_cols: list[str] | None = None,
    lowercase: bool = False,
    engine: str | None = None,
    keyword_col: str = "keyword",
) -> DataFrame:
    """Flat match relation: one row per (``id_cols``…, distinct phrase
    contained in ``text_col``). Documents matching nothing emit no rows
    (anti-join against this relation = the clean corpus). ``engine``
    defaults to ``'expr'`` up to 256 phrases, ``'automaton'`` above.
    """
    if text_col not in df.columns:
        raise TransformationError(f"text column not in schema: {text_col}")
    if not phrases:
        raise TransformationError("keyword_matches requires a non-empty phrase list")
    if any(not p for p in phrases):
        raise TransformationError("empty string is not a valid phrase")
    # duplicates are checked on the MATCHED form: with lowercase=True,
    # "The" and "the" fold to one needle — left in, the expr path's
    # literal array would emit the row twice while the automaton's
    # output set dedups, silently diverging the two engines
    folded = [p.lower() for p in phrases] if lowercase else phrases
    if len(set(folded)) != len(folded):
        raise TransformationError(
            "duplicate phrases in dictionary"
            + (" after lowercase folding" if lowercase else "")
        )
    id_cols = id_cols if id_cols is not None else [c for c in df.columns if c != text_col]
    for c in id_cols:
        if c not in df.columns:
            raise TransformationError(f"id column not in schema: {c}")
    if keyword_col in id_cols:
        raise TransformationError(f"keyword column name collides with id column: {keyword_col}")
    engine = engine or ("expr" if len(phrases) <= _EXPR_MAX else "automaton")
    if engine not in ("expr", "automaton"):
        raise TransformationError(f"unknown engine '{engine}' (expr | automaton)")

    if engine == "expr":
        text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
        needles = [p.lower() for p in phrases] if lowercase else phrases
        matched = F.filter(
            F.array(*[F.lit(p) for p in needles]),
            lambda p: text.contains(p),
        )
        # null text → null predicate → element dropped by filter() →
        # empty array → explode emits nothing: null docs match nothing.
        return df.select(*id_cols, F.explode(matched).alias(keyword_col))

    needles = [p.lower() for p in phrases] if lowercase else phrases
    schema = StructType(
        [df.schema[c] for c in id_cols] + [StructField(keyword_col, StringType(), False)]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # automaton cached across tasks of a REUSED worker (guide
        # posture: heavyweight init once per worker, not per task) —
        # works because this function lives in an importable module
        ac = _automaton_for(needles)
        find_set = ac.find_set
        for pdf in batches:
            out_ids: dict[str, list] = {c: [] for c in id_cols}
            out_kw: list[str] = []
            texts = pdf[text_col]
            if lowercase:
                texts = texts.str.lower()
            # prefetch id columns as plain lists ONCE per batch:
            # per-match pdf[c].iloc[i] scalar access dominated the
            # stage (measured 0.57s → 0.20s over the sf0.1 corpus)
            ids = {c: pdf[c].to_list() for c in id_cols}
            for i, text in enumerate(texts):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                for kw in sorted(find_set(text)):
                    for c in id_cols:
                        out_ids[c].append(ids[c][i])
                    out_kw.append(kw)
            out = pd.DataFrame(out_ids)
            out[keyword_col] = pd.Series(out_kw, dtype="object")
            yield out[[*id_cols, keyword_col]]

    return df.select(*id_cols, text_col).mapInPandas(scan, schema=schema)


class KeywordTagTransformer(_BaseTransformer):
    """YAML type ``keyword_tag``: ``column`` (text), ``phrases`` (CSV
    or list), optional ``idColumns`` CSV, ``lowercase``, ``engine``."""

    @staticmethod
    def _phrases(opts: dict) -> list[str]:
        raw = opts.get("phrases")
        if isinstance(raw, list):
            return [str(p) for p in raw]
        return _split_csv(raw or "")

    def validate(self, df: DataFrame, config: TransformationConfig) -> ValidationResult:
        errors = []
        opts = config.options
        col = opts.get("column")
        if not col:
            errors.append("keyword_tag requires 'column'")
        elif col not in df.columns:
            errors.append(f"column not in input schema: {col}")
        if not self._phrases(opts):
            errors.append("keyword_tag requires 'phrases' (CSV or list)")
        eng = opts.get("engine")
        if eng and eng not in ("expr", "automaton"):
            errors.append(f"unknown engine '{eng}' (expr | automaton)")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _apply(self, df, config, ctx):
        opts = config.options
        id_cols = _split_csv(opts.get("idColumns")) or None
        return keyword_matches(
            df,
            text_col=opts["column"],
            phrases=self._phrases(opts),
            id_cols=id_cols,
            lowercase=str(opts.get("lowercase", "false")).lower() == "true",
            engine=opts.get("engine"),
            keyword_col=opts.get("keywordColumn", "keyword"),
        )
