"""Staleness-keyed gate-window rotation (VERDICT r8 ask #2).

The driver's correctness gate records only the FIRST 50 entries of
``__spark_entry__.queries()``. With 237 queries sharing that window,
a query's driver-recorded green row can silently go stale: the row
dates from round N but the operator's code was edited in round N+k
with no later driver adjudication.

This tool computes, for every declared query:

- ``recorded_round`` / ``recorded_ts`` — the last round whose
  CORRECTNESS_r0N.json contains a row for the query, and the commit
  timestamp of that round's ``round N: verdict/...`` record commit;
- ``touched_ts`` — the most recent code-touch relevant to the query:
  the max over (a) git-blame committer-time of the query's
  ``q_*`` wrapper function lines in ``__spark_entry__.py`` and
  (b) ``git log -1`` of every ``etl_spark_gradle_spark`` module the
  wrapper's source references;
- ``staleness`` — ``touched_ts - recorded_ts`` in seconds. Positive
  means the code under the green row changed AFTER the driver last
  saw it.

Output: the recommended 50-slot window = pinned head (ecdf and its
prefix-sum co-witnesses, VERDICT r8 ask #1) + the stalest queries in
descending staleness, ties broken by oldest recorded round. Run with
``--emit-window`` to print the python list literal for
``__spark_entry__._GATE_WINDOW``.

Usage: python tools/rotation.py [--emit-window] [--top N]
"""

from __future__ import annotations

import ast
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path("/root/repo")
sys.path.insert(0, str(REPO))

# queries that must lead the window regardless of staleness: ecdf is
# the only historically-red row (r6+r7) and its HUGEINT-oracle fix has
# never been driver-adjudicated; its prefix-sum siblings ride along as
# co-witnesses of the shared stats._prefix_sums path. The pins release
# automatically once any CORRECTNESS_r09+ file shows ecdf green
# (mirroring tests/test_gate_window.py's pin lock).
def _pinned() -> list[str]:
    for f in REPO.glob("CORRECTNESS_r*.json"):
        n = int(re.search(r"r(\d+)", f.name).group(1))
        if n >= 9:
            row = json.loads(f.read_text()).get("ecdf", {})
            if row.get("hash_match") is True:
                return []
    return ["ecdf", "quantiles_linear", "weighted_quantiles"]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def round_record_commits() -> dict[int, int]:
    """round number -> unix timestamp of its driver record commit."""
    out = _git("log", "--all", "--format=%H %ct %s")
    rounds: dict[int, int] = {}
    for line in out.splitlines():
        m = re.match(r"(\S+) (\d+) round (\d+): verdict/", line)
        if m:
            rounds.setdefault(int(m.group(3)), int(m.group(2)))
    return rounds


def record_ts(r: int, rounds: dict[int, int]) -> int:
    """Timestamp of round *r*'s driver record.

    Prefers the ``round N: verdict/...`` record commit. When the
    CORRECTNESS file exists on disk but the record commit hasn't landed
    yet (mid-round: the driver drops CORRECTNESS_r0N.json BEFORE its
    verdict commit), fall back to the file's mtime — never 0. The r9
    epoch-0 fallback ranked the 50 just-verified queries as the
    catalog's STALEST (≈496,000 h) and would have burned the entire
    next gate window re-testing them (VERDICT r9 "What's wrong").
    """
    if r in rounds:
        return rounds[r]
    f = REPO / f"CORRECTNESS_r{r:02d}.json"
    if f.exists():
        return int(f.stat().st_mtime)
    return 0


def last_recorded() -> dict[str, int]:
    """query name -> last round with a driver row (any color)."""
    last: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", f.name).group(1))
        for q in json.loads(f.read_text()):
            last[q] = max(last.get(q, 0), n)
    return last


def blame_line_times(path: str) -> list[int]:
    """1-indexed committer-time per line of *path* at HEAD."""
    out = _git("blame", "--line-porcelain", "HEAD", "--", path)
    times: list[int] = []
    cur = 0
    for line in out.splitlines():
        if line.startswith("committer-time "):
            cur = int(line.split()[1])
        elif line.startswith("\t"):
            times.append(cur)
    return times


def module_touch_times() -> dict[str, int]:
    """module file -> last commit unix time."""
    times: dict[str, int] = {}
    for f in REPO.glob("etl_spark_gradle_spark/**/*.py"):
        rel = str(f.relative_to(REPO))
        out = _git("log", "-1", "--format=%ct", "--", rel).strip()
        if out:
            times[rel] = int(out)
    return times


_MOD_RE = re.compile(r"etl_spark_gradle_spark(?:\.\w+)*")


def query_touch_times() -> dict[str, int]:
    """query name -> max(blame time of wrapper fn, imports' log time)."""
    src = (REPO / "__spark_entry__.py").read_text()
    tree = ast.parse(src)
    line_times = blame_line_times("__spark_entry__.py")
    mod_times = module_touch_times()
    tpch_time = mod_times.get("etl_spark_gradle_spark/tpch.py", 0)

    # map q_* function -> (line range, referenced modules)
    fn_info: dict[str, tuple[int, int, set[str]]] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            seg = ast.get_source_segment(src, node) or ""
            mods = set(_MOD_RE.findall(seg))
            fn_info[node.name] = (node.lineno, node.end_lineno, mods)

    import __spark_entry__ as entrymod

    out: dict[str, int] = {}
    for name, fn in entrymod.queries().items():
        fn_name = getattr(fn, "__name__", "")
        if fn_name in fn_info:
            lo, hi, mods = fn_info[fn_name]
            t = max(line_times[lo - 1 : hi], default=0)
            for m in mods:
                rel = m.replace(".", "/") + ".py"
                t = max(t, mod_times.get(rel, 0))
                pkg = m.replace(".", "/") + "/__init__.py"
                t = max(t, mod_times.get(pkg, 0))
        else:  # tpch.QUERIES lambdas and other registry callables
            t = tpch_time
        out[name] = t
    return out


# Rows-only queries whose oracle can NEVER go green (`err:
# no_oracle` forever — eigendecomposition / Newton iterations are
# not SQL-expressible). A window slot spent here is a stale query
# not re-recorded (VERDICT r11 ask #3). REMOVE a name from this set
# only when its implementation changes semantically and the new
# rows-only record is worth a slot.
_EXCLUDE_NO_ORACLE = {"cox", "pca"}

# Queries whose OPERATOR SEMANTICS changed this round — the honest
# re-record signal the coarse module-touch heuristic cannot give
# (one edit to stats.py marks every stats-family query "touched",
# which is exactly the noise that starved the r11 window; VERDICT
# r11 "What's wrong" #3). Maintained by hand each round, emptied
# after the driver records them.
# Round 12: the five ADVICE-r12 fixes + the p-value columns
# (chi_square / anova_f / brown_forsythe / kruskal_wallis /
# cochran_armitage / mantel_haenszel / logrank gained `p_value`;
# fdr_by's harmonic grain moved 1e9 -> 1e15; tfidf's NULL-id
# universe; aalen_johansen's fractional-cause rejection).
_ROUND_PINS = [
    "chi_square",
    "anova",
    "brown_forsythe",
    "kruskal_wallis",
    "cochran_armitage",
    "mantel_haenszel",
    "logrank",
    "fdr_by",
    "tfidf",
    "aalen_johansen",
]


def build_queue() -> list[dict]:
    """Ranking policy (round-12 rework, VERDICT r11 ask #2): the
    driver's 50-slot window is the ONLY hard evidence channel, and
    with a 300+ query registry the stale tail ages ~50 rows/round
    unless it is the PRIMARY fill. Order:

    1. never-driver-recorded queries (recorded_round 0);
    2. oldest ``recorded_round`` first — the stale tail drains at
       ~(50 - pins) rows per round by construction;
    3. ties: most code-touch-stale first, then name.

    ``_ROUND_PINS`` (semantic changes) and ``_EXCLUDE_NO_ORACLE``
    are applied by the window assembly, not here — the queue always
    covers every declared query."""
    rounds = round_record_commits()
    recorded = last_recorded()
    touched = query_touch_times()
    rows = []
    for name, t_touch in touched.items():
        r = recorded.get(name, 0)
        t_rec = record_ts(r, rounds) if r else 0
        rows.append(
            {
                "query": name,
                "recorded_round": r,
                "recorded_ts": t_rec,
                "touched_ts": t_touch,
                "staleness_s": t_touch - t_rec,
            }
        )
    rows.sort(
        key=lambda x: (x["recorded_round"], -x["staleness_s"], x["query"])
    )
    return rows


def max_row_age_warnings(rows: list[dict], budget: int = 5) -> list[str]:
    """Staleness-budget guard (VERDICT r11 ask #7): WARN for every
    query whose last driver row is more than *budget* rounds behind
    the current round (= max recorded round + 1, the round now being
    built). Excluded rows-only queries don't age."""
    current = max((r["recorded_round"] for r in rows), default=0) + 1
    warns = []
    for r in rows:
        if r["query"] in _EXCLUDE_NO_ORACLE:
            continue
        age = current - r["recorded_round"]
        if r["recorded_round"] > 0 and age > budget:
            warns.append(
                f"WARN: {r['query']} last driver-recorded r"
                f"{r['recorded_round']:02d} ({age} rounds ago; budget "
                f"{budget})"
            )
    return warns


def main() -> int:
    args = sys.argv[1:]
    top = 50
    if "--top" in args:
        top = int(args[args.index("--top") + 1])
    rows = build_queue()
    declared = {r["query"] for r in rows}
    window = [q for q in _pinned() if q not in _EXCLUDE_NO_ORACLE]
    for q in _ROUND_PINS:
        if q in declared and q not in window and len(window) < top:
            window.append(q)
    for row in rows:
        if len(window) >= top:
            break
        if (
            row["query"] not in window
            and row["query"] not in _EXCLUDE_NO_ORACLE
        ):
            window.append(row["query"])
    warns = max_row_age_warnings(rows)
    if "--emit-window" in args:
        for w in warns:
            print(f"# {w}", file=sys.stderr)
        print("_GATE_WINDOW = [")
        for name in window:
            print(f'    "{name}",')
        print("]")
        return 0
    print(f"{'query':<28} {'rec_round':>9} {'staleness_h':>12}")
    for row in rows:
        mark = "*" if row["query"] in window else " "
        print(
            f"{mark}{row['query']:<27} {row['recorded_round']:>9} "
            f"{row['staleness_s'] / 3600:>12.1f}"
        )
    for w in warns:
        print(w)
    print(f"\nwindow ({len(window)}): {window}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
