"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same parquet tables, then compare row count,
column names, and values (order-insensitive, exact for non-floats).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --all-sfs [query ...]
       python tools/check_oracle.py --timings [sf_dir] [query ...]

``--all-sfs`` sweeps BOTH sf0.01 and sf0.1 in one invocation (exit 1 if
either has any mismatch) so the per-round verification can't silently
narrow to one scale factor.

``--timings`` (VERDICT r8 ask #4) additionally records per-query
Spark-side wall seconds to ``SWEEP_TIMINGS.json`` and gates each query
at ``TIMING_GATE_X`` x its floor in ``SWEEP_FLOORS.json`` (committed
snapshot; exit 1 on any breach). Only 24 of 237 queries have bench.py
floors — this catches a 10x plan regression in the other 213, which
correctness sweeps alone would never see. The floor file is created on
first run; re-snapshot deliberately (delete + rerun) after an
intentional plan change, as bench floors are.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = canon(spark_pdf), canon(duck_pdf)
    for c in s.columns:
        # dtype-CLASS parity (int vs float vs bool vs object): the
        # driver's value hash is representation-sensitive — an int64
        # Spark column vs a float64 DuckDB column hash-mismatches even
        # when every value compares equal (`3356` vs `3356.0`). That is
        # exactly how the r6/r7 `ecdf` red row hid from this checker:
        # DuckDB renders sum(BIGINT) window results as HUGEINT → pandas
        # float64, and the oracle lacked a CAST AS BIGINT. A value-only
        # compare passes int==float, so flag the class mismatch itself.
        def _cls(dt):
            if pd.api.types.is_bool_dtype(dt):
                return "bool"
            if pd.api.types.is_integer_dtype(dt):
                return "int"
            if pd.api.types.is_float_dtype(dt):
                return "float"
            return "other"
        sk, dk = _cls(s[c].dtype), _cls(d[c].dtype)
        if sk != dk and not (s[c].isna().any() or d[c].isna().any()):
            problems.append(
                f"col {c}: dtype class spark={s[c].dtype}({sk}) "
                f"duck={d[c].dtype}({dk}) — driver hash would mismatch"
            )
    for c in s.columns:
        # vectorized equality (the old per-cell python loop would crawl
        # at sf>=1): equal when values compare equal OR both sides null
        sv, dv = s[c], d[c]
        try:
            raw = np.asarray(sv.values == dv.values)
            if raw.shape != (len(s),):
                raise TypeError("non-elementwise comparison")
            eq = raw | (sv.isna().values & dv.isna().values)
        except (TypeError, ValueError):  # incomparable dtypes → string fallback
            eq = sv.map(str).values == dv.map(str).values
        mismatch = int((~eq).sum())
        if mismatch:
            msg = f"col {c}: {mismatch} value mismatches"
            if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(dv):
                diffs = (sv[~eq] - dv[~eq]).abs()
                if diffs.notna().any():
                    msg += f" (max float diff {diffs.max():.3e})"
            problems.append(msg)
    return problems


FLOORS_PATH = "/root/repo/SWEEP_FLOORS.json"
TIMINGS_PATH = "/root/repo/SWEEP_TIMINGS.json"
# coarse gate: the sweep runs one query at a time on a machine with
# noisy-neighbor bursts (observed ~1.3-1.5x drift on bench floors), so
# gate at 3x — this is a 10x-plan-regression tripwire, not a benchmark.
TIMING_GATE_X = 3.0
# floors below this are pure fixed-cost noise (session scheduling,
# toPandas overhead); gate those on an absolute budget instead.
TIMING_MIN_FLOOR_S = 0.5


def check_timings(timings: dict[str, float]) -> list[str]:
    """Compare a sweep's per-query seconds against the committed
    floors; return breach messages. Missing floors are added (the
    file is the snapshot) rather than failed."""
    import json
    import os

    floors: dict[str, float] = {}
    if os.path.exists(FLOORS_PATH):
        with open(FLOORS_PATH, encoding="utf-8") as f:
            floors = json.load(f)
    breaches = []
    new = dict(floors)
    for name, sec in timings.items():
        floor = floors.get(name)
        if floor is None:
            new[name] = round(sec, 3)
            continue
        limit = max(floor * TIMING_GATE_X, TIMING_MIN_FLOOR_S * TIMING_GATE_X)
        if sec > limit:
            breaches.append(
                f"{name}: {sec:.2f}s > {TIMING_GATE_X}x floor {floor:.2f}s"
            )
    if new != floors:
        with open(FLOORS_PATH, "w", encoding="utf-8") as f:
            json.dump(dict(sorted(new.items())), f, indent=1, sort_keys=True)
        added = len(new) - len(floors)
        print(f"snapshotted {added} new floor(s) into {FLOORS_PATH}")
    with open(TIMINGS_PATH, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(timings.items())), f, indent=1, sort_keys=True)
    return breaches


def main() -> int:
    args = sys.argv[1:]
    timed = "--timings" in args
    if timed:
        args.remove("--timings")
    if args and args[0] == "--all-sfs":
        if timed:
            # ADVICE r9: this combination used to silently drop the
            # timings gate — the flag was stripped and this branch
            # returned before any timing was collected, so a sweep
            # intending to gate both SFs gated nothing
            print(
                "error: --timings cannot be combined with --all-sfs "
                "(SWEEP_TIMINGS.json floors are single-SF); run "
                "--timings per sf_dir instead"
            )
            return 2
        only = set(args[1:])
        rc = 0
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            print(f"===== sweep {sf} =====", flush=True)
            rc |= run_sweep(sf, only)
        return rc
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    timings: dict[str, float] | None = {} if timed else None
    rc = run_sweep(sf_dir, set(args[1:]), timings=timings)
    if timed:
        breaches = check_timings(timings)
        for b in breaches:
            print(f"SLOW  {b}")
        if breaches:
            return 1
        print(f"timings: {len(timings)} queries within "
              f"{TIMING_GATE_X}x of their floors")
    return rc


def _purge_scratch() -> None:
    """Streaming queries land per-run uuid dirs under the repo's
    ephemeral .scratch; repeated local sweeps accumulate them
    (measured: 969 dirs / 268 MB after one round of iterating), and
    streaming-query wall times degrade with the buildup — a 1.1 s
    floor read 4.2 s purely from scratch litter. The dir is ephemeral
    by design, so every sweep starts clean (floor comparisons then
    measure the operator, not the litter)."""
    import shutil

    scratch = "/root/repo/.scratch"
    if os.path.isdir(scratch):
        for entry in os.listdir(scratch):
            shutil.rmtree(os.path.join(scratch, entry), ignore_errors=True)


def run_sweep(
    sf_dir: str, only: set[str], timings: dict[str, float] | None = None
) -> int:
    import __spark_entry__ as entrymod
    from etl_spark_gradle_spark.session import get_spark

    _purge_scratch()

    spark = get_spark(app_name="verify-oracle", master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})
    if timings is not None:
        # one untimed throwaway action so session warm-up (JVM JIT,
        # codegen compiler, shuffle machinery, parquet footer reads) is
        # not charged to whichever query happens to run first — r12's
        # sweep read chi_square at 8.96 s vs its ~1.3 s isolated warm
        # cost purely because it led the sweep
        spark.read.parquet(f"{sf_dir}/orders.parquet").groupBy(
            "o_orderstatus"
        ).count().collect()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            t0 = time.monotonic()
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
            if timings is not None:
                timings[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            # a dead JVM/py4j gateway would cascade FAILs through every
            # remaining query — detect and restart the session
            try:
                spark.sql("SELECT 1").collect()
            except Exception:
                print("WARN  session lost — restarting SparkSession")
                try:
                    spark.stop()
                except Exception:
                    pass
                from pyspark.sql import SparkSession

                SparkSession._instantiatedSession = None
                SparkSession._activeSession = None
                spark = get_spark(
                    app_name="verify-oracle", master="local[8]",
                    conf={"spark.sql.shuffle.partitions": "8"},
                )
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (rows-only check)")
            if len(spark_pdf) == 0:
                print(f"WARN  {name}: 0 rows")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            failed.append(name)
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows")
    print(f"\n{len(failed)} failing: {failed}" if failed else "\nall green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
