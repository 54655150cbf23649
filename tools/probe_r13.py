"""Round-13 isolation probe: time registry queries in a warm session,
split build (python construction) vs action (toPandas, what the sweep
times), and optionally dump .explain("formatted") to plans/r13/.

Usage: python tools/probe_r13.py [--sf SF_DIR] [--plans SUFFIX] [--reps N] query...

Matches the sweep environment: local[8], shuffle.partitions=8, one
untimed warm-up action before the first timed query.
"""
from __future__ import annotations

import os
import sys
import time

# resolve the repo root from the script location so a git-worktree copy
# probes ITS OWN code (before-plans), not /root/repo's
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    plans_suffix = None
    reps = 3
    while args and args[0].startswith("--"):
        if args[0] == "--sf":
            sf_dir = args[1]; args = args[2:]
        elif args[0] == "--plans":
            plans_suffix = args[1]; args = args[2:]
        elif args[0] == "--reps":
            reps = int(args[1]); args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args
    if not names:
        raise SystemExit("need query names")

    import __spark_entry__ as entrymod
    from etl_spark_gradle_spark.session import get_spark

    spark = get_spark(app_name="probe-r13", master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})
    qs = entrymod.queries()

    # warm-up: one throwaway scan+agg so JVM/codegen/session startup is
    # not charged to the first probed query
    t0 = time.monotonic()
    spark.read.parquet(f"{sf_dir}/orders.parquet").groupBy("o_orderstatus").count().collect()
    print(f"# warm-up: {time.monotonic()-t0:.3f}s", flush=True)

    for name in names:
        fn = qs[name]
        for r in range(reps):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t1 = time.monotonic()
            pdf = df.toPandas()
            t2 = time.monotonic()
            print(f"{name} rep{r}: build {t1-t0:.3f}s  action {t2-t1:.3f}s  "
                  f"total {t2-t0:.3f}s  rows {len(pdf)}", flush=True)
        if plans_suffix:
            df = fn(spark, sf_dir)
            path = f"/root/repo/plans/r13/{name}_{plans_suffix}.txt"
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"# wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
