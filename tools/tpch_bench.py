"""Time the full adapted TPC-H suite (etl_spark_gradle_spark/tpch.py).

Usage: python tools/tpch_bench.py [sf_dir]   (default /root/testdata/sf0.1)

One untimed warm run per query (codegen/broadcast build), then the
median of 3 timed runs wrapping plan construction + execution (count
action). Prints one JSON line with per-query seconds + total — the
analytics-suite companion to bench.py's operator workloads.
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from etl_spark_gradle_spark import tpch
    from etl_spark_gradle_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(
        app_name="tpch-bench",
        master="local[32]",
        conf={"spark.sql.shuffle.partitions": "32"},
    )
    timings: dict[str, float] = {}
    for name, fn in tpch.QUERIES.items():
        fn(spark, sf_dir).count()  # warm, untimed
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)
        print(f"# {name}: {rows} rows, median {timings[name]}s", flush=True)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "tpch_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
