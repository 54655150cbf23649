"""Empirical scaling probe: run key operators at sf0.001 / sf0.01 / sf0.1
and report steady-state throughput (rows/s) at each size. Linear
operators hold or improve their throughput as input grows 100x (fixed
costs amortize); a super-linear operator would show throughput decaying
with scale — the early-warning signal for something that won't survive
the next 100x to the 100 TB design point.

Usage: python tools/scale_probe.py
Prints one line per (operator, sf): rows, best wall, rows/s, and a
final verdict comparing sf0.1 throughput against sf0.01.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIRS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]


def main() -> int:
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators import dedup as dd
    from etl_spark_gradle_spark.operators import sketch as sk
    from etl_spark_gradle_spark.operators import text as tx
    from etl_spark_gradle_spark.session import get_spark

    spark = get_spark(app_name="scale-probe", master="local[32]",
                      conf={"spark.sql.shuffle.partitions": "32"})

    def probes(sf_dir: str):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return {
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
    return 0 if worst >= 0.8 else 1


if __name__ == "__main__":
    raise SystemExit(main())
