"""k-anonymity must prove DETECTION at sf1, not just execution.

VERDICT r8 ask #5: with only real data the k=12 threshold is
SF-relative — every quasi-identifier cell at sf1 has >= 12 members, so
the audit returns 0 rows and exercises the plan but never the
detection path. tools/gen_sf1.py now plants a 5-customer cohort in an
otherwise-unoccupied balance band (c_custkey 150000-150004, MACHINERY,
nation 0, bal_band 99); this test asserts the audit finds exactly that
cohort at sf1.
"""

from __future__ import annotations

import os

import pytest

SF1 = "/root/repo/testdata_sf1"


@pytest.mark.skipif(
    not os.path.exists(f"{SF1}/customer.parquet"),
    reason="sf1 testdata not generated (run tools/gen_sf1.py)",
)
def test_k_anonymity_detects_planted_cohort_at_sf1(spark):
    from pyspark.sql import functions as F

    from etl_spark_gradle_spark.operators.pii import k_anonymity

    cust = spark.read.parquet(f"{SF1}/customer.parquet").withColumn(
        "bal_band",
        F.floor(F.col("c_acctbal").cast("double") / F.lit(1000.0)).cast("long"),
    )
    out = k_anonymity(
        cust, ["c_mktsegment", "c_nationkey", "bal_band"], k=12
    ).collect()
    assert len(out) > 0, "sf1 audit found no violations — plant missing?"
    planted = [
        r
        for r in out
        if r["c_mktsegment"] == "MACHINERY"
        and r["c_nationkey"] == 0
        and r["bal_band"] == 99
    ]
    assert len(planted) == 1 and planted[0]["n"] == 5


@pytest.mark.skipif(
    not os.path.exists(f"{SF1}/customer.parquet"),
    reason="sf1 testdata not generated (run tools/gen_sf1.py)",
)
def test_planted_cohort_is_isolated(spark):
    """The plant must not leak into real QI cells: every planted row
    lives in balance band 99, which real data (bands -1..9) never
    occupies, and the custkeys sit past the inflated 10x range."""
    cust = spark.read.parquet(f"{SF1}/customer.parquet")
    planted = cust.where("c_custkey >= 150000").collect()
    assert len(planted) == 5
    assert all(99000.0 <= r["c_acctbal"] < 99100.0 for r in planted)
    real_max = (
        cust.where("c_custkey < 150000").agg({"c_acctbal": "max"}).collect()
    )[0][0]
    assert real_max < 10000.0
