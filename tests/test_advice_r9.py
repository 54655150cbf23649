"""Regression tests for the ADVICE r9 findings (auc's ungrouped path
and the isotonic/brier adapter validation are locked in
tests/test_evaluation.py; rotation epoch fallback in
tests/test_rotation_tool.py)."""

from __future__ import annotations

import subprocess

import pytest

from etl_spark_gradle_spark.plans.config import ConfigError


def test_stream_trigger_typo_raises(spark, tmp_path):
    """ADVICE r9: an unrecognized trigger used to fall through both
    branches silently — an intended availableNow drain became an
    unbounded ASAP micro-batch query."""
    from etl_spark_gradle_spark.streaming import (
        _apply_trigger,
        read_file_stream,
    )

    src = tmp_path / "in"
    src.mkdir()
    spark.range(3).write.mode("overwrite").parquet(str(src / "seed"))
    stream = read_file_stream(
        spark, {"format": "parquet", "path": str(src / "seed")}, "id long"
    )
    writer = stream.writeStream.format("memory").queryName("t_trig")
    with pytest.raises(ConfigError, match="trigger"):
        _apply_trigger(writer, "once")
    with pytest.raises(ConfigError, match="trigger"):
        _apply_trigger(writer, "availablenow")  # case typo
    # the two supported spellings still pass through
    _apply_trigger(writer, "availableNow")
    _apply_trigger(writer, "processingTime=5 seconds")


def test_check_oracle_rejects_timings_with_all_sfs():
    """ADVICE r9: --timings + --all-sfs used to silently gate nothing."""
    out = subprocess.run(
        ["python", "tools/check_oracle.py", "--timings", "--all-sfs",
         "no_such_query"],
        cwd="/root/repo", capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 2
    assert "--timings cannot be combined" in out.stdout
