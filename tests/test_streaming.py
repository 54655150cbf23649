"""Structured Streaming extension: file stream -> watermarked window agg
-> file sink with availableNow trigger (real readStream/writeStream, no
external services — the same file-backed strategy the reference's tests
use for its simulated micro-batches).

Append-mode contract exercised explicitly: a window is emitted only when
the watermark (max event time − delay) passes its end, so each test
ships a later "flush" event to advance the watermark past the windows
under assertion; still-open windows stay in checkpoint state and emit on
the next incremental run."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from etl_spark_gradle_spark import streaming as st
from etl_spark_gradle_spark.plans.config import AggregateExpr

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("metric", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batch(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        for ts, m, v in rows:
            f.write(json.dumps({"ts": ts, "metric": m, "value": v}) + "\n")


def _run(spark, src, out, ckpt, watermark="5 seconds"):
    st.run_file_to_file_stream(
        spark,
        source_options={"path": str(src), "format": "json"},
        schema=SCHEMA,
        sink_options={
            "path": str(out),
            "checkpointLocation": str(ckpt),
            "format": "parquet",
        },
        time_column="ts",
        window_duration="10 seconds",
        aggregations=[
            AggregateExpr("value", "sum", "sum_value"),
            AggregateExpr("*", "count", "cnt"),
        ],
        watermark_delay=watermark,
        group_by=["metric"],
    )


def test_file_stream_windowed_agg(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(
        src / "batch1.json",
        [
            ("2024-01-01 00:00:05", "m1", 1.0),
            ("2024-01-01 00:00:07", "m1", 3.0),
            ("2024-01-01 00:00:12", "m1", 5.0),
            ("2024-01-01 00:00:03", "m2", 7.0),
            # flush event: advances the watermark past every real window
            ("2024-01-01 01:00:00", "flush", 0.0),
        ],
    )
    out = tmp_path / "out"
    _run(spark, src, out, tmp_path / "ckpt")
    result = {
        (r.metric, r.window_start.strftime("%H:%M:%S")): (r.sum_value, r.cnt)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert result[("m1", "00:00:00")] == (4.0, 2)
    assert result[("m1", "00:00:10")] == (5.0, 1)
    assert result[("m2", "00:00:00")] == (7.0, 1)
    # the flush event's own window is still open -> correctly NOT emitted
    assert not any(m == "flush" for (m, _) in result)


def test_incremental_second_batch(spark, tmp_path):
    """availableNow + checkpoint = exactly-once incremental draining:
    run 1 leaves its window open in state; run 2's later events advance
    the watermark, flushing run 1's window plus its own closed windows,
    each exactly once."""
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    _write_batch(src / "b1.json", [("2024-01-01 00:00:01", "m1", 1.0)])
    _run(spark, src, out, ckpt, watermark="0 seconds")
    assert not list((out).glob("*.parquet")) or spark.read.parquet(str(out)).count() == 0

    _write_batch(
        src / "b2.json",
        [("2024-01-01 00:01:01", "m1", 1.0), ("2024-01-01 00:02:30", "flush", 0.0)],
    )
    _run(spark, src, out, ckpt, watermark="0 seconds")
    rows = [r for r in spark.read.parquet(str(out)).collect() if r.metric == "m1"]
    assert sorted(r.window_start.strftime("%M:%S") for r in rows) == ["00:00", "01:00"]
    assert all(r.cnt == 1 for r in rows)
