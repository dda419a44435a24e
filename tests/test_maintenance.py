"""Streaming dedup and parquet compaction maintenance ops."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F


def test_dedup_stream_drops_duplicates(spark):
    from lakehouse_spark_spark.streaming.events import dedup_stream
    from lakehouse_spark_spark.streaming.stateful import SESSION_OUTPUT_SCHEMA  # noqa: F401 (import path smoke)

    src = tempfile.mkdtemp(prefix="dupstream_")
    ck = tempfile.mkdtemp(prefix="dupck_")
    try:
        base = spark.createDataFrame(
            [(i % 5, "2024-01-01 10:00:%02d" % (i % 30), float(i)) for i in range(50)],
            ["event_id", "ts_s", "value"],
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
        base.write.mode("overwrite").parquet(src)

        stream = (
            spark.readStream.schema("event_id long, ts timestamp, value double").parquet(src)
        )
        from lakehouse_spark_spark.streaming.events import run_available_now

        # append mode: the right drain mode for non-aggregating streams
        # ('complete' would raise AnalysisException here)
        run_available_now(dedup_stream(stream, ["event_id"]), "dedup_stream_t", ck, output_mode="append")
        out = spark.table("dedup_stream_t")
        assert out.count() == 5  # one survivor per event_id
        assert out.select("event_id").distinct().count() == 5
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_compact_parquet_reduces_file_count(spark):
    from lakehouse_spark_spark.sources.sinks import compact_parquet

    d = tempfile.mkdtemp(prefix="compact_")
    path = f"{d}/t"
    try:
        # simulate a small-files mess: 32 tiny part files
        spark.range(10_000).repartition(32).write.mode("overwrite").parquet(path)
        before = len(glob.glob(f"{path}/part-*.parquet"))
        assert before == 32
        n = compact_parquet(spark, path, target_file_mb=256)
        after = len(glob.glob(f"{path}/part-*.parquet"))
        assert n == 1 and after == 1
        assert spark.read.parquet(path).count() == 10_000  # no data loss
    finally:
        shutil.rmtree(d, ignore_errors=True)
