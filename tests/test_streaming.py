"""Structured Streaming: windowed aggregation with watermark, drained
via availableNow into a memory sink, checked against the batch twin."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_stream_matches_batch_hourly_counts(spark):
    from lakehouse_spark_spark.streaming.events import read_event_stream, run_available_now, windowed_counts

    tmp = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        # stream side: file-source over the sf0.001 events parquet.
        # NOTE: the stream schema reads ts as TimestampType directly; the
        # parquet stores NANOS which Spark truncates under nanosAsLong only
        # for the batch loader — here the file source uses the declared
        # schema, so set the legacy conf for parity.
        stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")
        run_available_now(windowed_counts(stream), "hourly_stream", tmp)
        got = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in spark.table("hourly_stream").collect()
        }
        # batch twin over the same file
        from lakehouse_spark_spark.sources.loaders import load_table

        ev = load_table(spark, SF_SMALL, "events")
        want = {
            (r["hour_start"], r["event_type"]): r["n"]
            for r in ev.groupBy(
                F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
            ).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == want
        assert len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
