"""foreachBatch sinks: keyed upsert idempotence and snapshot publishing."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_stream_snapshot_sink_matches_batch(spark):
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.sources.snapshots import current_version, read_snapshot
    from lakehouse_spark_spark.streaming.events import read_event_stream, windowed_counts
    from lakehouse_spark_spark.streaming.sinks import stream_snapshot_sink

    ckpt, tbl = tempfile.mkdtemp(prefix="ck_"), tempfile.mkdtemp(prefix="tbl_")
    shutil.rmtree(tbl)  # sink creates it
    try:
        stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")
        stream_snapshot_sink(windowed_counts(stream), tbl, ckpt)
        assert current_version(tbl) is not None
        got = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in read_snapshot(spark, tbl).collect()
        }
        ev = load_table(spark, SF_SMALL, "events")
        want = {
            (r["hour"], r["event_type"]): r["n"]
            for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tbl, ignore_errors=True)


def test_stream_upsert_sink_idempotent_on_redrain(spark):
    """Draining the same source twice with the same checkpoint writes
    nothing new (source offsets committed); the keyed table stays
    consistent."""
    from lakehouse_spark_spark.streaming.events import dedup_stream, read_event_stream
    from lakehouse_spark_spark.streaming.sinks import stream_upsert_sink

    ckpt, tbl = tempfile.mkdtemp(prefix="ck_"), tempfile.mkdtemp(prefix="tbl_") + "/t"
    try:
        def drain():
            stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")
            deduped = dedup_stream(stream, ["event_id"]).select("event_id", "user_id", "event_type")
            stream_upsert_sink(deduped, tbl, ["event_id"], ckpt, output_mode="append")

        drain()
        n1 = spark.read.parquet(tbl).count()
        drain()  # no new files in the source: a no-op batch
        n2 = spark.read.parquet(tbl).count()
        assert n1 == n2 > 0
        # keys unique after upsert
        dup = (
            spark.read.parquet(tbl)
            .groupBy("event_id")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dup == 0
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tbl.rsplit("/", 1)[0], ignore_errors=True)
