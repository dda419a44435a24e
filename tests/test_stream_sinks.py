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


def test_streaming_histogram_tier_matches_batch_tier(spark):
    """The quantile tier is maintained INCREMENTALLY from the stream:
    each micro-batch's (day, bin) partial counts are merged into the
    tier table by keyed upsert of summed counts — after the drain the
    tier equals the batch-built tier bin-for-bin, so every quantile
    served from it is identical. (This is the 100 TB refresh path: the
    raw stream is never re-scanned, the tier absorbs deltas.)"""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse_spark_spark.operators.sketches import histogram_tier
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.sources.sinks import upsert_parquet
    from lakehouse_spark_spark.streaming.events import read_event_stream

    ckpt, tbl = tempfile.mkdtemp(prefix="ck_"), tempfile.mkdtemp(prefix="tbl_") + "/tier"
    try:
        stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")

        def merge_tier(batch, _batch_id):
            delta = histogram_tier(
                batch, F.col("ts").cast("date"), "value", lo=0.0, width=10.0, n_bins=64
            )
            try:
                existing = batch.sparkSession.read.parquet(tbl)
                merged = (
                    existing.unionByName(delta)
                    .groupBy("day", "bin")
                    .agg(F.sum("n").alias("n"))
                )
            except Exception:
                merged = delta
            upsert_parquet(batch.sparkSession, tbl, merged, ["day", "bin"])

        (
            stream.writeStream.foreachBatch(merge_tier)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        got = {
            (str(r["day"]), r["bin"]): r["n"] for r in spark.read.parquet(tbl).collect()
        }
        ev = load_table(spark, SF_SMALL, "events")
        want = {
            (str(r["day"]), r["bin"]): r["n"]
            for r in histogram_tier(
                ev, F.col("ts").cast("date"), "value", lo=0.0, width=10.0, n_bins=64
            ).collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tbl.rsplit("/", 1)[0], ignore_errors=True)
