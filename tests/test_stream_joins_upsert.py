"""Stream-stream join vs its batch twin; parquet upsert semantics."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_stream_stream_join_matches_batch_range_join(spark):
    from lakehouse_spark_spark.operators.temporal import banded_range_join
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.streaming.events import read_event_stream
    from lakehouse_spark_spark.streaming.joins import stream_stream_within

    ck = tempfile.mkdtemp(prefix="ssj_")
    try:
        stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")
        clicks = stream.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
        )
        purchases = stream.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts")
        )
        joined = stream_stream_within(
            clicks, purchases.withColumnRenamed("p_user_id", "user_id"), "user_id", "click_ts", "purchase_ts"
        ).select("click_id", "purchase_id")
        q = (
            joined.writeStream.format("memory")
            .queryName("ssj")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r["click_id"], r["purchase_id"]) for r in spark.table("ssj").collect()}

        ev = load_table(spark, SF_SMALL, "events")
        bclicks = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
        )
        bpurch = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
        )
        want = {
            (r["click_id"], r["purchase_id"])
            for r in banded_range_join(bclicks, bpurch, "user_id", "click_ts", "purchase_ts", 300).collect()
        }
        # the stream join may drop late rows beyond the watermark; with a
        # single availableNow batch nothing is late, so sets match exactly
        assert got == want
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def test_stream_static_enrich(spark):
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.streaming.events import read_event_stream
    from lakehouse_spark_spark.streaming.joins import stream_static_enrich

    ck = tempfile.mkdtemp(prefix="sse_")
    try:
        stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")
        dim = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")
        out = stream_static_enrich(stream, dim, "user_id", "c_custkey").select("event_id", "c_mktsegment")
        q = (
            out.writeStream.format("memory")
            .queryName("sse")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        res = spark.table("sse")
        assert res.count() == 1000  # every event row enriched (left join)
        assert res.filter(F.col("c_mktsegment").isNotNull()).count() > 0
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def test_upsert_parquet_replace_and_append(spark):
    from lakehouse_spark_spark.sources.sinks import upsert_parquet

    d = tempfile.mkdtemp(prefix="upsert_")
    path = f"{d}/t"
    try:
        base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
        base.write.parquet(path)
        updates = spark.createDataFrame([(2, "B2"), (4, "d")], ["k", "v"])  # replace k=2, add k=4
        upsert_parquet(spark, path, updates, ["k"])
        got = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
        assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
        # idempotent re-apply
        upsert_parquet(spark, path, updates, ["k"])
        again = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
        assert again == got
    finally:
        shutil.rmtree(d, ignore_errors=True)
