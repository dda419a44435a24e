"""Custom stateful streaming sessionization vs the batch twin."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_stateful_sessions_match_batch(spark):
    from lakehouse_spark_spark.operators.windows import session_stats
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.streaming.events import read_event_stream
    from lakehouse_spark_spark.streaming.stateful import stateful_sessions

    ck = tempfile.mkdtemp(prefix="stateful_ck_")
    try:
        stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")
        q = (
            stateful_sessions(stream)
            .writeStream.format("memory")
            .queryName("stateful_sessions")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table("stateful_sessions")
        # take the LAST snapshot per (user, session_start) — open sessions
        # re-emit as they extend
        latest = got.groupBy("user_id", "session_start_us").agg(
            F.max("session_end_us").alias("session_end_us"),
            F.max("n_events").alias("n_events"),
        )
        batch = session_stats(load_table(spark, SF_SMALL, "events"), gap_minutes=30)
        want = {
            (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
            for r in batch.select(
                "user_id",
                F.unix_micros("session_start").alias("session_start_us"),
                F.unix_micros("session_end").alias("session_end_us"),
                "n_events",
            ).collect()
        }
        have = {
            (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"]) for r in latest.collect()
        }
        assert have == want
        assert len(have) > 0
    finally:
        shutil.rmtree(ck, ignore_errors=True)
