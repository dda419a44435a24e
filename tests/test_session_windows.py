"""Native session windows: batch operator vs lag/cumsum formulation and
the streaming twin's batch-equivalence."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _key(rows):
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 6))
        for r in rows
    }


def test_session_window_matches_lag_formulation(spark):
    """On data with no gap EXACTLY equal to 30 min, the >=/> boundary
    difference is moot and the two formulations must agree row-for-row."""
    from lakehouse_spark_spark.operators.windows import session_stats, session_window_stats
    from lakehouse_spark_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMALL, "events")
    # precondition for equivalence: no inter-event gap of exactly 30 min
    w = F.expr("lag(ts) over (partition by user_id order by ts, event_id)")
    exact_gap = (
        ev.withColumn("prev", w)
        .filter(F.col("ts") - F.col("prev") == F.expr("INTERVAL 30 MINUTES"))
        .count()
    )
    assert exact_gap == 0, "testdata has a gap at the boundary; pick another gap"

    native = _key(session_window_stats(ev, "user_id", "ts", 30).collect())
    lagform = _key(
        session_stats(ev, "user_id", "ts", 30)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .collect()
    )
    assert native == lagform and len(native) > 0


def test_streaming_session_stats_matches_batch(spark):
    from lakehouse_spark_spark.operators.windows import session_window_stats
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.streaming.events import read_event_stream, streaming_session_stats

    tmp = tempfile.mkdtemp(prefix="sess_ckpt_")
    try:
        stream = read_event_stream(spark, SF_SMALL, glob="events.parquet")
        agg = streaming_session_stats(stream, "user_id", gap_minutes=30, watermark="2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("sess_stream")
            .outputMode("complete")
            .option("checkpointLocation", tmp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.table("sess_stream").collect()
        }
        ev = load_table(spark, SF_SMALL, "events")
        want = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in session_window_stats(ev, "user_id", "ts", 30).collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
