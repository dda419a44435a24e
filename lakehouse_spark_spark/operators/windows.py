"""Event windowing & sessionization (batch forms).

The reference has no streaming surface (SURVEY.md §2.9); the events
table gives our engine the batch-windowing operators a lakehouse needs.
The streaming twins (readStream + watermark) live in
lakehouse_spark_spark/streaming/.

Scale notes: tumbling-window aggregation is a single hash shuffle on
(window, keys); sessionization shuffles once on the session key and
sorts within partitions (the window-function plan) — both hold at any
scale as long as per-key event counts fit a partition; for pathological
hot keys, pre-split by (key, day) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, ts_col: str, duration: str, keys: list[str], aggs: list) -> DataFrame:
    """Tumbling-window aggregation via the native window() bucketing."""
    out = events.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys).agg(*aggs)
    return out.select(F.col("w.start").alias("window_start"), *[c for c in out.columns if c != "w"])


def hourly_type_stats(events: DataFrame) -> DataFrame:
    """Events per (hour, type) with decimal-exact value sum emitted as
    double (cross-engine-stable)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


def sessionize(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds the gap. Returns the input plus
    ``session_seq`` (1-based per-user session number).

    Classic two-window formulation: lag → boundary flag → running sum.
    One shuffle on the user key, both windows reuse the same sort.
    """
    order = [F.col(ts_col), F.col("event_id")] if "event_id" in events.columns else [F.col(ts_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(prev.isNull() | (F.col(ts_col) - prev > gap), 1).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__new", is_new).withColumn("session_seq", F.sum("__new").over(running)).drop("__new")


def session_stats(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates over the sessionized stream."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def session_window_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates via the NATIVE session_window operator —
    the engine merges events whose gaps are < the timeout into one
    window per group, inside the aggregation itself (no lag/cumsum
    window-function pass, no second sort). Semantics match
    ``session_stats`` exactly (same gap rule; proven by the shared
    DuckDB oracle), but this physical form is also the one that runs
    under Structured Streaming with a watermark (streaming/events.
    streaming_session_stats), so batch and stream share one definition.

    session_window.end is last_event + gap by definition; we emit
    min/max event times instead so the output is gap-independent and
    comparable with the window-function formulation."""
    return (
        events.groupBy(F.session_window(F.col(ts_col), f"{gap_minutes} minutes"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .drop("session_window")
    )


def rollup_chain_daily_from_hourly(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous-aggregate chain: the daily rollup is
    computed FROM the hourly rollup (sums of sums, counts of counts,
    max of maxes), never from raw — the incremental-maintenance shape
    where each tier only reads the tier below. Correctness relies on
    the aggregates being decomposable (sum/count/min/max are; avg and
    distinct-count are NOT — carry sum+count / a sketch instead).

    The oracle twin in plans/queries computes the same daily numbers
    straight from raw events, proving the chain loses nothing.
    """
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        F.max(F.col("value")).alias("max_value"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("hour_start")).alias("day_start"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("double").alias("sum_value"),
            F.max("max_value").alias("max_value"),
        )
    )
