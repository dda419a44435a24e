"""Structured Streaming surface: windowed event aggregation with
watermarked late-data handling.

The reference is batch-only (SURVEY.md §2.9); this is the streaming twin
of operators/windows.hourly_type_stats. The same logical plan serves
both: readStream instead of read, plus a watermark bounding state.

Scale notes: state size = (#open windows × #keys); the watermark is what
lets Spark evict closed windows — without it a 100 TB stream grows state
forever. ``availableNow`` gives batch-like catch-up runs of the same
query (the lakehouse "incremental refresh" mode the reference lacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ts declared as TimestampNTZType to match the testdata parquet's
# TIMESTAMP(MICROS); normalize_event_ts (shared with the batch loader)
# derives the session-TZ ts + exact ns long, so the stream and batch
# sides of every join agree on types.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, directory: str, glob: str | None = None, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of event parquet files.
    The source must be a DIRECTORY (new files appearing there become
    micro-batches); ``glob`` filters filenames within it."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(directory)
    from lakehouse_spark_spark.sources.loaders import normalize_event_ts

    return normalize_event_ts(df)


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound.

    Late events older than the watermark are dropped; everything else
    lands in its (closed or open) window until eviction.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def streaming_session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked session-window aggregation: the native streaming form
    of operators/windows.session_window_stats (same session_window call,
    same aggregates — one definition across batch and stream). Sessions
    merge as events arrive; a session finalizes — and its state is
    evicted — once the watermark passes its close. State size is
    bounded by (#open sessions), i.e. by activity inside the watermark
    horizon, not by history.

    sum_value is accumulated in decimal(18,2) exactly like the batch
    twin — a raw double sum is accumulation-order dependent, so the
    stream could drift from the batch/oracle result by ulps depending
    on arrival order; the decimal sum makes stream==batch exact."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), f"{gap_minutes} minutes"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .drop("session_window")
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str, output_mode: str = "complete"
) -> None:
    """Drain everything currently available into an in-memory sink and
    stop — the incremental-batch execution mode. Results land in the
    ``query_name`` temp view (spark.table(query_name)).

    ``output_mode``: 'complete' (default) suits aggregations but keeps
    ALL window state resident — the watermark cannot evict because every
    window stays addressable; use 'append' for non-aggregating streams
    (dedup, joins — 'complete' would raise AnalysisException for those)
    and for watermark-evicted windowed aggs where only finalized windows
    should be emitted."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(events: DataFrame, key_cols: list[str], watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once-per-key dedup: drops rows whose key was
    already seen within the watermark horizon
    (dropDuplicatesWithinWatermark). State holds one entry per key seen
    inside the horizon — bounded, unlike an unwatermarked
    dropDuplicates which grows forever. The batch twin is
    operators/dedup.exact_dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(key_cols)
