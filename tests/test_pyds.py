"""Custom Python Data Sources (sources/pyds.py): batch robust-JSONL and
the streaming parquet replay source."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


class TestJsonlRobust:
    def test_good_and_corrupt_lines(self, spark):
        from lakehouse_spark_spark.sources import pyds

        d = tempfile.mkdtemp(prefix="jsonl_robust_")
        try:
            with open(os.path.join(d, "a.jsonl"), "w") as fh:
                fh.write(json.dumps({"doc_id": 1, "text": "hello", "lang": "en", "source": "s", "n_chars": 5}) + "\n")
                fh.write(json.dumps({"doc_id": 2, "text": "x"}) + "\n")  # missing keys -> NULL
                fh.write('{"doc_id": "notanint", "text": "y"}\n')  # coercion failure -> NULL doc_id
                fh.write("garbage line\n")
                fh.write("[1,2]\n")  # non-object -> corrupt
            pyds.register(spark)
            rows = (
                spark.read.format("jsonl_robust").option("path", d).load().collect()
            )
            good = [r for r in rows if r["_corrupt_record"] is None]
            bad = [r for r in rows if r["_corrupt_record"] is not None]
            assert len(good) == 3 and len(bad) == 2
            by_text = {r["text"]: r for r in good}
            assert by_text["hello"]["doc_id"] == 1 and by_text["hello"]["n_chars"] == 5
            assert by_text["x"]["lang"] is None
            assert by_text["y"]["doc_id"] is None  # coercion failure quarantined to NULL
            assert {r["_corrupt_record"] for r in bad} == {"garbage line", "[1,2]"}
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestParquetReplayStream:
    def test_replay_matches_batch(self, spark):
        from lakehouse_spark_spark.sources import pyds

        pyds.register_streaming(spark)
        path = f"{SF_SMALL}/events.parquet"
        ck = tempfile.mkdtemp(prefix="replay_ck_")
        try:
            stream = (
                spark.readStream.format("parquet_replay")
                .option("path", path)
                .option("batch_rows", 500)
                .load()
            )
            q = (
                stream.writeStream.format("memory")
                .queryName("replay_t")
                .outputMode("append")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got = spark.table("replay_t")
            batch = spark.read.parquet(path)
            assert got.count() == batch.count()
            g = {r["event_type"]: r["n"] for r in got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
            w = {r["event_type"]: r["n"] for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
            assert g == w
            # exactly-once: no duplicated event ids across micro-batches
            assert got.select("event_id").distinct().count() == got.count()
        finally:
            shutil.rmtree(ck, ignore_errors=True)
