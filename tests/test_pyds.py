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


class TestSchemaInferredReplay:
    def test_documents_replay_matches_batch(self, spark):
        """The replay source is schema-inferred from the parquet footer,
        so it streams ANY fixture — here the documents table with an
        explicit column subset."""
        from lakehouse_spark_spark.sources import pyds

        pyds.register_streaming(spark)
        path = f"{SF_SMALL}/documents.parquet"
        ck = tempfile.mkdtemp(prefix="replay_docs_ck_")
        try:
            stream = (
                spark.readStream.format("parquet_replay")
                .option("path", path)
                .option("columns", "doc_id,text,lang,source")
                .option("batch_rows", 200)
                .load()
            )
            assert stream.columns == ["doc_id", "text", "lang", "source"]
            q = (
                stream.writeStream.format("memory")
                .queryName("replay_docs_t")
                .outputMode("append")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got = spark.table("replay_docs_t")
            batch = spark.read.parquet(path)
            assert got.count() == batch.count()
            assert got.select(F.sum(F.length("text"))).collect() == batch.select(
                F.sum(F.length("text"))
            ).collect()
        finally:
            shutil.rmtree(ck, ignore_errors=True)

    def test_streaming_curation_gate_and_dedup_match_batch(self, spark):
        """Streaming curation: the documents stream passes the Gopher
        word gate and exact-dedups on the content hash with streaming
        state (dropDuplicates), landing in a memory sink. The surviving
        doc set must equal the batch gate + dedup-keep-first result —
        the training-data pipeline's ingest path expressed as a
        Structured Streaming query over the custom replay source."""
        from lakehouse_spark_spark.operators.dedup import content_hash
        from lakehouse_spark_spark.sources import pyds

        pyds.register_streaming(spark)
        path = f"{SF_SMALL}/documents.parquet"
        ck = tempfile.mkdtemp(prefix="replay_cur_ck_")
        try:
            stream = (
                spark.readStream.format("parquet_replay")
                .option("path", path)
                .option("columns", "doc_id,text")
                .option("batch_rows", 128)
                .load()
            )
            # gate + hash as pure projections on the stream (a
            # stream-stream self-join of two projections is not
            # allowed, so the gate predicate is built inline with the
            # same integer-exact expressions gopher_quality_flags uses)
            from pyspark.sql import functions as SF

            from lakehouse_spark_spark.operators.text import (
                GOPHER_STOPWORDS,
                norm_text,
                tokens,
            )

            s2 = stream.withColumn("h", content_hash("text"))

            nrm = norm_text("text")
            ws = tokens("text")
            n = SF.size(ws).cast("long")
            sum_len = (SF.length(nrm) - (n - SF.lit(1))).cast("long")
            n_alpha = SF.size(SF.filter(ws, lambda w: w.rlike("[a-z]"))).cast("long")
            hashes = SF.length(nrm) - SF.length(SF.replace(nrm, SF.lit("#"), SF.lit("")))
            ellipses = (
                (SF.length(nrm) - SF.length(SF.replace(nrm, SF.lit("..."), SF.lit("")))) / SF.lit(3)
            ).cast("long")
            stop_hits = SF.size(
                SF.array_intersect(ws, SF.array(*[SF.lit(s) for s in GOPHER_STOPWORDS]))
            ).cast("long")
            keep = (
                (n >= 20) & (n <= 1000)
                & (SF.lit(3) * n <= sum_len) & (sum_len <= SF.lit(10) * n)
                & (SF.lit(10) * (hashes + ellipses).cast("long") < n)
                & (SF.lit(5) * n_alpha > SF.lit(4) * n)
                & (stop_hits >= 1)
            )
            curated = (
                s2.filter(keep)
                .dropDuplicates(["h"])
                .select("doc_id", "h")
            )
            q = (
                curated.writeStream.format("memory")
                .queryName("curated_stream_t")
                .outputMode("append")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got = {r["doc_id"] for r in spark.table("curated_stream_t").collect()}

            batch = spark.read.parquet(path).select("doc_id", "text")
            from lakehouse_spark_spark.operators.text import gopher_quality_flags as gq

            bf = gq(batch, "doc_id", "text", min_words=20, max_words=1000, stopword_min=1)
            passed = batch.join(bf.filter("keep").select("doc_id"), "doc_id").withColumn(
                "h", content_hash("text")
            )
            # batch equivalent of streaming keep-first: min doc_id per
            # hash (replay order == doc_id order in the fixture)
            keep_ids = passed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
            want = {r["doc_id"] for r in keep_ids.collect()}
            assert got == want
            assert len(got) > 0
        finally:
            shutil.rmtree(ck, ignore_errors=True)

    def test_paced_replay_multi_batch_equivalence(self, spark):
        """rows_per_trigger pacing (round-6 verdict ask #7): the same
        table replayed across MANY micro-batches must land the identical
        final output as the single-batch drain — streaming correctness
        must not depend on batch boundaries. Asserts the run really was
        multi-batch (>1 input batches; 500 rows / 120 per trigger = 5)."""
        import time

        from lakehouse_spark_spark.sources import pyds

        pyds.register_streaming(spark)
        path = f"{SF_SMALL}/documents.parquet"
        ck = tempfile.mkdtemp(prefix="replay_paced_ck_")
        try:
            stream = (
                spark.readStream.format("parquet_replay")
                .option("path", path)
                .option("columns", "doc_id,text")
                .option("batch_rows", 64)
                .option("rows_per_trigger", 120)
                .load()
            )
            q = (
                stream.writeStream.format("memory")
                .queryName("replay_paced_t")
                .outputMode("append")
                .option("checkpointLocation", ck)
                .trigger(processingTime="0 seconds")
                .start()
            )
            batch = spark.read.parquet(path).select("doc_id", "text")
            want_n = batch.count()
            deadline = time.time() + 120
            while time.time() < deadline:
                if spark.table("replay_paced_t").count() >= want_n:
                    break
                time.sleep(0.5)
            q.stop()
            got = spark.table("replay_paced_t")
            assert got.count() == want_n
            # identical content, not just cardinality
            assert got.select(
                F.sum("doc_id"), F.sum(F.length("text"))
            ).collect() == batch.select(
                F.sum("doc_id"), F.sum(F.length("text"))
            ).collect()
            input_batches = [
                p for p in q.recentProgress if p["numInputRows"] > 0
            ]
            assert len(input_batches) > 1, [
                p["numInputRows"] for p in q.recentProgress
            ]
        finally:
            shutil.rmtree(ck, ignore_errors=True)

    def test_paced_reader_restart_resyncs_cursor(self):
        """Restart-offset contract (sources/pyds.py pacing comment): a
        fresh reader starts with cursor 0, but replaying the last
        WAL-planned batch through partitions() must jump the cursor to
        the replayed high-water mark so the next latestOffset() paces
        FORWARD from the checkpoint instead of re-exposing rows from 0.
        Pure reader-API test — no engine involved."""
        from lakehouse_spark_spark.sources.pyds import _ParquetReplayReader

        path = f"{SF_SMALL}/documents.parquet"
        opts = {"path": path, "columns": "doc_id", "rows_per_trigger": "120"}

        r1 = _ParquetReplayReader(opts)
        assert r1.initialOffset() == {"row": 0}
        assert r1.latestOffset() == {"row": 120}
        assert r1.latestOffset() == {"row": 240}

        # crash: engine restarts with a fresh reader, WAL says the last
        # planned batch was [120, 240)
        r2 = _ParquetReplayReader(opts)
        parts = r2.partitions({"row": 120}, {"row": 240})
        assert sum(e - s for (s, e) in (p.value for p in parts)) == 120
        # cursor re-synced: next trigger continues past the checkpoint
        assert r2.latestOffset() == {"row": 360}
        assert r2.latestOffset() == {"row": 480}
        # and is clamped at the table end
        assert r2.latestOffset() == {"row": 500}
        assert r2.latestOffset() == {"row": 500}

    def test_paced_restart_without_cursor_is_at_least_once(self):
        """The documented hole (r7 verdict ask #7): if the final
        pre-crash batch was FULLY committed, a fresh reader with no
        persisted cursor under-reports in latestOffset() — the
        committed gap [120, 240) would be re-exposed. This test PINS
        the at-least-once contract of the bare paced mode."""
        from lakehouse_spark_spark.sources.pyds import _ParquetReplayReader

        path = f"{SF_SMALL}/documents.parquet"
        opts = {"path": path, "columns": "doc_id", "rows_per_trigger": "120"}

        r1 = _ParquetReplayReader(opts)
        assert r1.latestOffset() == {"row": 120}
        assert r1.latestOffset() == {"row": 240}
        r1.partitions({"row": 120}, {"row": 240})
        r1.commit({"row": 240})  # batch fully committed...

        # ...then crash: the fresh reader's first latestOffset paces
        # from 0, exposing [0, 120) again — at-least-once, by contract
        r2 = _ParquetReplayReader(opts)
        assert r2.latestOffset() == {"row": 120}

    def test_paced_restart_with_cursor_path_resumes_from_commit(self, tmp_path):
        """cursor_path narrows the hole: commit() persists the committed
        offset, a restarted reader seeds its cursor from it, and pacing
        resumes forward from the last PERSISTED commit. (A crash in the
        engine-commit → cursor-persist gap can still replay that one
        batch — the contract is at-least-once with a one-batch window,
        not exactly-once; this test exercises the persisted-cursor
        resume path.)"""
        from lakehouse_spark_spark.sources.pyds import _ParquetReplayReader

        path = f"{SF_SMALL}/documents.parquet"
        cur = str(tmp_path / "replay.cursor")
        opts = {
            "path": path,
            "columns": "doc_id",
            "rows_per_trigger": "120",
            "cursor_path": cur,
        }

        r1 = _ParquetReplayReader(opts)
        assert r1.latestOffset() == {"row": 120}
        assert r1.latestOffset() == {"row": 240}
        r1.partitions({"row": 120}, {"row": 240})
        r1.commit({"row": 240})  # persists the cursor atomically

        # crash + restart: pacing resumes FORWARD from the commit
        r2 = _ParquetReplayReader(opts)
        assert r2.latestOffset() == {"row": 360}
        assert r2.latestOffset() == {"row": 480}
        assert r2.latestOffset() == {"row": 500}  # clamped at table end

        # a stale cursor beyond the table clamps instead of exploding
        with open(cur, "w") as fh:
            fh.write("999999")
        r3 = _ParquetReplayReader(opts)
        assert r3.latestOffset() == {"row": 500}


class TestStreamingBloomIngest:
    def test_streaming_bloom_ingest_matches_batch_operator(self, spark, tmp_path):
        """The persisted-index ingest loop end-to-end (r8 verdict task
        4): a paced multi-batch replay foreachBatch-dedups each
        micro-batch against the persisted Bloom index, appends keeps,
        and folds the batch's novel hashes back in. The streamed
        keep-set must equal the batch operator's on the UNION of all
        batches (ids ascend in arrival order, so first-seen == min-id),
        and the index must grow by exactly the kept hashes."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lakehouse_spark_spark.operators.bloom import (
            load_dedup_index,
            write_dedup_index,
        )
        from lakehouse_spark_spark.operators.dedup import dedup_against_corpus
        from lakehouse_spark_spark.sources import pyds
        from lakehouse_spark_spark.streaming.ingest import bloom_ingest_foreach_batch

        pyds.register_streaming(spark)
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        corpus = docs.filter("doc_id < 300").select("doc_id", "text")
        texts = [r["text"] for r in docs.orderBy("doc_id").collect()]

        # synthetic stream (the fixture has no exact dups): 50 corpus
        # dups, 140 novels, then 10 cross-batch dups of earlier novels —
        # ids ascend in arrival order, spread over 4 paced micro-batches
        rows: list[tuple[int, str]] = []
        rows += [(1000 + i, texts[i]) for i in range(50)]            # corpus dups
        rows += [(1050 + i, texts[300 + i]) for i in range(140)]     # novel
        rows += [(1200 + i, texts[300 + i]) for i in range(10)]      # in-stream dups
        stream_file = str(tmp_path / "stream_in.parquet")
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
            ),
            stream_file,
            row_group_size=50,
        )

        idx_path = str(tmp_path / "ingest_idx")
        write_dedup_index(corpus, "text", idx_path)
        n_corpus_hashes = load_dedup_index(spark, idx_path).hashes.count()

        kept_out = str(tmp_path / "kept_out")
        ck = str(tmp_path / "ck")
        stream = (
            spark.readStream.format("parquet_replay")
            .option("path", stream_file)
            .option("batch_rows", 50)
            .option("rows_per_trigger", 60)  # 200 rows -> 4 micro-batches
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(
                bloom_ingest_foreach_batch(idx_path, "doc_id", "text", kept_out)
            )
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        q.stop()
        assert len(progress) >= 3  # genuinely multi-batch

        got = {
            (r["doc_id"], r["content_hash"])
            for r in spark.read.parquet(kept_out).collect()
        }
        union = spark.createDataFrame(rows, "doc_id bigint, text string")
        want = {
            (r["doc_id"], r["content_hash"])
            for r in dedup_against_corpus(union, corpus, "doc_id", "text")
            .filter("keep")
            .collect()
        }
        assert got == want
        assert len(got) == 140  # the novel firsts, nothing else

        # index grew by exactly the kept hash set
        idx = load_dedup_index(spark, idx_path)
        assert idx.hashes.count() == n_corpus_hashes + 140
        assert idx.hashes.distinct().count() == idx.hashes.count()

    def test_streaming_curated_ingest_matches_batch(self, spark, tmp_path):
        """The composed front-half ingest (quality gates -> persisted
        Bloom dedup -> index fold-in) over a paced multi-batch replay
        equals the same gates + exact dedup run as one batch over the
        union. Uses the real documents fixture (which contains
        gate-failing docs) plus synthetic cross-batch duplicates."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lakehouse_spark_spark.operators.bloom import write_dedup_index
        from lakehouse_spark_spark.operators.dedup import dedup_against_corpus
        from lakehouse_spark_spark.operators.text import gopher_quality_flags
        from lakehouse_spark_spark.sources import pyds
        from lakehouse_spark_spark.streaming.ingest import curated_ingest_foreach_batch

        pyds.register_streaming(spark)
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        corpus = docs.filter("doc_id < 200").select("doc_id", "text")
        texts = [r["text"] for r in docs.orderBy("doc_id").collect()]

        rows: list[tuple[int, str]] = []
        rows += [(2000 + i, texts[i]) for i in range(40)]            # corpus dups
        rows += [(2040 + i, texts[200 + i]) for i in range(150)]     # mixed novel
        rows += [(2200 + i, texts[200 + i]) for i in range(10)]      # in-stream dups
        stream_file = str(tmp_path / "curated_in.parquet")
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
            ),
            stream_file,
            row_group_size=50,
        )

        idx_path = str(tmp_path / "curated_idx")
        write_dedup_index(corpus, "text", idx_path)
        kept_out = str(tmp_path / "curated_kept")
        stream = (
            spark.readStream.format("parquet_replay")
            .option("path", stream_file)
            .option("batch_rows", 50)
            .option("rows_per_trigger", 64)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(
                curated_ingest_foreach_batch(idx_path, "doc_id", "text", kept_out)
            )
            .option("checkpointLocation", str(tmp_path / "curated_ck"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()

        got = {
            (r["doc_id"], r["content_hash"], r["n_words"])
            for r in spark.read.parquet(kept_out).collect()
        }
        # batch twin: same gates, exact dedup against the corpus, over
        # the whole union at once
        union = spark.createDataFrame(rows, "doc_id bigint, text string")
        flags = gopher_quality_flags(
            union, "doc_id", "text", min_words=20, max_words=1000, stopword_min=1
        ).select("doc_id", "n_words", "keep")
        gated = union.join(flags.filter("keep").drop("keep"), "doc_id")
        want = {
            (r["doc_id"], r["content_hash"], r["n_words"])
            for r in dedup_against_corpus(gated, corpus, "doc_id", "text")
            .filter("keep")
            .join(gated.select("doc_id", "n_words"), "doc_id")
            .collect()
        }
        assert got == want
        # the gates really dropped something and dedup really fired
        assert 0 < len(got) < len(rows)
