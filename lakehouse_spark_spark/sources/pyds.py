"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API):
a robust JSON-Lines reader with PERMISSIVE corrupt-record semantics.

Why a custom source and not `spark.read.json`: the native reader's
corrupt-record column only captures lines that fail Jackson parsing;
pipelines ingesting scraped JSONL also need type coercion failures and
schema drift captured per line, under rules the pipeline owns. This
source demonstrates the extension point with exactly that contract:

- one InputPartition PER FILE (parallelism follows the file listing,
  like any file source; a 100 TB ingest lists many files),
- each line parses with ``json.loads``; a well-formed object yields the
  declared columns (missing keys → NULL, extra keys ignored, values
  coerced by declared type with failures → NULL),
- a malformed line yields NULLs + the raw line in ``_corrupt_record``
  — the quarantine-then-repair ingest pattern.

Rows stream from a generator (no per-file materialization); the
executor memory bound is one line at a time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FIELDS = ["doc_id", "text", "lang", "source", "n_chars"]
DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT, _corrupt_record STRING"
_INT_FIELDS = {"doc_id", "n_chars"}


class _JsonlReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_robust: 'path' option is required")

    def partitions(self):
        files = sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith((".json", ".jsonl", ".txt")) and not f.startswith(("_", "."))
        )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        with open(partition.value, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                    if not isinstance(obj, dict):
                        raise ValueError("not an object")
                except Exception:  # noqa: BLE001 — any parse failure quarantines
                    yield (None, None, None, None, None, line)
                    continue
                row = []
                for f in FIELDS:
                    v = obj.get(f)
                    if f in _INT_FIELDS:
                        try:
                            v = int(v) if v is not None else None
                        except (TypeError, ValueError):
                            v = None
                    elif v is not None and not isinstance(v, str):
                        v = json.dumps(v)
                    row.append(v)
                yield (*row, None)


class JsonlRobustDataSource(DataSource):
    """``spark.read.format("jsonl_robust").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_robust"

    def schema(self) -> str:
        return DDL

    def reader(self, schema):  # noqa: ANN001 — declared schema is fixed
        return _JsonlReader(self.options)


def register(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(JsonlRobustDataSource)


# --- streaming: deterministic parquet replay source ----------------------
# DataSourceStreamReader twin of the batch reader above: replays an
# existing parquet table with offsets = row positions (exactly-once
# under checkpoint/retry because partitions are pure row ranges over an
# immutable file); ``batch_rows`` sets the input-partition granularity
# inside a micro-batch. Built as a TEST HARNESS for streaming operators
# — it replays a bounded corpus without file-moving tricks; a
# production source would track real upstream offsets the same way
# (this is the whole API: initialOffset / latestOffset / partitions /
# read / commit).

class _ParquetReplayReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("parquet_replay: 'path' option is required")
        self._batch = int(options.get("batch_rows", 1000))
        import pyarrow.parquet as pq

        self._total = pq.ParquetFile(self._path).metadata.num_rows

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        # the full table is "available": availableNow drains snapshot
        # the latest offset once, so pacing belongs in partitions()
        # (batch_rows row-ranges), not in the offset advance
        return {"row": self._total}

    def partitions(self, start, end):
        s, e = start["row"], end["row"]
        return [
            InputPartition((lo, min(lo + self._batch, e)))
            for lo in range(s, e, self._batch)
        ] or [InputPartition((s, e))]

    def read(self, partition):
        import pyarrow.parquet as pq

        s, e = partition.value
        if e <= s:
            return
        table = pq.read_table(self._path).slice(s, e - s)
        for batch in table.to_pylist():
            yield tuple(batch.get(f) for f in self._schema_fields)

    _schema_fields = ["event_id", "user_id", "event_type", "value"]

    def commit(self, end):
        pass


class ParquetReplayDataSource(DataSource):
    """``spark.readStream.format("parquet_replay").option("path", file)
    .option("batch_rows", n)`` — replays (event_id, user_id,
    event_type, value) from an events parquet file in deterministic
    row-range micro-batches."""

    @classmethod
    def name(cls) -> str:
        return "parquet_replay"

    def schema(self) -> str:
        return "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"

    def streamReader(self, schema):  # noqa: ANN001
        return _ParquetReplayReader(self.options)


def register_streaming(spark) -> None:
    spark.dataSource.register(ParquetReplayDataSource)
