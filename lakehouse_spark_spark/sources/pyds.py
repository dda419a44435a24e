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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
