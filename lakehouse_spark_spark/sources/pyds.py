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
                        # Coercion failures -> NULL, including lossy
                        # ones: a non-integral float (1.9) or a bool is
                        # NULLed, never silently truncated to an int.
                        if isinstance(v, bool):
                            v = None
                        elif isinstance(v, float):
                            v = int(v) if v.is_integer() else None
                        elif v is not None:
                            try:
                                v = int(v)
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
# inside a micro-batch, ``rows_per_trigger`` (optional) paces how many
# rows each trigger exposes (default: everything at once — availableNow
# drains it as a single micro-batch of many row-range partitions).
# Reads are row-group-scoped (never whole-file per partition).
# Built as a TEST HARNESS for streaming operators
# — it replays a bounded corpus without file-moving tricks; a
# production source would track real upstream offsets the same way
# (this is the whole API: initialOffset / latestOffset / partitions /
# read / commit).

# arrow primitive -> Spark DDL for the schema-inferred replay source;
# anything absent is skipped (nested/list columns need a richer mapping
# than the harness warrants)
_ARROW_TO_DDL = {
    "int64": "BIGINT",
    "int32": "INT",
    "int16": "SMALLINT",
    "int8": "TINYINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "STRING",
    "large_string": "STRING",
    "bool": "BOOLEAN",
    "date32[day]": "DATE",
    "timestamp[us]": "TIMESTAMP_NTZ",
    "timestamp[ns]": "TIMESTAMP_NTZ",
}


def _replay_fields(path: str, columns: str | None) -> list[tuple[str, str]]:
    """(name, ddl_type) for the replayed columns: the explicit
    ``columns`` option if given, else every supported-type column of
    the parquet schema in file order."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    by_name = {f.name: str(f.type) for f in schema}
    if columns:
        names = [c.strip() for c in columns.split(",") if c.strip()]
        missing = [n for n in names if n not in by_name]
        if missing:
            raise ValueError(f"parquet_replay: columns not in file: {missing}")
    else:
        names = [f.name for f in schema if str(f.type) in _ARROW_TO_DDL]
    out = []
    for n in names:
        t = by_name[n]
        if t not in _ARROW_TO_DDL:
            raise ValueError(f"parquet_replay: unsupported column type {n}: {t}")
        out.append((n, _ARROW_TO_DDL[t]))
    return out


class _ParquetReplayReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("parquet_replay: 'path' option is required")
        self._schema_fields = [
            n for n, _ in _replay_fields(self._path, options.get("columns"))
        ]
        self._batch = int(options.get("batch_rows", 1000))
        # optional pacing: cap how many rows each latestOffset() call
        # exposes, so a processingTime trigger replays the table across
        # MANY micro-batches instead of one. Default (0) exposes the
        # whole table at once — one micro-batch of many row-range
        # partitions, which is what availableNow drains anyway.
        #
        # Restart contract: the UNPACED default is exactly-once under
        # checkpoint restart — offsets are pure row positions over an
        # immutable file and latestOffset() is stateless. The PACED
        # mode keeps its cursor in memory, so a restarted reader starts
        # at 0; partitions() re-syncs the cursor to every (start, end)
        # range the engine plans, which covers the normal recovery path
        # (the engine replays the last WAL-planned batch before asking
        # for a new latestOffset). The remaining at-least-once hole —
        # a restart where the final pre-crash batch was FULLY committed,
        # so the engine asks latestOffset() first and the fresh cursor
        # under-reports, re-exposing the committed gap — is closed by
        # the optional ``cursor_path`` option: commit() persists the
        # committed offset there (atomic tmp+rename) and a fresh reader
        # seeds its cursor from it. That NARROWS the window, it does not
        # close it: a crash after the engine commits a batch but before
        # commit() persists the cursor still re-exposes that batch on a
        # checkpoint-less restart — paced replay with cursor_path is
        # at-least-once with a one-batch replay window (exactly-once
        # needs the engine's own checkpoint, whose WAL replay the
        # partitions() re-sync above handles). Without cursor_path the
        # paced mode stays documented at-least-once (a test-harness
        # knob; production sources derive latestOffset from upstream
        # state, not memory).
        self._per_trigger = int(options.get("rows_per_trigger", 0))
        self._cursor_path = options.get("cursor_path")
        import pyarrow.parquet as pq

        self._total = pq.ParquetFile(self._path).metadata.num_rows
        self._exposed = 0
        if self._cursor_path:
            import os

            if os.path.exists(self._cursor_path):
                with open(self._cursor_path) as fh:
                    self._exposed = min(int(fh.read().strip() or 0), self._total)

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        if self._per_trigger > 0:
            self._exposed = min(self._exposed + self._per_trigger, self._total)
            return {"row": self._exposed}
        return {"row": self._total}

    def partitions(self, start, end):
        s, e = start["row"], end["row"]
        # re-sync the pacing cursor to whatever range the engine plans:
        # on checkpoint restart the engine replays the last WAL batch
        # through here before the next latestOffset(), so the fresh
        # reader's cursor jumps forward to the replayed high-water mark
        # instead of re-exposing rows from 0 (see __init__ contract).
        self._exposed = max(self._exposed, s, e)
        return [
            InputPartition((lo, min(lo + self._batch, e)))
            for lo in range(s, e, self._batch)
        ] or [InputPartition((s, e))]

    def read(self, partition):
        import pyarrow.parquet as pq

        s, e = partition.value
        if e <= s:
            return
        # Read ONLY the row groups overlapping [s, e) — never the whole
        # file per partition — then slice to the exact row range. Memory
        # bound per task is one row group, independent of file size.
        pf = pq.ParquetFile(self._path)
        pos = 0
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            lo, hi = pos, pos + n
            pos = hi
            if hi <= s or lo >= e:
                continue
            tbl = pf.read_row_group(rg, columns=self._schema_fields)
            sl = tbl.slice(max(s - lo, 0), min(e, hi) - max(s, lo))
            for row in sl.to_pylist():
                yield tuple(row.get(f) for f in self._schema_fields)

    def commit(self, end):
        if self._cursor_path and self._per_trigger > 0:
            import os

            # atomic tmp+rename so a crash mid-write never truncates
            # the cursor; the engine calls commit() only after the
            # batch is fully processed, so seeding latestOffset() from
            # this value on restart skips everything committed BEFORE
            # the last persisted cursor (a crash in the commit→persist
            # gap can still replay that one batch — see pacing contract)
            tmp = f"{self._cursor_path}.tmp"
            with open(tmp, "w") as fh:
                fh.write(str(int(end["row"])))
            os.replace(tmp, self._cursor_path)


class ParquetReplayDataSource(DataSource):
    """``spark.readStream.format("parquet_replay").option("path", file)
    .option("batch_rows", n)[.option("columns", "a,b")]`` — replays ANY
    parquet table in deterministic row-range micro-batches. The schema
    is INFERRED from the parquet footer (all supported-type columns in
    file order, or the explicit ``columns`` subset) — so the same
    harness streams events, documents, or any other fixture.

    Paced mode (``rows_per_trigger`` > 0) is at-least-once across
    restarts; setting ``cursor_path`` persists the committed offset on
    commit() and narrows the replay window to at most the one batch
    between engine commit and cursor persistence (see the
    _ParquetReplayReader pacing contract)."""

    @classmethod
    def name(cls) -> str:
        return "parquet_replay"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("parquet_replay: 'path' option is required")
        fields = _replay_fields(path, self.options.get("columns"))
        return ", ".join(f"{n} {t}" for n, t in fields)

    def streamReader(self, schema):  # noqa: ANN001
        return _ParquetReplayReader(self.options)


def register_streaming(spark) -> None:
    spark.dataSource.register(ParquetReplayDataSource)
