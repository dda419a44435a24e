"""Sinks: parquet (the scale path) and reference-parity single-file CSV.

Reference parity: src/pipeline.py:21-36 writes every gold table through
``coalesce(1)`` + driver-side glob/rename (SURVEY.md S3/S4). We keep a
utility with those semantics for golden-output replay, but the default
sink is overwrite-mode parquet, optionally partitioned — at 100 TB a
``coalesce(1)`` CSV write serializes the whole job through one task and
is exactly what NOT to do.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Idempotent columnar sink (SURVEY.md S4: re-runs don't duplicate).

    ``partition_by`` a low-cardinality column (e.g. a date) to get
    dynamic partition pruning on downstream scans.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Newline-delimited JSON sink (interchange format; columnar parquet
    remains the data-plane default)."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_single_csv(df: DataFrame, out_path: str) -> None:
    """Reference-parity single-file CSV sink (src/pipeline.py:21-36):
    write to a temp dir with one task, move the part file into place.
    For small control-plane outputs (DQ results, run logs) only."""
    tmp = out_path + "__tmp"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if os.path.exists(out_path):
        os.remove(out_path)
    shutil.move(part, out_path)
    shutil.rmtree(tmp)


def compact_parquet(spark, path: str, target_file_mb: int = 256) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(bytes / target) files. The lakehouse maintenance op every
    streaming/incremental sink eventually needs — thousands of KB-scale
    part files turn scans into metadata storms. Returns the new file
    count. (Delta/Iceberg do this as OPTIMIZE; this is the plain-parquet
    form: full rewrite through a temp dir, then swap. The rmtree-then-move
    window is NOT crash-atomic; a real deployment swaps via a
    transactional table format or a rename into a versioned path.)"""
    import math
    import os
    import shutil

    size = sum(os.path.getsize(os.path.join(dp, f)) for dp, _, fs in os.walk(path) for f in fs)
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


def upsert_parquet(spark, path: str, updates: DataFrame, key_cols: list[str]) -> None:
    """MERGE-emulation for plain parquet: existing rows whose key appears
    in ``updates`` are replaced; new keys are appended. Full
    read-antijoin-union-rewrite — the plain-parquet cost of an upsert,
    and the reason transactional formats (Delta MERGE INTO) exist: they
    rewrite only the touched files. Same non-crash-atomic swap caveat as
    compact_parquet."""
    import os
    import shutil

    existing = spark.read.parquet(path) if os.path.exists(path) else None
    if existing is not None:
        keys = updates.select(*key_cols).distinct()
        kept = existing.join(keys, on=key_cols, how="left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    tmp = path.rstrip("/") + "__upsert"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    shutil.move(tmp, path)
