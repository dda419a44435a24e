"""Versioned snapshot tables: time travel, atomic publish, and rollback
on plain parquet.

The transactional-format features a pipeline actually leans on — readers
never see a half-written table, yesterday's version stays queryable,
a bad load is one pointer-flip away from undone — need only two
primitives on an immutable-files store:

1. every write lands in a FRESH directory ``<table>/v=N`` (never
   mutated after publish),
2. a tiny ``_LATEST`` pointer file names the current version, replaced
   atomically (``os.replace`` — POSIX rename, all-or-nothing).

This is precisely the commit protocol of Delta/Iceberg reduced to a
single pointer (their logs add: multi-table transactions, conflict
detection for concurrent WRITERS, and file-level stats; see
sources/tables.py for the format negotiation). Reader isolation holds
because a reader that resolved the pointer keeps reading its version's
immutable directory regardless of later publishes; ``vacuum`` is the
one destructive op and respects a retention count for exactly that
reason. At 100 TB nothing changes: the pointer is O(1), each version is
a normal partitioned parquet dataset, and storage cost is bounded by
``vacuum(keep_last=k)``.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_VDIR = re.compile(r"^v=(\d+)$")


def list_versions(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _VDIR.match(name)
        if m and os.path.isdir(os.path.join(table_dir, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(table_dir: str) -> int | None:
    p = os.path.join(table_dir, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def _set_pointer(table_dir: str, version: int) -> None:
    # write-temp + os.replace: readers see the old or the new pointer,
    # never a torn one.
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._latest_")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(table_dir, _POINTER))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_snapshot(df: DataFrame, table_dir: str, partition_by: list[str] | None = None) -> int:
    """Publish a new immutable version; returns its number. The data
    write happens entirely before the pointer flip, so a crash mid-write
    leaves an orphan v-dir (cleaned by vacuum) and the table still
    serving the previous version."""
    os.makedirs(table_dir, exist_ok=True)
    versions = list_versions(table_dir)
    n = (versions[-1] + 1) if versions else 0
    vdir = os.path.join(table_dir, f"v={n}")
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(vdir)
    _set_pointer(table_dir, n)
    return n


def read_snapshot(spark: SparkSession, table_dir: str, version: int | None = None) -> DataFrame:
    """Time travel: read the pinned ``version``, or the current pointer."""
    v = current_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published version in {table_dir}")
    vdir = os.path.join(table_dir, f"v={v}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} not found in {table_dir}")
    return spark.read.parquet(vdir)


def rollback(table_dir: str, version: int) -> None:
    """Point the table at an older (existing) version — an O(1) undo
    that touches no data files."""
    if version not in list_versions(table_dir):
        raise FileNotFoundError(f"version {version} not found in {table_dir}")
    _set_pointer(table_dir, version)


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (never the one the
    pointer names). Returns the versions removed."""
    versions = list_versions(table_dir)
    cur = current_version(table_dir)
    keep = set(versions[-keep_last:]) | ({cur} if cur is not None else set())
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(table_dir, f"v={v}"))
            removed.append(v)
    return removed
