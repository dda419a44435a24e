"""Versioned snapshot tables: publish/read/rollback/vacuum semantics."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _tbl():
    return tempfile.mkdtemp(prefix="snap_")


def test_snapshot_publish_and_time_travel(spark):
    from lakehouse_spark_spark.sources.snapshots import (
        current_version,
        list_versions,
        read_snapshot,
        write_snapshot,
    )

    d = _tbl()
    try:
        df = spark.range(10).withColumn("v", F.lit("a"))
        assert write_snapshot(df, d) == 0
        assert write_snapshot(df.withColumn("v", F.lit("b")), d) == 1
        assert list_versions(d) == [0, 1]
        assert current_version(d) == 1
        assert read_snapshot(spark, d).select("v").distinct().collect()[0][0] == "b"
        # time travel to the pinned old version
        assert read_snapshot(spark, d, version=0).select("v").distinct().collect()[0][0] == "a"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_rollback_is_pointer_flip(spark):
    from lakehouse_spark_spark.sources.snapshots import (
        current_version,
        read_snapshot,
        rollback,
        write_snapshot,
    )

    d = _tbl()
    try:
        write_snapshot(spark.range(5), d)
        write_snapshot(spark.range(50), d)
        rollback(d, 0)
        assert current_version(d) == 0
        assert read_snapshot(spark, d).count() == 5
        # the newer version's files are untouched — roll forward works too
        rollback(d, 1)
        assert read_snapshot(spark, d).count() == 50
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_reader_isolation(spark):
    """A reader that resolved version N keeps its data across a later
    publish — immutable v-dirs are never rewritten."""
    from lakehouse_spark_spark.sources.snapshots import read_snapshot, write_snapshot

    d = _tbl()
    try:
        write_snapshot(spark.range(7), d)
        reader = read_snapshot(spark, d)  # resolves v=0
        write_snapshot(spark.range(70), d)  # publish v=1
        assert reader.count() == 7
        assert read_snapshot(spark, d).count() == 70
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_vacuum_respects_retention_and_pointer(spark):
    from lakehouse_spark_spark.sources.snapshots import (
        list_versions,
        rollback,
        vacuum,
        write_snapshot,
    )

    d = _tbl()
    try:
        for i in range(4):
            write_snapshot(spark.range(i + 1), d)
        rollback(d, 1)  # pointer at an OLD version
        removed = vacuum(d, keep_last=2)
        # keeps the newest two AND the pointed-at version
        assert removed == [0]
        assert list_versions(d) == [1, 2, 3]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_partitioned_write(spark):
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.sources.snapshots import read_snapshot, write_snapshot

    d = _tbl()
    try:
        ev = load_table(spark, SF_SMALL, "events").withColumn("day", F.to_date("ts"))
        write_snapshot(ev, d, partition_by=["day"])
        back = read_snapshot(spark, d)
        assert back.count() == ev.count()
        assert os.path.isdir(os.path.join(d, "v=0"))
        # partition directories exist inside the version dir
        assert any(p.startswith("day=") for p in os.listdir(os.path.join(d, "v=0")))
    finally:
        shutil.rmtree(d, ignore_errors=True)
