"""Source/sink round-trips: JSON, ORC, typed CSV."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_jsonl_roundtrip(spark):
    from lakehouse_spark_spark.sources.loaders import read_jsonl
    from lakehouse_spark_spark.sources.sinks import write_jsonl

    d = tempfile.mkdtemp(prefix="jsonl_")
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
        write_jsonl(df, f"{d}/t")
        schema = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])
        back = read_jsonl(spark, f"{d}/t", schema)
        assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_orc_roundtrip_partitioned(spark):
    from lakehouse_spark_spark.sources.loaders import read_orc
    from lakehouse_spark_spark.sources.sinks import write_orc

    d = tempfile.mkdtemp(prefix="orc_")
    try:
        df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], ["id", "part"])
        write_orc(df, f"{d}/t", partition_by=["part"])
        back = read_orc(spark, f"{d}/t")
        assert back.count() == 3
        # partition pruning: filter on the partition column prunes files
        pruned = back.filter(F.col("part") == "x")
        assert pruned.count() == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_read_csv_typed_malformed_to_null(spark):
    import os

    from lakehouse_spark_spark.sources.loaders import read_csv_typed

    d = tempfile.mkdtemp(prefix="csv_")
    try:
        p = os.path.join(d, "t.csv")
        with open(p, "w") as f:
            f.write("id,qty\n1,5\n2,notanumber\n")
        schema = T.StructType([T.StructField("id", T.IntegerType()), T.StructField("qty", T.IntegerType())])
        rows = {r["id"]: r["qty"] for r in read_csv_typed(spark, p, schema).collect()}
        assert rows == {1: 5, 2: None}  # malformed -> null, not an ANSI throw
    finally:
        shutil.rmtree(d, ignore_errors=True)
