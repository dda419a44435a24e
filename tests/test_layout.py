"""Z-order layout: pure re-ordering + multi-column file skipping."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_zorder_is_pure_reordering(spark):
    from lakehouse_spark_spark.sources.layout import write_zordered
    from lakehouse_spark_spark.sources.loaders import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    d = tempfile.mkdtemp(prefix="zorder_")
    try:
        write_zordered(li, d, ["l_partkey", "l_suppkey"], bits=6, files=8)
        z = spark.read.parquet(d)
        assert z.count() == li.count()
        # same multiset of rows (sum over key+payload hash is order-free)
        h = lambda df: df.select(
            F.sum(
                F.xxhash64("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity").cast(
                    "decimal(38,0)"  # long sum overflows under ANSI
                )
            ).alias("h")
        ).collect()[0]["h"]
        assert h(z) == h(li)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zorder_shrinks_both_column_spans(spark):
    """The figure of merit: after z-ordering, the mean per-file min/max
    span of BOTH curve columns is a small fraction of the global span.
    A plain sort by l_partkey only shrinks l_partkey's."""
    from lakehouse_spark_spark.sources.layout import file_column_spans, write_zordered
    from lakehouse_spark_spark.sources.loaders import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    dz = tempfile.mkdtemp(prefix="zorder_")
    ds = tempfile.mkdtemp(prefix="sorted_")
    try:
        write_zordered(li, dz, ["l_partkey", "l_suppkey"], bits=6, files=8)
        li.repartitionByRange(8, "l_partkey").sortWithinPartitions("l_partkey").write.mode(
            "overwrite"
        ).parquet(ds)
        z_spans = file_column_spans(dz, ["l_partkey", "l_suppkey"])
        s_spans = file_column_spans(ds, ["l_partkey", "l_suppkey"])
        # z-order: both columns skip; 8 files -> ideal span ~0.35 each
        assert z_spans["l_partkey"] < 0.6, z_spans
        assert z_spans["l_suppkey"] < 0.6, z_spans
        # plain sort: leading column tight, trailing column useless
        assert s_spans["l_partkey"] < 0.3, s_spans
        assert s_spans["l_suppkey"] > 0.9, s_spans
    finally:
        shutil.rmtree(dz, ignore_errors=True)
        shutil.rmtree(ds, ignore_errors=True)


def test_zvalue_locality(spark):
    """Rows with identical (bucketed) coordinates get identical z-values;
    z range partitioning therefore co-locates them."""
    from lakehouse_spark_spark.sources.layout import zvalue
    from lakehouse_spark_spark.sources.loaders import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select("l_partkey", "l_suppkey")
    z = li.withColumn("z", zvalue(li, ["l_partkey", "l_suppkey"], bits=6))
    n_distinct_pairs = li.distinct().count()
    n_distinct_z = z.select("z").distinct().count()
    assert 0 < n_distinct_z <= n_distinct_pairs
