"""As-of join and banded range join: literal-data unit tests plus
hypothesis property tests against a pandas merge_asof reference."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _ts(s):
    return F.lit(s).cast("timestamp")


def test_asof_join_basic(spark):
    from lakehouse_spark_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "l1"), (1, "2024-01-01 12:00:00", "l2"), (2, "2024-01-01 10:00:00", "l3")],
        ["k", "ts_s", "tag"],
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 100), (1, "2024-01-01 11:00:00", 200), (3, "2024-01-01 09:00:00", 300)],
        ["k", "ts_s", "v"],
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    out = {r["tag"]: r["right_v"] for r in asof_join(left, right, "k", "ts", "ts", ["v"]).collect()}
    assert out == {"l1": 100, "l2": 200, "l3": None}


def test_asof_join_inclusive_same_ts(spark):
    from lakehouse_spark_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, "2024-01-01 10:00:00")], ["k", "ts_s"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("ts")
    )
    right = spark.createDataFrame([(1, "2024-01-01 10:00:00", 7)], ["k", "ts_s", "v"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "v"
    )
    row = asof_join(left, right, "k", "ts", "ts", ["v"]).collect()[0]
    assert row["right_v"] == 7  # inclusive: right at equal ts is visible


def test_asof_join_inner_drops_unmatched(spark):
    from lakehouse_spark_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(9, "2024-01-01 10:00:00")], ["k", "ts_s"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("ts")
    )
    right = spark.createDataFrame([(1, "2024-01-01 09:00:00", 5)], ["k", "ts_s", "v"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "v"
    )
    assert asof_join(left, right, "k", "ts", "ts", ["v"], how="inner").count() == 0


def test_banded_range_join_boundaries(spark):
    from lakehouse_spark_spark.operators.temporal import banded_range_join

    left = spark.createDataFrame([(1, "2024-01-01 10:00:00", "L")], ["k", "ts_s", "t"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("lts"), "t"
    )
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "same"),      # excluded (strict >)
            (1, "2024-01-01 10:02:00", "inside"),
            (1, "2024-01-01 10:05:00", "boundary"),  # included (<= gap)
            (1, "2024-01-01 10:05:01", "outside"),   # excluded
            (2, "2024-01-01 10:01:00", "otherkey"),  # excluded (key)
        ],
        ["k", "ts_s", "t2"],
    ).select("k", F.col("ts_s").cast("timestamp").alias("rts"), "t2")
    got = {r["t2"] for r in banded_range_join(left, right, "k", "lts", "rts", 300).collect()}
    assert got == {"inside", "boundary"}


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25),
    rights=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 99)), min_size=1, max_size=25),
)
def test_asof_join_matches_pandas_merge_asof(spark_global, lefts, rights):
    """Property: our distributed as-of join == pandas.merge_asof on any
    random (key, ts) multisets (ts deduped per key per side)."""
    from lakehouse_spark_spark.operators.temporal import asof_join

    spark = spark_global
    lpdf = pd.DataFrame(sorted(set(lefts)), columns=["k", "t"]).assign(ts=lambda d: pd.to_datetime(d["t"], unit="s"))
    rpdf = (
        pd.DataFrame([(k, t, v) for (k, t, v) in rights], columns=["k", "t", "v"])
        .drop_duplicates(subset=["k", "t"])
        .assign(ts=lambda d: pd.to_datetime(d["t"], unit="s"))
    )
    expected = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rpdf.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
    )
    exp = {(int(r.k), int(r.t_x)): (None if pd.isna(r.v) else int(r.v)) for r in expected.itertuples()}

    ldf = spark.createDataFrame(lpdf[["k", "ts"]])
    rdf = spark.createDataFrame(rpdf[["k", "ts", "v"]])
    out = asof_join(ldf, rdf, "k", "ts", "ts", ["v"]).collect()
    got = {(r["k"], int(r["ts"].timestamp())): r["right_v"] for r in out}
    assert got == exp


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
