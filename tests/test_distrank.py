"""Distributed global rank / prefix-sum (operators/distrank.py) and the
two-level skyline (operators/skyline.pareto_frontier_2d_distributed).

The invariants: distributed __rn / __cum must equal the single-window
truth for ANY partition count (1, 3, more-partitions-than-rows), ties
must co-locate, and the distributed skyline must return the exact same
set as the single-level operator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.distrank import (
    global_ntile,
    with_global_prefix,
)
from lakehouse_spark_spark.operators.skyline import (
    pareto_frontier_2d_bounded,
    pareto_frontier_2d_distributed,
)


def _vals_df(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, v BIGINT")


@pytest.mark.parametrize("nparts", [1, 3, 50])
def test_global_row_number_matches_window(spark, nparts):
    rows = [(int(x), int(x) % 7) for x in [5, 12, 1, 99, 42, 7, 3, 88, 17, 23, 64, 2]]
    df = _vals_df(spark, rows)
    got, totals = with_global_prefix(df, [F.col("k")], num_partitions=nparts)
    assert totals["__rows"] == len(rows)
    want = {k: i + 1 for i, k in enumerate(sorted(r[0] for r in rows))}
    for r in got.collect():
        assert r["__rn"] == want[r["k"]], (nparts, r)


@pytest.mark.parametrize("nparts", [1, 4])
def test_global_cumsum_matches_window(spark, nparts):
    rows = [(i, (i * 13) % 5 + 1) for i in range(40)]
    df = _vals_df(spark, rows)
    got, totals = with_global_prefix(df, [F.col("k")], sum_cols=("v",), num_partitions=nparts)
    assert totals["v"] == sum(v for _, v in rows)
    run, want = 0, {}
    for k, v in sorted(rows):
        run += v
        want[k] = run
    for r in got.collect():
        assert r["__cum_v"] == want[r["k"]]


def test_ties_colocate_and_cum_counts_peers(spark):
    # duplicate keys must land in one partition; cumsum over a distinct-
    # value table (the customer_spend_distribution shape) counts peers once
    rows = [(5, 1), (5, 1), (3, 1), (9, 1), (5, 1), (3, 1)]
    df = _vals_df(spark, rows).groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    got, totals = with_global_prefix(df, [F.col("k")], sum_cols=("c",), num_partitions=3)
    assert totals["__rows"] == 3 and totals["c"] == 6
    out = {r["k"]: (r["__rn"], r["__cum_c"]) for r in got.collect()}
    assert out == {3: (1, 2), 5: (2, 5), 9: (3, 6)}


def test_decimal_and_double_sum_cols_keep_type(spark):
    # ADVICE r4 (low): offset columns used to be hardcoded BIGINT,
    # truncating decimal/double running sums. The offset type now
    # follows SUM(col)'s analyzed type.
    from decimal import Decimal

    rows = [(i, Decimal(f"{i}.25"), i + 0.5) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "k long, d decimal(10,2), f double")
    got, totals = with_global_prefix(df, [F.col("k")], sum_cols=("d", "f"), num_partitions=3)
    run_d, run_f, want = Decimal(0), 0.0, {}
    for k, d, f in sorted(rows):
        run_d += d
        run_f += f
        want[k] = (run_d, run_f)
    assert totals["d"] == run_d and abs(totals["f"] - run_f) < 1e-9
    for r in got.collect():
        wd, wf = want[r["k"]]
        assert r["__cum_d"] == wd, r
        assert abs(r["__cum_f"] - wf) < 1e-9, r


def test_empty_input(spark):
    df = _vals_df(spark, []).filter("k > 0")
    got, totals = with_global_prefix(df, [F.col("k")])
    assert totals["__rows"] == 0
    assert got.count() == 0


@pytest.mark.parametrize(("n", "k"), [(10, 3), (9, 3), (2, 3), (1, 1), (100, 7), (7, 7)])
def test_global_ntile_matches_sql_ntile(spark, n, k):
    df = spark.range(1, n + 1).select((F.col("id")).alias("rn"))
    got = df.select("rn", global_ntile(F.col("rn"), n, k).alias("b")).collect()
    want = {
        r["rn"]: r["b"]
        for r in df.select(
            "rn", F.ntile(k).over(Window.orderBy("rn")).alias("b")
        ).collect()
    }
    for r in got:
        assert r["b"] == want[r["rn"]], (n, k, r)


@pytest.mark.parametrize("nparts", [1, 2, 8])
def test_distributed_skyline_equals_single_level(spark, nparts):
    import random

    rng = random.Random(42)
    rows = [(i, rng.randrange(0, 50), rng.randrange(0, 50)) for i in range(300)]
    # add duplicate points and x-ties to exercise co-location
    rows += [(1000, 5, 40), (1001, 5, 40), (1002, 5, 39)]
    df = spark.createDataFrame(rows, "id BIGINT, x BIGINT, y BIGINT")
    single = {
        (r["id"], r["__x"], r["__y"])
        for r in pareto_frontier_2d_bounded(df, F.col("x"), F.col("y"), ["id"]).collect()
    }
    dist = {
        (r["id"], r["__x"], r["__y"])
        for r in pareto_frontier_2d_distributed(
            df, F.col("x"), F.col("y"), ["id"], num_partitions=nparts
        ).collect()
    }
    assert dist == single
    # sanity: frontier is mutually non-dominating
    pts = [(x, y) for _, x, y in dist]
    for a in pts:
        for b in pts:
            assert not (
                a != b and b[0] <= a[0] and b[1] >= a[1] and (b[0] < a[0] or b[1] > a[1])
            )


# --- hypothesis property: distributed rank == sorted position, any data ---
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60, unique=True),
    nparts=st.sampled_from([1, 2, 5, 17]),
)
def test_global_row_number_property(spark, vals, nparts):
    """For ANY unique-int multiset and ANY partition count, __rn equals
    the 1-based sorted position and totals count the rows."""
    df = spark.createDataFrame([(v,) for v in vals], "k BIGINT")
    got, totals = with_global_prefix(df, [F.col("k")], num_partitions=nparts)
    assert totals["__rows"] == len(vals)
    want = {v: i + 1 for i, v in enumerate(sorted(vals))}
    assert {r["k"]: r["__rn"] for r in got.collect()} == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=50
    ),
    nparts=st.sampled_from([1, 3, 9]),
)
def test_distributed_skyline_property(spark, pts, nparts):
    """Distributed frontier == brute-force frontier for ANY point set
    (duplicates included) and ANY partition count."""
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id BIGINT, x BIGINT, y BIGINT")

    def dominated(a, b):  # b dominates a
        return b[0] <= a[0] and b[1] >= a[1] and (b[0] < a[0] or b[1] > a[1])

    want = {
        (i, x, y)
        for i, x, y in rows
        if not any(dominated((x, y), (bx, by)) for _, bx, by in rows)
    }
    got = {
        (r["id"], r["__x"], r["__y"])
        for r in pareto_frontier_2d_distributed(
            df, F.col("x"), F.col("y"), ["id"], num_partitions=nparts
        ).collect()
    }
    assert got == want
