"""Registry-wide plan lint (round-3 verdict ask #2): no unpartitioned
Window over unbounded input, no CartesianProduct, no nested-loop join
outside the audited whitelist — permanently prevents the plan class
fixed in round 4 (single-task global sorts at 100 TB).

The full-registry sweep lives in tools/plan_lint.py (run per-round as
``python tools/plan_lint.py``); this test runs the same linter over the
whole registry at sf0.001, plus targeted negative/positive fixtures so
the linter itself is tested.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from plan_lint import NLJ_WHITELIST, WINDOW_WHITELIST, lint_df, lint_registry  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_linter_flags_unpartitioned_window(spark):
    df = spark.range(100).withColumn("r", F.row_number().over(Window.orderBy("id")))
    assert "unpartitioned_window" in lint_df(df)


def test_linter_accepts_partitioned_window(spark):
    df = spark.range(100).withColumn(
        "r", F.row_number().over(Window.partitionBy(F.col("id") % 3).orderBy("id"))
    )
    assert lint_df(df) == {}


def test_linter_accepts_window_over_limit(spark):
    df = (
        spark.range(100)
        .limit(5)
        .withColumn("r", F.row_number().over(Window.orderBy("id")))
    )
    assert lint_df(df) == {}


def test_linter_accepts_scalar_attach_bnlj(spark):
    tot = spark.range(100).agg(F.sum("id").alias("t"))
    df = spark.range(100).crossJoin(F.broadcast(tot))
    assert lint_df(df) == {}


def test_linter_flags_nonscalar_bnlj(spark):
    small = spark.range(5).select(F.col("id").alias("j"))
    df = spark.range(100).join(F.broadcast(small), F.col("id") > F.col("j"))
    assert "nested_loop_join" in lint_df(df)


@pytest.mark.slow
def test_full_registry_plan_lint(spark):
    violations, stale, errors = lint_registry(spark, SF)
    assert errors == {}, errors
    assert stale == [], f"stale whitelist entries (pattern gone — remove): {stale}"
    assert violations == {}, violations


def test_whitelists_documented():
    for wl in (WINDOW_WHITELIST, NLJ_WHITELIST):
        for name, reason in wl.items():
            assert len(reason) > 10, f"{name}: whitelist entries need a real reason"


def test_no_registered_query_reaches_bounded_baselines():
    """Verification-only `_bounded` operators (100 TB-unsafe twins kept
    to verify the distributed forms) must be unreachable from plans/."""
    from tools.plan_lint import lint_bounded_reachability

    assert lint_bounded_reachability() == []


def test_linter_flags_plan_explosion(spark):
    """A reused-without-checkpoint frame replicates its plan per
    consumer (the round-8 triangle_counts bug: 191 exchanges). The
    fixture unions 26 copies of a distinct() — 26 shuffle exchanges in
    one plan — which must trip the _MAX_SHUFFLES rule."""
    from plan_lint import _MAX_SHUFFLES

    d = spark.range(100).select((F.col("id") % 7).alias("k")).distinct()
    df = d
    for _ in range(_MAX_SHUFFLES + 1):
        df = df.union(d)
    assert "plan_explosion" in lint_df(df)
