"""Plan-shape assertions for the round-4 rewrites — locks in the
physical strategies the rewrites exist for (the lint guarantees the
ABSENCE of bad shapes; these assert the PRESENCE of the good ones)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    from lakehouse_spark_spark.plans.queries import registry

    df = registry()[name].builder(spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_spend_distribution_uses_range_partition_and_broadcast_offsets(spark):
    plan = _plan(spark, "customer_spend_distribution")
    # the distrank pipeline: checkpointed range-partitioned scan feeds a
    # PARTITIONED window, offsets arrive via broadcast join
    assert "ExistingRDD" in plan  # localCheckpoint-pinned pid assignment
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan


def test_exact_percentiles_has_no_global_sort(spark):
    plan = _plan(spark, "order_price_exact_percentiles")
    # global orderBy would appear as a Sort over a rangepartitioning
    # exchange feeding the FINAL aggregation — the distrank form's final
    # stage is a plain global aggregate over the prefix table
    assert "TakeOrderedAndProject" not in plan
    assert plan.count("Window") <= 1  # only the per-pid prefix window


def test_top_supplier_is_take_ordered(spark):
    plan = _plan(spark, "top_supplier_by_revenue")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_minhash_spreads_the_signature_scan(spark):
    plan = _plan(spark, "minhash_lsh_candidates")
    # the _tp round-robin exchange that parallelizes the 64-hash
    # signature pass must sit in the plan (or the scan itself must have
    # multiple splits — never true for the local small files)
    assert "REPARTITION" in plan or "RoundRobinPartitioning" in plan or "ExistingRDD" in plan


def test_dpp_query_still_prunes_dynamically(spark):
    plan = _plan(spark, "dpp_selective_year_revenue")
    assert "dynamicpruning" in plan.lower()
    assert "Window" not in plan  # the literal-threshold rewrite


def test_ewma_is_equi_join(spark):
    plan = _plan(spark, "daily_events_ewma")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
