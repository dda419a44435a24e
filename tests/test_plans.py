"""Physical-plan shape assertions: the scale contract of SCALE.md,
checked automatically. A regression that silently turns a broadcast
join into a shuffle, or un-pushes a filter, fails here — not in a
production incident."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from lakehouse_spark_spark.plans.queries import registry


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def tree_of(df) -> str:
    """Just the operator tree (formatted explain repeats every node in
    the detail section below the tree)."""
    return plan_of(df).split("\n\n(")[0]


def test_revenue_query_broadcasts_dims_and_pushes_filter(spark):
    df = registry()["revenue_by_customer_90d"].builder(spark, SF_SMALL)
    plan = plan_of(df)
    assert tree_of(df).count("BroadcastHashJoin") == 2  # fact never shuffles for joins
    assert "GreaterThanOrEqual(o_orderdate" in plan  # date filter reached the scan
    assert "SortMergeJoin" not in plan
    # column pruning: the lineitem scan reads only the 3 needed columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_pricing_summary_has_partial_aggregation(spark):
    df = registry()["pricing_summary"].builder(spark, SF_SMALL)
    tree = tree_of(df)
    plan = plan_of(df)
    # partial (map-side) agg before the exchange + final after
    assert tree.count("HashAggregate") == 2
    # exactly ONE key shuffle (the group-by); the parallelize_scan
    # round-robin redistribution of a degenerate local scan is allowed.
    # (formatted mode puts the partitioning on the Arguments line)
    assert plan.count("hashpartitioning(") == 1
    assert "LessThanOrEqual(l_shipdate" in plan


def test_orphan_audit_is_broadcast_anti_join(spark):
    plan = plan_of(registry()["orphan_events_audit"].builder(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan  # no fact shuffle


def test_top100_is_take_ordered_not_full_sort(spark):
    plan = plan_of(registry()["top100_orders"].builder(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_text_metrics_are_shuffle_free(spark):
    # Pure projection: no KEY shuffle anywhere in the plan. A single
    # RoundRobinPartitioning exchange is allowed — that's
    # parallelize_scan redistributing a degenerate local scan, which
    # disappears at scale (scan splits >= cores), not operator logic.
    plan = plan_of(registry()["doc_quality"].builder(spark, SF_SMALL))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_bucketed_join_is_shuffle_free(spark):
    """Bucket both fact tables on the join key -> the join needs no
    exchange at all (the sources/tables.write_bucketed contract)."""
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.sources.tables import write_bucketed

    write_bucketed(load_table(spark, SF_SMALL, "orders"), "b_orders", ["o_orderkey"], buckets=4)
    write_bucketed(
        load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_extendedprice"),
        "b_lineitem",
        ["l_orderkey"],
        buckets=4,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the non-broadcast path
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located by bucket layout
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_asof_join_is_single_shuffle(spark):
    """The union+window as-of formulation costs exactly one hash
    exchange (on the join key) — the SCALE.md contract."""
    from lakehouse_spark_spark.operators.temporal import asof_join
    from lakehouse_spark_spark.sources.loaders import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMALL, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "view").select("user_id", "ts", F.col("event_id").alias("vid"))
    df = asof_join(left, right, "user_id", "ts", "ts", ["vid"])
    tree = tree_of(df)
    assert tree.count("Exchange") == 1
    assert "Window" in tree


def test_dynamic_partition_pruning_on_partitioned_gold(spark, tmp_path):
    """Gold written partitioned by a date-derived column + a selective
    dim filter => Catalyst inserts a dynamic pruning subquery so only
    matching partitions are scanned."""
    from lakehouse_spark_spark.sources.loaders import load_table
    from lakehouse_spark_spark.sources.sinks import write_parquet
    from pyspark.sql import functions as F

    orders = load_table(spark, SF_SMALL, "orders").withColumn("order_year", F.year("o_orderdate"))
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["order_year"])
    fact = spark.read.parquet(path)
    years = spark.createDataFrame([(1995, "keep")], ["order_year", "tag"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        joined = fact.join(years, "order_year")
        plan = plan_of(joined)
        assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(order_year" in plan
        got_years = {r["order_year"] for r in joined.select("order_year").distinct().collect()}
        assert got_years == {1995}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_registered_partition_pruned_query_prunes(spark):
    """The registered partition_pruned_monthly_revenue query's scan must
    carry a PartitionFilters entry on order_year — i.e. the year filter
    prunes directories, it doesn't read-then-filter."""
    df = registry()["partition_pruned_monthly_revenue"].builder(spark, SF_SMALL)
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "order_year" in plan.split("PartitionFilters", 1)[1][:200]
    assert df.count() > 0


def test_registered_bucketed_join_query_is_shuffle_free_join(spark):
    """bucketed_join_order_revenue: the fact-fact join runs on the
    bucket layout with ZERO exchange; only the final status aggregation
    shuffles (bounded-cardinality key)."""
    from lakehouse_spark_spark.plans.queries import _bucketed_join_df

    joined = _bucketed_join_df(spark, SF_SMALL)
    jtree = tree_of(joined)
    assert "SortMergeJoin" in jtree
    assert "Exchange" not in jtree  # co-located by bucket layout

    full = registry()["bucketed_join_order_revenue"].builder(spark, SF_SMALL)
    ftree = tree_of(full)
    # exactly one exchange in the whole query: the 3-key status agg
    assert ftree.count("Exchange") == 1


def test_disjunctive_predicate_pushes_common_clauses(spark):
    """Q19 shape: Catalyst must extract the disjunction's common
    conjuncts and push them into the part scan (p_size >= 1 plus the
    brand OR), rather than filtering only after the join."""
    df = registry()["disjunctive_promo_revenue"].builder(spark, SF_SMALL)
    plan = plan_of(df)
    assert "part.parquet" in plan
    after_scan = plan.split("part.parquet", 1)[1]
    assert "p_size" in after_scan[:800], after_scan[:800]
    assert df.count() == 1


def test_runtime_bloom_filter_injected_on_shuffle_join(spark):
    """Spark's InjectRuntimeFilter adds a bloom-filter semi-join pushdown
    on the big (application) side of a shuffle join when the other side
    is small and selective — the non-partition-column sibling of DPP.
    The default applicationSideScanSizeThreshold is 10GB (sized for
    clusters); scoping it down locally shows the mechanism without
    leaking config into other tests."""
    from pyspark.sql import functions as F

    from lakehouse_spark_spark.sources.loaders import load_table
    from tests.conftest import SF_SMALL

    conf = spark.conf
    old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_app = conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        li = load_table(spark, SF_SMALL, "lineitem")
        orders = load_table(spark, SF_SMALL, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy("o_orderpriority").count()
        s = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloomfilter" in s or "bloom_filter" in s, s[:2000]
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", old_app
        )
