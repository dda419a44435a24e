"""Skew operators and the SQL front-end surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_salted_join_equals_plain_join(spark):
    from lakehouse_spark_spark.operators.skew import salted_join

    # heavily skewed probe side: key 1 is 90% of rows
    probe = spark.createDataFrame([(i, 1 if i % 10 else 2) for i in range(200)], ["rid", "k"])
    build = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], ["k", "v"])
    plain = {(r["rid"], r["v"]) for r in probe.join(build, "k").collect()}
    salted = {(r["rid"], r["v"]) for r in salted_join(probe, build, on="k", buckets=4, entropy_col="rid").collect()}
    assert salted == plain
    assert len(salted) == 200


def test_salt_distribution_spreads_hot_key(spark):
    from lakehouse_spark_spark.operators.skew import add_salt

    df = spark.createDataFrame([(i, 1) for i in range(1000)], ["rid", "k"])
    salts = add_salt(df, "s", 8, "rid").groupBy("s").count().collect()
    # all 8 salt buckets used, none holding more than ~3x the mean
    assert len(salts) == 8
    assert max(r["count"] for r in salts) < 3 * (1000 / 8)


def test_salted_shuffle_avoids_straggler_partition(spark):
    """Deliberately skewed key (one user owns 50% of events): the plain
    key-partitioned shuffle funnels the hot key into one straggler
    partition, the salted layout bounds every partition near the mean —
    the task-size proof behind SCALE.md's salting contract."""
    from lakehouse_spark_spark.operators.skew import add_salt, salted_join

    n, parts = 20_000, 16
    rows = [(i, 1 if i % 2 == 0 else (i % 50) + 2, float(i % 97)) for i in range(n)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "value"])
    mean = n / parts

    plain_sizes = [
        r["count"]
        for r in df.repartition(parts, "user_id").groupBy(F.spark_partition_id().alias("p")).count().collect()
    ]
    salted_sizes = [
        r["count"]
        for r in add_salt(df, "__salt", parts, "event_id")
        .repartition(parts, "user_id", "__salt")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    ]
    assert max(plain_sizes) >= 0.5 * n  # the straggler: hot key in one task
    assert max(salted_sizes) <= 2.5 * mean  # salted: bounded near the mean
    assert sum(salted_sizes) == n  # nothing lost

    # and the salted JOIN stays row-identical to the plain join on the
    # same skewed data (round-1 only proved this on uniform keys)
    users = spark.createDataFrame([(u, f"u{u}") for u in range(1, 52)], ["user_id", "name"])
    plain_join = {
        (r["event_id"], r["name"]) for r in df.join(users, "user_id").select("event_id", "name").collect()
    }
    salted_join_rows = {
        (r["event_id"], r["name"])
        for r in salted_join(df, users, on="user_id", buckets=8, entropy_col="event_id")
        .select("event_id", "name")
        .collect()
    }
    assert salted_join_rows == plain_join


def test_sql_entry_matches_dataframe_entry(spark):
    from lakehouse_spark_spark.plans.queries import registry

    reg = registry()
    sql_rows = {
        (r["c_custkey"], r["total_revenue"])
        for r in reg["sql_revenue_by_customer_90d"].builder(spark, SF_SMALL).collect()
    }
    df_rows = {
        (r["c_custkey"], r["total_revenue"])
        for r in reg["revenue_by_customer_90d"].builder(spark, SF_SMALL).collect()
    }
    assert sql_rows == df_rows and len(sql_rows) > 0


def test_aqe_splits_skewed_join_partition(spark):
    """The FIRST line of defense at 100 TB — AQE's OptimizeSkewedJoin —
    demonstrably fires on a hot key: with thresholds scaled to local
    data sizes, the executed adaptive plan shows the skewed partition
    split (SortMergeJoin(skew=true) + AQEShuffleRead skewed). The
    salted operators in operators/skew.py are the ESCAPE HATCH for the
    cases AQE can't split (aggregation hot keys, broadcast-ineligible
    build sides); this pins down that the default path works too."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        # key 7 owns 95% of the probe side
        left = spark.range(200000).select(
            F.when(F.col("id") % 20 != 0, 7).otherwise(F.col("id") % 97).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(200).select((F.col("id") % 97).alias("k"), (F.col("id") * 2).alias("r"))
        j = left.join(right, "k").select("k")
        rows = j.collect()  # finalize the adaptive plan
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan
        # correctness unaffected by the split: every left row with a
        # matching key appears exactly per-match
        assert len(rows) == 400620
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
