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
