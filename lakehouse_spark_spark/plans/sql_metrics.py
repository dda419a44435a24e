"""SQL front-end: the reference's metric layer as SQL text over
registered views (SURVEY.md E3 / S5 — the dual surface).

The reference exposes its gold tables to SQL via temp views
(src/pipeline.py:279-281) and ships canonical metric SQL
(submission_Amadeu/sql/metrics.sql:1-31). Same here: register the star
schema as views, run Spark-SQL text — the parser/Analyzer path instead
of the DataFrame builder path, converging on the same Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_spark_spark.sources.loaders import register_views

# Reference metric #1 transposed (metrics.sql:2-12) — identical semantics
# to plans/queries.revenue_by_customer_90d, entered through SQL text.
REVENUE_90D_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= DATE '2001-08-01' - INTERVAL 90 DAY
GROUP BY c.c_custkey, c.c_name
"""

# Reference metric #2 (metrics.sql:16-22)
ORDERS_BY_STATUS_MONTH_SQL = """
SELECT date_trunc('month', o_orderdate) AS order_month,
       o_orderstatus,
       COUNT(*) AS n_orders
FROM orders
GROUP BY date_trunc('month', o_orderdate), o_orderstatus
"""

# Reference metric #3 (metrics.sql:26-30)
AVG_TICKET_SQL = """
WITH order_totals AS (
  SELECT l_orderkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS order_total
  FROM lineitem GROUP BY l_orderkey
)
SELECT COUNT(*) AS n_orders,
       CAST(SUM(order_total) AS DOUBLE) AS sum_total,
       ROUND(CAST(SUM(order_total) AS DOUBLE) / COUNT(*), 2) AS avg_ticket
FROM order_totals
"""


def run_sql_metric(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)
