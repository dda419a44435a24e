"""Declarative data-quality check registry.

Reference parity (SURVEY.md §2.11): null-rate (src/pipeline.py:197-208),
duplicate-rate (:214-225), orphan-rate (:231-246), each compared to a
threshold → PASS/FAIL row in a 6-column results table (:248-251).

Engineering upgrade over the reference: the reference runs one Spark
*action per count* in the Python driver (≥7 jobs) and does the rate
arithmetic driver-side. Here every check is a single-pass aggregation
expression, all checks on one table fuse into ONE job, and rates are
computed inside Spark — at 100 TB the difference is N full scans vs 1.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DQCheck:
    check_name: str
    table_name: str
    metric: Column  # aggregate expression → double
    threshold: float
    details: str = ""


def null_rate(col: str) -> Column:
    """count(col IS NULL)/count(*) as a single avg aggregate."""
    return F.avg(F.col(col).isNull().cast("double"))


def duplicate_rate(key: str) -> Column:
    """(count - countDistinct(key))/count, guarded for empty input."""
    total = F.count(F.lit(1))
    return F.when(total > 0, (total - F.count_distinct(F.col(key))).cast("double") / total).otherwise(F.lit(0.0))


def run_checks(df: DataFrame, checks: list[DQCheck]) -> DataFrame:
    """Evaluate all checks for one table in a single aggregation job and
    emit the reference's results schema (src/pipeline.py:248-251)."""
    # coalesce: aggregates over an EMPTY table yield null (e.g. avg in
    # null_rate) — an empty-but-valid input is a 0.0 rate / PASS, not a
    # null-metric FAIL.
    agg = df.agg(*[F.coalesce(c.metric.cast("double"), F.lit(0.0)).alias(f"m{i}") for i, c in enumerate(checks)])
    metrics = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c.check_name).alias("check_name"),
                        F.lit(c.table_name).alias("table_name"),
                        F.col(f"m{i}").alias("metric_value"),
                        F.lit(float(c.threshold)).alias("threshold"),
                        F.lit(c.details).alias("details"),
                    )
                    for i, c in enumerate(checks)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return metrics.withColumn(
        "status", F.when(F.col("metric_value") <= F.col("threshold"), F.lit("PASS")).otherwise(F.lit("FAIL"))
    ).select("check_name", "table_name", "metric_value", "threshold", "status", "details")


def orphan_rate_df(
    fact: DataFrame,
    parent: DataFrame,
    key: str,
    check_name: str,
    table_name: str,
    threshold: float,
    parent_key: str | None = None,
) -> DataFrame:
    """Orphan-rate as ONE job: broadcast-left-join the parent key set and
    average the miss indicator (vs the reference's two count actions +
    driver arithmetic, src/pipeline.py:231-246)."""
    keys = parent.select(F.col(parent_key or key).alias("__k")).distinct()
    joined = fact.join(F.broadcast(keys), fact[key] == F.col("__k"), "left")
    out = joined.agg(F.avg(F.col("__k").isNull().cast("double")).alias("metric_value"))
    return out.select(
        F.lit(check_name).alias("check_name"),
        F.lit(table_name).alias("table_name"),
        F.coalesce(F.col("metric_value"), F.lit(0.0)).alias("metric_value"),
        F.lit(float(threshold)).alias("threshold"),
        F.when(F.coalesce(F.col("metric_value"), F.lit(0.0)) <= threshold, F.lit("PASS")).otherwise(F.lit("FAIL")).alias("status"),
        F.lit(f"orphan {key}").alias("details"),
    )


def profile_columns(df, columns: list[str]) -> "DataFrame":
    """Generic per-column profile in LONG format — one row per column:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value), values
    rendered as strings so heterogeneous columns stack. One pass per
    profiled column fused into a single job (the aggregates union);
    each branch is a map-side-combined scan aggregate, no joins."""
    from pyspark.sql import functions as F

    parts = []
    for c in columns:
        col = F.col(c)
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.when(col.isNull(), 1)).alias("n_nulls"),
                F.count_distinct(col).alias("n_distinct"),
                F.min(col).cast("string").alias("min_value"),
                F.max(col).cast("string").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
