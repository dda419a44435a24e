"""Time-series repair and monitoring operators over the events table:
dense gap-filled series with forward fill, cohort retention, and
rolling-window anomaly scores.

No analog in the reference (its only time logic is dim_date derivation,
src/pipeline.py:150-170); these are the operators an hourly/daily
metrics pipeline needs once data has holes or needs trend monitoring.

Scale notes:
- ``gap_fill_ffill`` builds the dense grid with sequence()+explode per
  key — grid size is |keys| x |buckets|, generated in-executor, never
  collected. The forward-fill window partitions by key: state is one
  row per key, and each key's series sorts within its partition (the
  same shape as sessionization). Skew = longest series, bounded by the
  time range, not data volume.
- ``cohort_retention`` is two keyed aggregations (user-min, then
  cohort-month pair counts); both combiner-friendly, keys uniform.
- ``rolling_anomaly`` uses integer window sums (exact in any engine)
  and derives mean/variance in ONE closed-form double expression so
  the z-score hashes identically across engines — never a native
  stddev aggregate, whose accumulation algorithm is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_ffill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-key time series: bucket-truncate, aggregate, re-grid to
    EVERY bucket between the global min and max, and forward-fill the
    value column across gaps.

    Output: (key, bucket_ts, n_events, sum_value, filled_value) — one
    row per key per bucket; ``n_events`` is 0 and ``sum_value`` null on
    generated rows; ``filled_value`` carries the last seen sum forward
    (null until a key's first observation).
    """
    agg = (
        events.groupBy(F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    bounds = agg.select(F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx"))
    keys = events.select(key_col).distinct()
    grid = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(F.sequence("mn", "mx", F.expr(f"INTERVAL 1 {bucket.upper()}"))).alias("bucket_ts"),
        )
    )
    joined = grid.join(agg, [key_col, "bucket_ts"], "left").select(
        key_col,
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
    )
    w = Window.partitionBy(key_col).orderBy("bucket_ts").rowsBetween(Window.unboundedPreceding, 0)
    return joined.withColumn("filled_value", F.last("sum_value", ignorenulls=True).over(w))


def cohort_retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Monthly cohort retention matrix: users grouped by their first
    active month; for each (cohort_month, activity_month) pair, the
    distinct returning users and their share of the cohort.

    Output: (cohort_month, activity_month, months_since, n_users,
    cohort_size, retention) — months_since 0 rows have retention 1.0.
    """
    act = events.select(
        F.col(user_col).alias("user_id"), F.date_trunc("month", F.col(ts_col)).alias("activity_month")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("activity_month").alias("cohort_month"))
    pairs = (
        act.join(first, "user_id")
        .groupBy("cohort_month", "activity_month")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
    size = pairs.filter(F.col("cohort_month") == F.col("activity_month")).select(
        F.col("cohort_month").alias("c2"), F.col("n_users").alias("cohort_size")
    )
    months_since = (
        (F.year("activity_month") - F.year("cohort_month")) * 12
        + F.month("activity_month")
        - F.month("cohort_month")
    ).cast("int")
    return (
        pairs.join(F.broadcast(size), F.col("cohort_month") == F.col("c2"))
        .select(
            "cohort_month",
            "activity_month",
            months_since.alias("months_since"),
            "n_users",
            "cohort_size",
            F.round(F.col("n_users") / F.col("cohort_size"), 6).alias("retention"),
        )
    )


def rolling_anomaly(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Daily-count anomaly flags per key: z-score of each day's event
    count against the mean/std of the PRECEDING ``window_days`` days
    (current day excluded — an anomaly must not suppress itself).

    Cross-engine determinism: the window aggregates are integer SUM /
    SUM-of-squares (exact), and mean/variance/z are derived from them
    in one closed-form double expression — identical IEEE arithmetic
    in Spark and the oracle, unlike native stddev whose accumulation
    is engine-specific. Sample variance (n-1); days with fewer than 3
    trailing observations emit a null z.

    Output: (key, day, n, mean_prev, z, is_anomaly) rounded at 6.
    """
    daily = (
        events.groupBy(F.col(key_col), F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(key_col).orderBy("day").rowsBetween(-window_days, -1)
    cnt = F.count(F.col("n")).over(w)
    s1 = F.sum(F.col("n")).over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    mean = s1.cast("double") / cnt
    var = (s2.cast("double") - s1.cast("double") * s1.cast("double") / cnt) / (cnt - 1)
    z = F.when(
        (cnt >= 3) & (var > 0), (F.col("n").cast("double") - mean) / F.sqrt(var)
    )
    return daily.select(
        key_col,
        "day",
        "n",
        F.round(mean, 6).alias("mean_prev"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )
