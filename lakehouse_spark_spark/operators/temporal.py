"""Temporal join operators Spark lacks natively: as-of join and banded
range join — composed from existing DataFrame ops (SURVEY.md §7 M4
custom-operator rule (a): composition before UDFs).

Scale notes:

- as-of join: union + window formulation. One shuffle on the join key,
  one in-partition sort over (ts, side) — the same cost envelope as a
  sort-merge join, with no point-in-time subquery per row (which would
  be O(n²)) and no driver-side logic. This is the standard distributed
  as-of shape (used for trades⟵quotes, events⟵dimension-snapshots).
- range join: inequality predicates alone give Spark a nested-loop
  join. Banding restores an equi-key: bucket timestamps by the band
  width, explode the probe side into its two candidate buckets, join on
  (key, bucket) equi, then apply the exact range predicate. Cost is
  |pairs within band| instead of |left|×|right|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "left",
    tolerance: Column | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same ``on`` key (inclusive,
    pandas.merge_asof semantics).

    If the right side has multiple rows per (key, ts), which of them
    wins is partition-order-dependent — dedup the right side first
    (e.g. dedup_latest on [on, right_ts]) when that matters.
    ``tolerance``: optional max lookback interval; matches older than
    it are nulled out.
    """
    lcols = left.columns
    left_extras = [c for c in lcols if c not in (on, left_ts)]
    # tag sides; right rows sort BEFORE left rows at equal ts (side 0<1)
    # so an exactly-simultaneous right row is visible to the left row.
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_extras],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extras],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    merged = l.unionByName(r)
    w = Window.partitionBy(on).orderBy("__ts", "__side").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = merged.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in value_cols],
        F.max(F.when(F.col("__side") == 0, F.col("__ts"))).over(w).alias("__match_ts"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        within = F.col("__match_ts").isNotNull() & (F.col("__ts") - F.col("__match_ts") <= tolerance)
        out = out.select(
            "*", *[F.when(within, F.col(f"__f_{c}")).otherwise(F.lit(None)).alias(f"__t_{c}") for c in value_cols]
        )
        keep = [F.col(f"__t_{c}").alias(f"right_{c}") for c in value_cols]
        match_ts = F.when(within, F.col("__match_ts")).otherwise(F.lit(None))
    else:
        keep = [F.col(f"__f_{c}").alias(f"right_{c}") for c in value_cols]
        match_ts = F.col("__match_ts")
    result = out.select(
        F.col(on),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in (on, left_ts)],
        match_ts.alias("asof_ts"),
        *keep,
    )
    if how == "inner":
        result = result.filter(F.col("asof_ts").isNotNull())
    return result


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    strict_after: bool = True,
) -> DataFrame:
    """Pairs (l, r) with same key and ``left_ts < right_ts <=
    left_ts + max_gap`` (or <= ... with ``strict_after=False``), via
    time-band bucketing: equi-join on (key, band) with the probe side
    exploded into its two candidate bands, then the exact predicate.
    """
    band = max_gap_seconds  # band width == gap => 2 candidate bands
    lb = left.withColumn(
        "__band", F.explode(F.array(F.floor(F.unix_micros(F.col(left_ts)) / (band * 1_000_000)), F.floor(F.unix_micros(F.col(left_ts)) / (band * 1_000_000)) + 1))
    )
    rb = right.withColumn("__band", F.floor(F.unix_micros(F.col(right_ts)) / (band * 1_000_000)))
    joined = lb.join(rb, on=[on, "__band"])
    lower = F.col(right_ts) > F.col(left_ts) if strict_after else F.col(right_ts) >= F.col(left_ts)
    upper = F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts)) <= max_gap_seconds * 1_000_000
    return joined.filter(lower & upper).drop("__band")
