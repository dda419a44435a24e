"""Mergeable sketches: HLL distinct-count tiers and approximate heavy
hitters.

The 100 TB pattern for COUNT(DISTINCT) over rolling/overlapping windows
is NOT to re-scan the raw data per window — it is to materialize a
small sketch tier (one row per day/key holding a binary HLL sketch) and
answer every coarser window by MERGING sketches (`hll_union_agg`),
touching only the tier. Spark 4 ships Apache DataSketches HLL natively
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), so the
whole path stays JVM-side, no UDFs.

Key algebraic property (tested in tests/test_sketches.py): an HLL
sketch's state depends only on the SET of hashed values it absorbed —
so union(daily sketches over a month) is EXACTLY the sketch of the
month, and the rolled-up estimate equals the direct estimate, not
merely approximates it. That is what makes the tier safe to build
incrementally (yesterday's sketches never recomputed) and to serve any
window shape from.

The reference has no sketch surface (SURVEY.md §2 has exact
distinct-count only, A2); this is a scale extension. `approx_top_k`
(also DataSketches) covers heavy hitters: when the tracked-item budget
exceeds the true cardinality its counts are EXACT, which is what lets
the registry give it a DuckDB oracle despite being an "approximate"
operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^12 buckets: ~1.6% relative standard error, 4 KB dense sketch.
DEFAULT_LG_K = 12


def sketch_tier(
    df: DataFrame, ts_col: str, value_col: str, grain: str = "day", keys: list[str] | None = None, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """Materialize the finest sketch tier: one row per (grain bucket,
    *keys) carrying a binary HLL sketch of ``value_col`` plus an exact
    row count. This is the table you'd persist (partitioned by the
    bucket) and append to incrementally — at 100 TB the tier is ~5
    orders of magnitude smaller than the raw data."""
    keys = keys or []
    bucket = F.date_trunc(grain, F.col(ts_col)).alias("bucket")
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_sketches(tier: DataFrame, grain: str, keys: list[str] | None = None) -> DataFrame:
    """Answer a coarser grain purely from the tier: merge sketches with
    hll_union_agg (a few KB per group through the shuffle — the raw
    data is never touched) and estimate. ``n_rows`` sums exactly."""
    keys = keys or []
    coarse = F.date_trunc(grain, F.col("bucket")).alias("bucket")
    merged = tier.groupBy(coarse, *[F.col(k) for k in keys]).agg(
        F.expr("hll_union_agg(sketch)").alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        "bucket",
        *keys,
        F.expr("cast(hll_sketch_estimate(sketch) as long)").alias("approx_distinct"),
        F.col("n_rows"),
    )


def estimate_tier(tier: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Read the tier at its own grain: estimate each sketch in place."""
    keys = keys or []
    return tier.select(
        "bucket",
        *keys,
        F.expr("cast(hll_sketch_estimate(sketch) as long)").alias("approx_distinct"),
        "n_rows",
    )


def heavy_hitters(df: DataFrame, col: str, k: int, max_items_tracked: int = 10000) -> DataFrame:
    """Top-k most frequent values of ``col`` via DataSketches frequent
    items, exploded to (item, est_count) rows ordered by count desc.

    Counts are EXACT whenever the true distinct cardinality fits within
    ``max_items_tracked`` (no evictions happen); beyond that they are
    upper-bound estimates within the sketch's documented error. Either
    way the result is one pass, map-side combinable, and the shuffle
    carries one sketch per partition — the 100 TB alternative to a full
    groupBy + global top-k when only the head matters."""
    topk = df.agg(F.expr(f"approx_top_k({col}, {k}, {max_items_tracked})").alias("tk"))
    return (
        topk.select(F.posexplode("tk").alias("rank", "entry"))
        .select(
            (F.col("rank") + 1).alias("rank"),
            F.col("entry.item").alias("item"),
            F.col("entry.count").alias("est_count"),
        )
    )


# --- Theta sketches: distinct-count SET ALGEBRA (union/intersect/diff) ---

def theta_tier(df: DataFrame, key_col: str, value_col: str, lg_k: int = 18) -> DataFrame:
    """One theta sketch of ``value_col`` per ``key_col`` group. Unlike
    HLL, theta sketches support INTERSECTION and DIFFERENCE — the
    audience-overlap algebra. Below ~2^lg_k distinct values per group
    the sketch is in exact mode (it retains every hashed value), so
    estimates — including intersections — are exact up to 64-bit hash
    collisions; beyond that they carry the documented sampling error.
    lg_k=18 keeps the local scales exact while bounding any sketch at a
    few MB; at 100 TB you drop lg_k and accept the error bars."""
    return df.groupBy(key_col).agg(
        F.expr(f"theta_sketch_agg({value_col}, {lg_k})").alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def audience_overlap(tier: DataFrame, key_col: str) -> DataFrame:
    """Pairwise audience overlap between groups from their theta
    sketches alone: |A|, |B|, |A∪B|, |A∩B|, |A∖B| and Jaccard. The
    join input is ONE ROW PER GROUP (sketches, not members) — the
    pairwise comparison costs O(groups²) sketch merges regardless of
    how many members each audience has; raw data is never re-read."""
    a = tier.select(F.col(key_col).alias("key_a"), F.col("sketch").alias("sk_a"))
    b = tier.select(F.col(key_col).alias("key_b"), F.col("sketch").alias("sk_b"))
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    est = lambda e: F.expr(e).cast("long")
    return pairs.select(
        "key_a",
        "key_b",
        est("theta_sketch_estimate(sk_a)").alias("n_a"),
        est("theta_sketch_estimate(sk_b)").alias("n_b"),
        est("theta_sketch_estimate(theta_union(sk_a, sk_b))").alias("n_union"),
        est("theta_sketch_estimate(theta_intersection(sk_a, sk_b))").alias("n_intersect"),
        est("theta_sketch_estimate(theta_difference(sk_a, sk_b))").alias("n_only_a"),
    ).withColumn(
        "jaccard",
        F.round(F.col("n_intersect").cast("double") / F.col("n_union"), 6),
    )


def histogram_tier(
    df: DataFrame,
    day_col: Column | str,
    value_col: Column | str,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """(day, bin, n): the mergeable QUANTILE tier — a fixed-grid daily
    histogram. Like the HLL tier, coarser windows are answered by
    summing bin counts (integer addition is exact and associative, so
    rollup == direct BY CONSTRUCTION, not approximately), and the tier
    is ~n_bins rows/day regardless of raw volume. Quantile error is
    bounded by one bin width — sized by the caller, unlike streaming
    t-digest/KLL whose state is data-dependent and engine-specific.
    Values below ``lo`` clamp to bin 0; above the grid to the last bin.
    NULL values are DROPPED (contract: quantiles are over non-null
    values) — without the filter they would propagate into a NULL bin
    that ``quantiles_from_tier`` counts in ``tot``, and Spark orders
    NULL bins first in the cumulative window while DuckDB orders them
    last, silently skewing quantiles and breaking the cross-engine
    hash."""
    d = F.col(day_col) if isinstance(day_col, str) else day_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    bin_ = F.greatest(F.least(F.floor((v - lo) / width), F.lit(n_bins - 1)), F.lit(0)).cast("long")
    return (
        df.filter(v.isNotNull())
        .groupBy(d.alias("day"), bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantiles_from_tier(
    tier: DataFrame,
    grain: str,
    qs: list[float],
    lo: float,
    width: float,
) -> DataFrame:
    """Quantile estimates served FROM the tier (never the raw data):
    per ``grain`` window (a date_trunc unit), the q-quantile estimate is
    the UPPER EDGE of the bin containing the ceil(q·n)-th value —
    deterministic integer arithmetic on exact counts, so the result is
    oracle-hashable. One row per window: (window, n_rows, q_<q> ...)."""
    from pyspark.sql import Window as W

    g = tier.groupBy(F.date_trunc(grain, F.col("day")).alias("window"), "bin").agg(
        F.sum("n").alias("n")
    )
    w_cum = W.partitionBy("window").orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy("window")
    cum = g.withColumn("cum", F.sum("n").over(w_cum)).withColumn("tot", F.sum("n").over(w_all))
    aggs = [F.max("tot").alias("n_rows")]
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("tot"))
        qbin = F.min(F.when(F.col("cum") >= rank, F.col("bin")))
        aggs.append(((qbin + 1) * width + lo).alias(f"q_{str(q).replace('.', '_')}"))
    return cum.groupBy("window").agg(*aggs)


def rolling_union_from_tier(tier: DataFrame, preceding: int = 6) -> DataFrame:
    """Rolling (preceding+1)-row HLL union + exact row-count sum over
    the daily tier, with NO global window — the halo-partition pattern:

    Partition the tier by calendar year; rows near a partition's start
    need earlier rows in their ROWS frame, so the last ``preceding``
    rows of the GLOBAL bucket order before each partition's first row
    are DUPLICATED into that partition (halo rows), the rolling window
    runs per partition, and halo rows are dropped from the output
    (their own frames are incomplete; the real copies got theirs in
    their home partition). Halo membership is computed from a
    distributed global row index (:func:`~lakehouse_spark_spark.operators.
    distrank.with_global_prefix` — range exchange + O(numPartitions)
    driver offsets), NOT from "the previous year's tail": a calendar
    year with fewer than ``preceding`` rows (sparse or empty year)
    still yields complete frames, because the index match pulls
    predecessors from however many earlier years are needed. Output is
    row-identical to the single-partition ``ROWS BETWEEN n PRECEDING``
    global window at ANY bucket distribution, but every WindowExec is
    partitioned — the tier never funnels through one task.

    Precondition: one row per ``bucket`` (the tier grain guarantees
    this) — duplicate buckets would make the ROWS frame order-dependent
    in the global-window form too.

    Returns (day_us, reach_7d, events_7d) for the default 7-day frame.
    """
    if preceding < 1:
        raise ValueError(
            "preceding must be >= 1: sequence(__rn+1, __rn+0) would DESCEND "
            "(Spark counts down when stop < start) and emit spurious halos; "
            "a 1-row frame needs no halo machinery at all"
        )
    from lakehouse_spark_spark.operators.distrank import with_global_prefix

    t, _ = with_global_prefix(tier, [F.col("bucket")])
    t = t.withColumn("__part", F.year("bucket"))
    # First global index per non-empty year: a tiny (≤ |years| rows)
    # broadcast table. Row j is a halo for partition P iff
    # first(P) - preceding <= j < first(P) ⇔ first(P) ∈ [j+1,
    # j+preceding] — expressed as an EQUI-join by fanning each row out
    # to its `preceding` candidate first-indices (constant fan-out) and
    # matching on first-index equality, so the plan is a
    # BroadcastHashJoin, never a nested loop. A row can serve several
    # consecutive sparse years (one match per distinct first-index),
    # emitting exactly the needed copies.
    bounds = t.groupBy(F.col("__part").alias("__bpart")).agg(
        F.min("__rn").alias("__first")
    )
    cand = t.withColumn(
        "__first", F.explode(F.sequence(F.col("__rn") + 1, F.col("__rn") + preceding))
    )
    halo = (
        cand.join(F.broadcast(bounds), "__first")
        .withColumn("__part", F.col("__bpart"))
        .drop("__bpart", "__first")
        .withColumn("__halo", F.lit(True))
    )
    allr = t.withColumn("__halo", F.lit(False)).unionByName(halo)
    w = Window.partitionBy("__part").orderBy("bucket").rowsBetween(-preceding, 0)
    return (
        allr.withColumn("__sk", F.expr("hll_union_agg(sketch)").over(w))
        .withColumn("events_7d", F.sum("n_rows").over(w))
        .filter(~F.col("__halo"))
        .select(
            F.unix_micros("bucket").alias("day_us"),
            F.expr("CAST(hll_sketch_estimate(__sk) AS LONG)").alias("reach_7d"),
            "events_7d",
        )
    )
