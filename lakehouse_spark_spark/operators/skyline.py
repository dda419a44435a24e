"""2-D skyline (Pareto frontier) — the preference-query operator: rows
not dominated under (minimize x, maximize y). Börzsönyi et al., "The
Skyline Operator" (ICDE 2001).

The naive formulation is an O(n²) NOT-EXISTS anti-join (that is the
oracle); the engine computes the same frontier in O(n log n) with two
window passes over integer-scaled x:

  a row r is dominated  iff  ∃ other: x ≤ r.x ∧ y ≥ r.y ∧ (strict in one)
  ⇔ r survives iff  y > max(y | x' < x)   (no strictly-better-x dominator)
               and  y = max(y | x' = x)   (no equal-x, better-y dominator)

Both maxima are window functions: a RANGE frame ending 1 before the
current integer x, and a partition-by-x max. Equal (x, y) duplicates
tie — neither dominates — and all stay, matching the NOT-EXISTS
semantics exactly.

Scale: :func:`pareto_frontier_2d_bounded` orders by x GLOBALLY (one
WindowExec task) — a VERIFICATION BASELINE for bounded slices only
(the `_bounded` suffix is the contract: never register it, never call
it on corpus-cardinality input; tools/plan_lint.py enforces that no
registered query reaches it).
:func:`pareto_frontier_2d_distributed` is the production form: local
skylines per x-range partition + a driver-side prefix-max of
per-partition best-y (O(numPartitions) state) removes cross-partition
dominated rows exactly — no unpartitioned window anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d_bounded(
    df: DataFrame,
    x_int: Column,
    y_int: Column,
    keep_cols: list[str],
) -> DataFrame:
    """Rows of ``df`` on the (minimize x, maximize y) frontier.
    ``x_int``/``y_int`` must be integer-valued columns (scale decimals
    to cents/days upstream — exact ints keep the frontier decision
    deterministic)."""
    base = df.select(*keep_cols, x_int.alias("__x"), y_int.alias("__y"))
    w_lower = Window.orderBy("__x").rangeBetween(Window.unboundedPreceding, -1)
    w_same = Window.partitionBy("__x")
    flagged = base.withColumn("__m1", F.max("__y").over(w_lower)).withColumn(
        "__m2", F.max("__y").over(w_same)
    )
    return flagged.filter(
        (F.col("__m1").isNull() | (F.col("__y") > F.col("__m1"))) & (F.col("__y") == F.col("__m2"))
    ).drop("__m1", "__m2")


def pareto_frontier_2d_distributed(
    df: DataFrame,
    x_int: Column,
    y_int: Column,
    keep_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """The scale form of :func:`pareto_frontier_2d_bounded`: range-
partition by
    x, local frontier per partition (partitioned windows — never a
    global WindowExec), then eliminate cross-partition dominance with a
    driver-side prefix-max of per-partition max-y (O(numPartitions)
    state, broadcast back).

    Why this is exact: range partitioning on x puts every row with a
    SMALLER x in an earlier (or the same) partition, and equal x always
    co-locates (the range partitioner assigns by boundary). So a row r
    in partition p can only be dominated by (a) a same-partition row —
    caught by the local frontier — or (b) a row in an earlier
    partition, which has strictly smaller x and therefore dominates r
    iff its y ≥ r.y; the max such y is prefix_max(p), a per-partition
    scalar. Later partitions have strictly larger x and can never
    dominate. Same output set as the single-level operator and the
    O(n²) NOT-EXISTS oracle.
    """
    from lakehouse_spark_spark.operators.distrank import range_partitioned

    base = df.select(*keep_cols, x_int.alias("__x"), y_int.alias("__y"))
    parts = range_partitioned(base, [F.col("__x")], num_partitions)

    w_lower = (
        Window.partitionBy("__pid")
        .orderBy("__x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("__pid", "__x")
    flagged = parts.withColumn("__m1", F.max("__y").over(w_lower)).withColumn(
        "__m2", F.max("__y").over(w_same)
    )
    local = flagged.filter(
        (F.col("__m1").isNull() | (F.col("__y") > F.col("__m1"))) & (F.col("__y") == F.col("__m2"))
    ).drop("__m1", "__m2")

    # prefix-max of per-partition max y (tiny: ≤ numPartitions rows)
    pm = sorted(
        parts.groupBy("__pid").agg(F.max("__y").alias("__my")).collect(),
        key=lambda r: r["__pid"],
    )
    prefix: list[tuple[int, int | None]] = []
    best: int | None = None
    for r in pm:
        prefix.append((int(r["__pid"]), best))
        my = r["__my"]
        if my is not None and (best is None or my > best):
            best = int(my)
    spark = df.sparkSession
    pref_df = spark.createDataFrame(prefix, "__pid INT, __prevmax BIGINT")

    out = local.join(F.broadcast(pref_df), "__pid").filter(
        F.col("__prevmax").isNull() | (F.col("__y") > F.col("__prevmax"))
    )
    return out.drop("__pid", "__prevmax")
