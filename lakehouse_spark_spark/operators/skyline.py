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

Scale: the windows order by x GLOBALLY — for 100 TB inputs run the
frontier per partition bucket first (local skylines), then the tiny
union through the same operator again (skyline-of-skylines is the
skyline); the operator is that composition's building block.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
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
