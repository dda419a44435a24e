"""Deterministic second-moment statistics: exact Pearson correlation
and least-squares slope per group.

Spark's builtin ``corr``/``regr_slope`` stream doubles through a
partition-order-dependent accumulator — fine numerically, but the last
ulp differs run-to-run and engine-to-engine, so results can't be value-
hashed against an oracle. Here the five sufficient statistics
(n, Σx, Σy, Σxy, Σx², Σy²) are accumulated as EXACT decimal sums
(order-independent), then the closed-form correlation is one fixed dag
of double arithmetic on those exact inputs — bit-identical in Spark and
DuckDB — rounded to 6 decimals.

Scale: a single map-side-combined groupBy — the shuffle carries one
sufficient-statistics row per group. The decimal accumulators hold
~38 digits; at 100 TB row counts (~10^12) a DECIMAL(38,4) Σxy of
10^7-magnitude products still fits with 15 digits to spare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def corr_by_group(
    df: DataFrame,
    group_cols: list[str],
    x: Column | str,
    y: Column | str,
    out_col: str = "corr_xy",
) -> DataFrame:
    """(group..., n_rows, corr_xy): exact-sufficient-statistic Pearson r
    rounded to 6 decimals. ``x``/``y`` should already be exact types
    (cast to DECIMAL upstream); doubles work but lose the cross-engine
    hash guarantee on Σ."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(xc).cast("double").alias("__sx"),
        F.sum(yc).cast("double").alias("__sy"),
        F.sum(xc * yc).cast("double").alias("__sxy"),
        F.sum(xc * xc).cast("double").alias("__sxx"),
        F.sum(yc * yc).cast("double").alias("__syy"),
    )
    n = F.col("n_rows").cast("double")
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.sqrt(n * F.col("__sxx") - F.col("__sx") * F.col("__sx")) * F.sqrt(
        n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    )
    return agg.select(
        *group_cols,
        "n_rows",
        F.round(num / den, 6).alias(out_col),
    )


def decimal_avg6(sum_dec: Column, n: Column) -> Column:
    """Tie-proof 6-decimal average of an exact DECIMAL(_,6) sum over an
    integer count, as a DOUBLE.

    ``round(sum/n, 6)`` on doubles is NOT cross-engine stable: the sum
    has exactly 6 decimals, so dividing by a small integer n often
    lands *exactly* on a half at the 7th decimal (e.g. -0.088309/26 =
    -0.0033965), and Spark/DuckDB resolve the double-rounded tie
    differently. Instead: scale to integer micro-units and round
    half-away-from-zero via ``floor((2·|s| + n) / (2·n))`` — the
    inputs are exact int64 well under 2^53, so the double division is
    exact whenever the true quotient is an integer (the tie case) and
    more than 1/(2n) away from one otherwise; FLOOR is then identical
    in both engines. Same integer-arithmetic idea as the PageRank
    oracle (operators/graph.py).

    VALIDITY BOUND (ADVICE r3): ``2·|micro| + n`` must stay below 2^53
    for the double division to be exact — i.e. |sum| ≤ ~4.5e9 in
    original units (micro ≤ 4.5e15). Beyond that, compute the quotient
    in DECIMAL (``(2·micro+n) div (2·n)`` with DECIMAL(38,0) operands)
    instead; per-group counts in every registered use are far below
    the bound (shares of per-key transition counts, per-doc token
    averages), and the same bound applies to the inline
    ``floor((2·n·1e6 + t)/(2·t))`` share formulas in plans/queries.py
    (event_transition_matrix, langid_confusion_matrix)."""
    micro = (sum_dec * 1_000_000).cast("long")
    pos = F.abs(micro)
    q = F.floor((F.lit(2) * pos + n) / (F.lit(2) * n)).cast("long")
    return (F.when(micro >= 0, q).otherwise(-q).cast("double") / F.lit(1_000_000.0))
