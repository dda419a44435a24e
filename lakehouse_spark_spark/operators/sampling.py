"""Deterministic corpus sampling and splitting.

Training pipelines need REPRODUCIBLE splits and samples — re-running
the pipeline on the same corpus (or an append-only grown version of
it) must assign unchanged rows to unchanged splits. Random-number
sampling (``df.sample``) can't promise that across runs/partitionings,
so everything here keys off a content-stable hash of the row id:

- ``hash_split``: md5-hex-prefix range bucketing into named splits with
  given weights. A row's split depends only on its id — stable under
  re-partitioning, appends, and engine choice (md5 is identical in
  DuckDB, which is what makes the oracle exact).
- ``stratified_sample``: deterministic n-per-stratum sample — the
  first n rows per stratum in md5(id) order (a uniform-but-frozen
  order). Window row_number per stratum; at scale this is one shuffle
  keyed by the stratum column.

Scale notes: ``hash_split`` is a pure projection (no shuffle, scan
speed). ``stratified_sample`` shuffles by stratum; for heavily skewed
strata sizes the window is still fine because row_number needs no
global sort — each stratum sorts independently, and n-per-stratum
output keeps result size bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_HEX_SPACE = 16**4  # we bucket on the first 4 hex chars of md5 → 65536 buckets


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, exclusive-upper-bound-as-4-hex-chars)] in weight
    order; the last split absorbs rounding remainder. Lowercase hex
    compares lexicographically == numerically, so both Spark and any
    SQL oracle can use plain string comparison."""
    total = sum(weights.values())
    acc = 0.0
    out: list[tuple[str, str]] = []
    for name, w in weights.items():
        acc += w / total
        out.append((name, format(min(int(acc * _HEX_SPACE), _HEX_SPACE - 1), "04x")))
    return out


def split_column(id_col: str, weights: dict[str, float]) -> F.Column:
    """The split-name column: bucket = first 4 hex chars of
    md5(CAST(id AS STRING)) compared against the cumulative-weight
    thresholds."""
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    pairs = split_thresholds(weights)
    if len(pairs) == 1:
        return F.lit(pairs[0][0])
    # first-match chain over ascending thresholds; last split is the tail
    chain = None
    for name, ub in pairs[:-1]:
        cond = prefix < ub
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    return chain.otherwise(F.lit(pairs[-1][0]))


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float]) -> DataFrame:
    """Append a deterministic ``split`` column."""
    return df.withColumn("split", split_column(id_col, weights))


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """First ``n_per_stratum`` rows per stratum in md5(id) order —
    a frozen uniform sample, reproducible across runs and engines.
    md5 ties are broken by the id itself (ids are unique)."""
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, n: int, strata: list[str] | None = None
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws a frozen uniform
    u ∈ (0, 1) from the md5 of its id and gets priority u^(1/w); the
    top-n priorities per stratum are the sample. Higher weight ⇒
    priority closer to 1 ⇒ more likely sampled — exactly the
    weighted-without-replacement distribution, but REPRODUCIBLE: the
    draw depends only on the row id, so re-runs, appends elsewhere in
    the corpus, and engine choice cannot change a row's fate (the same
    frozen-randomness contract as hash_split/stratified_sample, and an
    exact-SQL-oracle-able one, unlike rand()).

    Weights must be > 0 (caller filters). One window shuffle per
    stratum; at 100 TB strata sort independently, no global sort.
    u is the first 13 md5 hex chars (52 bits) scaled — exact in a
    double, identical in every engine. The A-ES key u^(1/w) is ranked
    in LOG space — priority ln(u)/w, a strictly monotone transform, so
    the sample is identical — because pow() differs across libms by
    ulps while ln is the already-proven-stable primitive here
    (operators/lm.py rounds ln the same way). Priorities are rounded
    to 6 decimals; id ascending breaks ties.
    """
    strata = strata or []
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10).cast("double")
        / F.lit(float(16**13))
    )
    # guard the open interval: u=0 would make ln blow up
    u = F.greatest(u, F.lit(2.0**-53))
    priority = F.round(F.log(u) / F.col(weight_col), 6)
    w = Window.partitionBy(*[F.col(s) for s in strata]).orderBy(
        F.col("__priority").desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__priority", priority)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
        .withColumnRenamed("__priority", "sample_priority")
    )
