"""Skew mitigation operators: salted aggregation and salted join.

AQE's skew-join handling (spark.sql.adaptive.skewJoin.*) covers most
cases at runtime; these explicit forms are for the pathological hot keys
AQE can't split (a single key worth many GB on the build side of a
non-sort-merge join, or a hot groupBy key).

- Salted aggregation: stage 1 groups on (key, salt) spreading one hot
  key over N reducers; stage 2 combines N tiny partials. Identical
  result to the plain groupBy — proven by the oracle twin of
  plans/queries.salted_event_type_stats.
- Salted join: the probe side gets a random-ish salt in [0, N); the
  build side is replicated N× with every salt value; the join key
  becomes (key, salt). Use when the build side is small enough to
  replicate but a probe-side key is hot enough to stall a reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_salt(df: DataFrame, salt_col: str, buckets: int, entropy_col: str | Column) -> DataFrame:
    """Deterministic salt in [0, buckets) derived from ``entropy_col``
    (deterministic rather than rand() so retried tasks and oracle
    comparisons stay stable)."""
    c = F.col(entropy_col) if isinstance(entropy_col, str) else entropy_col
    return df.withColumn(salt_col, F.pmod(F.xxhash64(c), F.lit(buckets)))


def explode_salts(df: DataFrame, salt_col: str, buckets: int) -> DataFrame:
    """Replicate every row once per salt value (build side of a salted
    join)."""
    return df.withColumn(salt_col, F.explode(F.array(*[F.lit(i) for i in range(buckets)])))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    buckets: int = 8,
    entropy_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build on key`` that survives a hot probe-side
    key: probe rows are salted, build rows replicated across all salts,
    and the join runs on (key, salt). Result is row-identical to the
    plain join for inner/left joins; right/full outer would duplicate
    unmatched build rows once per salt, so they are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins only (got {how!r}): "
                         "the replicated build side would duplicate unmatched rows in right/full outer")
    entropy = entropy_col or on
    p = add_salt(probe, "__salt", buckets, entropy)
    b = explode_salts(build, "__salt", buckets)
    return p.join(b, on=[on, "__salt"], how=how).drop("__salt")
