"""Incremental view maintenance for distributive aggregates: refresh a
gold aggregate table from a new fact batch WITHOUT re-scanning history.

Distributive aggregates (SUM/COUNT/MIN/MAX) merge exactly: aggregate
only the delta batch, then key-merge partials with the existing gold
rows — SUM/COUNT partials merge by summing (the default), MIN/MAX
partials by min/max (pass ``merge_fns`` to ``merge_partials``; summing
a MIN/MAX partial would be silently wrong). The refreshed table is bit-identical to recomputing from the full
fact history (the registry query proves it against a full-recompute
oracle), because decimal partial sums are exact and associative.

Scale contract: the refresh cost is O(|delta| + |touched gold keys|) —
the full history is never read. Pair with ``sources/sinks.
upsert_parquet`` (or Delta MERGE where available) so only touched keys
rewrite. AVG-style aggregates must be stored as (sum, count) partials
and finalized at read time — a finalized average cannot be merged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_partials(
    facts: DataFrame, keys: list[str], sum_cols: dict[str, object]
) -> DataFrame:
    """One partial-aggregate row per key: SUM of each named expression
    plus an ``n_rows`` count. ``sum_cols`` maps output name -> Column
    (cast to DECIMAL upstream for exact merging)."""
    aggs = [F.sum(expr).alias(name) for name, expr in sum_cols.items()]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return facts.groupBy(*keys).agg(*aggs)


_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def merge_partials(
    existing: DataFrame | None,
    delta: DataFrame,
    keys: list[str],
    merge_fns: dict[str, str] | None = None,
) -> DataFrame:
    """Key-merge two partial-aggregate tables (same schema).

    ``merge_fns`` maps value-column name -> ``"sum" | "min" | "max"``
    (the distributive merges); columns not listed merge with ``sum``
    (right for SUM and COUNT partials). MIN/MAX partials MUST be listed
    — summing them is silently wrong. Exact for decimal partials;
    associative, so any batch arrival order yields the same gold table.
    """
    if existing is None:
        return delta
    merge_fns = merge_fns or {}
    unknown = set(merge_fns) - set(delta.columns)
    if unknown:
        raise ValueError(f"merge_fns names absent from delta: {sorted(unknown)}")
    bad = {c: f for c, f in merge_fns.items() if f not in _MERGE_FNS}
    if bad:
        raise ValueError(f"unsupported merge fns (use sum/min/max): {bad}")
    value_cols = [c for c in delta.columns if c not in keys]
    return (
        existing.unionByName(delta)
        .groupBy(*keys)
        .agg(*[_MERGE_FNS[merge_fns.get(c, "sum")](c).alias(c) for c in value_cols])
    )
