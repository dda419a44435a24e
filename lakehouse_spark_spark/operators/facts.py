"""Fact conformance operators: FK stamping, orphan policies.

Reference parity (SURVEY.md §2.3):
- J1 fk stamp: fact ⟕ dim on the key; with a left join the fact's own
  key value survives for unmatched rows, so only literally-null keys are
  patched to the UNKNOWN sentinel — orphan keys pass through (the
  reference's *actual* behavior, confirmed in its golden output, vs its
  metadata.json claim of orphan→-1). Both modes implemented;
  ``orphan_to_unknown=False`` is the golden-parity default.
- J2 orphan drop: inner/semi join against the dim keys
  (src/pipeline.py:124-127).
- J3 orphan audit: left_anti join (src/pipeline.py:231-235).

Scale notes: every one of these joins a huge fact against a small key
set — always broadcast the key side (Catalyst would usually pick it via
size estimate; we hint explicitly so the plan survives stale stats).
A broadcast semi/anti join is shuffle-free: the fact table is never
repartitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_stamp(fact: DataFrame, dim: DataFrame, key: str, sentinel=None, orphan_to_unknown: bool = False) -> DataFrame:
    """Referential stamp of ``fact.key`` against ``dim.key``
    (src/pipeline.py:107-114).

    - ``sentinel`` given: null keys become the sentinel.
    - ``orphan_to_unknown=True``: non-null keys missing from the dim are
      *also* rewritten to the sentinel (the reference's documented
      intent; not its behavior).

    NOTE: in the default mode the left join against the deduped key set
    adds no columns and changes no rows — it is the reference's
    (intentionally no-effect) "referential stamp", kept for behavioral
    parity. Callers that only need the null patch should use
    cleaning.null_to_sentinel directly and skip the join cost.
    """
    keys = dim.select(key).distinct()
    if orphan_to_unknown:
        matched = keys.withColumn("__matched", F.lit(True))
        out = fact.join(F.broadcast(matched), on=key, how="left")
        out = out.withColumn(
            key,
            F.when(F.col(key).isNull() | F.col("__matched").isNull(), F.lit(sentinel)).otherwise(F.col(key)),
        ).drop("__matched")
        return out
    out = fact.join(F.broadcast(keys), on=key, how="left")
    if sentinel is not None:
        out = out.withColumn(key, F.when(F.col(key).isNull(), F.lit(sentinel)).otherwise(F.col(key)))
    return out


def orphan_drop(fact: DataFrame, parent: DataFrame, key: str) -> DataFrame:
    """Drop fact rows whose FK has no parent (src/pipeline.py:124-127).
    Expressed as left_semi — the shuffle-free, no-duplication form of
    the reference's inner-join-on-deduped-keys."""
    return fact.join(F.broadcast(parent.select(key).distinct()), on=key, how="left_semi")


def orphan_audit(fact: DataFrame, parent: DataFrame, key: str) -> DataFrame:
    """Rows that WOULD be dropped — the DQ side of orphan_drop
    (src/pipeline.py:231-235)."""
    return fact.join(F.broadcast(parent.select(key).distinct()), on=key, how="left_anti")
