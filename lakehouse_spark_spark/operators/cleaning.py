"""Typed-cast cleaning operators with explicit null policies.

Reference parity (SURVEY.md §2.2): all-string bronze columns are cast in
silver — quantity→int (src/pipeline.py:78), unit_price→
coalesce(0)→decimal(10,2) (:79-83), total_price recomputed as
quantity*unit_price→decimal(12,2) (:86-90) because the source value is
untrusted (submission_Amadeu/README.md:41).

ANSI note: Spark 4 defaults ``spark.sql.ansi.enabled=true``, where a
failed cast *throws*. Dirty-data cleaning must therefore use
``try_cast`` — malformed strings become null and fall into the declared
null policy, matching the reference's pre-ANSI behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def typed_cast(df: DataFrame, col: str, dtype: str, null_policy: str = "keep", default=None) -> DataFrame:
    """Cast ``col`` to ``dtype`` with a null policy:

    - ``keep``: nulls (including failed casts) stay null;
    - ``drop``: rows with null after cast are removed
      (reference: null order_date rows dropped, src/pipeline.py:65);
    - ``default``: nulls replaced with ``default`` *before* the cast
      (reference: unit_price coalesce→0, src/pipeline.py:81-83).
    """
    c: Column = F.col(col)
    if null_policy == "default":
        # Cast the literal to the column's current type (not vice versa):
        # under ANSI mode coalesce's implicit coercion would otherwise cast
        # the data column toward the literal's type and throw on dirty rows.
        c = F.coalesce(c, F.lit(default).cast(df.schema[col].dataType))
    out = df.withColumn(col, c.try_cast(dtype))
    if null_policy == "drop":
        out = out.filter(F.col(col).isNotNull())
    return out


def recompute_money(df: DataFrame, out_col: str, qty_col: str, price_col: str, dtype: str = "decimal(12,2)") -> DataFrame:
    """Recompute a monetary total from typed parts rather than trusting
    the source column (src/pipeline.py:86-90)."""
    return df.withColumn(out_col, (F.col(qty_col) * F.col(price_col)).cast(dtype))


def null_to_sentinel(df: DataFrame, col: str, sentinel) -> DataFrame:
    """Null FK → sentinel member (reference: customer_id null→-1,
    src/pipeline.py:111-114). Only literal nulls are rewritten; orphan
    (non-null, unmatched) keys pass through — see facts.fk_stamp for the
    intent-vs-behavior discussion."""
    return df.withColumn(col, F.when(F.col(col).isNull(), F.lit(sentinel)).otherwise(F.col(col)))
