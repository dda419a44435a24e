"""Training-mixture planning and token-budget sampling: given a target
token budget and per-source mixture weights, compute per-source
sampling rates / oversampling epochs, and deterministically cut each
source's document stream at its token budget.

This is the "data mixing" stage of an LLM data pipeline (the step
between corpus curation and sequence packing, cf. the published
mixture recipes for large web corpora): sources are weighted, small
high-quality sources may be repeated (epochs > 1), large sources are
subsampled.

Scale shapes:
- ``mixture_plan`` reduces the corpus to |sources| rows (combiner
  aggregation) and computes the plan with broadcast arithmetic — the
  corpus itself is scanned once for token counts.
- ``token_budget_sample`` orders each source's docs by a stable md5
  rank (reusing the sampling.py convention: hash order = reproducible,
  unbiased, engine-portable) and keeps docs while the RUNNING token sum
  stays under the source's budget. One window per source partition; the
  shuffle key is the source, skew bounded by the largest source — at
  100 TB you'd pre-bucket by source.

Determinism contract: token counts are exact longs; rates and epochs
are single double divisions rounded at 6 — identical IEEE arithmetic
in Spark and the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.text import n_tokens


def source_token_counts(df: DataFrame, source_col: str, text_col: str) -> DataFrame:
    """(source, n_docs, n_tokens): the per-source inventory the planner
    consumes. Whitespace tokens (text.n_tokens), exact longs."""
    return df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens(text_col).cast("long")).alias("n_tokens"),
    )


def mixture_plan(
    df: DataFrame,
    source_col: str,
    text_col: str,
    weights: dict[str, float],
    budget_tokens: int,
) -> DataFrame:
    """Per-source sampling plan for a ``budget_tokens`` training mix with
    normalized ``weights`` (sources missing from ``weights`` get 0):

    (source, n_docs, n_tokens, weight, target_tokens, sampling_rate,
    epochs) — ``sampling_rate`` = min(1, target/available) is the
    keep-probability for oversized sources; ``epochs`` = target/available
    is the repeat factor (> 1 means the source is repeated /
    upsampled, the standard treatment of small high-quality sources).
    """
    total_w = sum(weights.values()) or 1.0
    inv = source_token_counts(df, source_col, text_col)
    wcol = None
    for name, w in weights.items():
        c = F.when(F.col(source_col) == name, F.lit(w / total_w))
        wcol = c if wcol is None else wcol.when(F.col(source_col) == name, F.lit(w / total_w))
    wcol = wcol.otherwise(F.lit(0.0)) if wcol is not None else F.lit(0.0)
    inv = inv.withColumn("__w", wcol)
    target = F.round(F.col("__w") * F.lit(float(budget_tokens))).cast("long")
    return inv.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round("__w", 6).alias("weight"),
        target.alias("target_tokens"),
        F.round(
            F.least(F.lit(1.0), target.cast("double") / F.col("n_tokens").cast("double")), 6
        ).alias("sampling_rate"),
        F.round(target.cast("double") / F.col("n_tokens").cast("double"), 6).alias("epochs"),
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    text_col: str,
    budget_per_source: int,
) -> DataFrame:
    """Deterministic per-source token-budget cut: docs ordered by
    md5(id) within each source (stable, unbiased); a doc is kept while
    the running token total INCLUDING it stays ≤ the budget. Greedy
    prefix-cut — the reproducible form of "sample ~N tokens per
    source".

    Output: (id, source, doc_tokens, cum_tokens, keep).
    """
    toks = df.select(
        F.col(id_col),
        F.col(source_col),
        n_tokens(text_col).cast("long").alias("doc_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__rk"),
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col("__rk").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return toks.select(
        id_col,
        source_col,
        "doc_tokens",
        F.sum("doc_tokens").over(w).alias("cum_tokens"),
    ).withColumn("keep", F.col("cum_tokens") <= budget_per_source)


def temperature_mixture_plan(
    df: DataFrame,
    source_col: str,
    text_col: str,
    alpha: float,
    budget_tokens: int,
) -> DataFrame:
    """Temperature-scaled mixture weights computed FROM the corpus:
    w_s ∝ p_s^α where p_s is the source's token share (α=1 reproduces
    natural proportions, α→0 approaches uniform — the multilingual
    rebalancing standard, cf. mT5/UniMax).

    (source, n_docs, n_tokens, p_raw, weight, target_tokens, epochs).

    Determinism: p_raw and each pow(p, α) are rounded to 6 decimals and
    the pow values summed as exact decimals (order-independent), so the
    normalized weights hash-match cross-engine. Scale: the corpus is
    reduced to |sources| rows before any of this arithmetic."""
    inv = source_token_counts(df, source_col, text_col)
    tot = inv.select(F.sum("n_tokens").alias("__tot"))
    p = inv.crossJoin(F.broadcast(tot)).withColumn(
        "p_raw", F.round(F.col("n_tokens").cast("double") / F.col("__tot"), 6)
    )
    p = p.withColumn("__pa", F.round(F.pow(F.col("p_raw"), F.lit(alpha)), 6).cast("decimal(18,6)"))
    z = p.select(F.sum("__pa").cast("decimal(20,6)").alias("__z"))
    out = p.crossJoin(F.broadcast(z)).withColumn(
        "weight", F.round(F.col("__pa").cast("double") / F.col("__z").cast("double"), 6)
    )
    target = F.round(F.col("weight") * F.lit(float(budget_tokens))).cast("long")
    return out.select(
        source_col,
        "n_docs",
        "n_tokens",
        "p_raw",
        "weight",
        target.alias("target_tokens"),
        F.round(target.cast("double") / F.col("n_tokens").cast("double"), 6).alias("epochs"),
    )
