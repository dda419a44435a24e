"""Sequence packing: lay documents out into fixed-token-budget training
sequences ("concatenate-and-chunk" packing, the standard LLM
pretraining layout).

Documents are concatenated in a deterministic order within each SHARD
(a grouping column — language, source, or a hash bucket) and the
resulting token stream is cut every ``budget`` tokens. Each document is
assigned the sequence its first token lands in, plus a ``straddles``
flag when it crosses a cut (training loaders either split those or mask
across the boundary — the engine reports the layout, the loader policy
is downstream).

Semantics are a window cumulative sum, so the whole operator is
closed-form SQL (exact DuckDB oracle):

    start_offset = SUM(n_tokens) OVER (PARTITION BY shard
                                       ORDER BY id ...) - n_tokens
    seq_id       = floor(start_offset / budget)
    straddles    = floor((start_offset + n_tokens - 1) / budget) != seq_id

Scale design: packing is per-shard, which is how real pipelines run it
— a global document order would serialize the window onto one
partition, while per-shard streams keep every shard independent (one
shuffle keyed by shard). Shards with billions of docs would use a
composite shard key (e.g. source × hash-bucket) to bound window size;
the operator takes any column expression as the shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str,
) -> DataFrame:
    """Returns id, shard, n_tokens, start_offset, seq_id, straddles.
    Deterministic: order within a shard is the id (unique)."""
    w = Window.partitionBy(shard_col).orderBy(F.col(id_col).asc()).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.col(token_col)).over(w)
    seq = F.floor((cum - F.col(token_col)) / budget)
    end_seq = F.floor((cum - 1) / budget)
    return df.select(
        F.col(id_col),
        F.col(shard_col).alias("shard"),
        F.col(token_col).cast("long").alias("n_tokens"),
        (cum - F.col(token_col)).cast("long").alias("start_offset"),
        seq.cast("long").alias("seq_id"),
        (end_seq != seq).alias("straddles"),
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing efficiency: sequences used, docs, tokens, and
    fill ratio (tokens / (n_sequences * budget))."""
    return packed.groupBy("shard").agg(
        (F.max("seq_id") + 1).alias("n_sequences"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens") / ((F.max("seq_id") + 1) * budget)).alias("fill_ratio"),
    )
