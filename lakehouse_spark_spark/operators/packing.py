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


def pack_bins_bfd(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str,
) -> DataFrame:
    """Best-fit-decreasing bin packing per shard: documents never
    straddle sequence boundaries (the padding-free alternative to the
    sequential cut in ``pack_sequences`` — cf. "Fewer Truncations
    Improve Language Modeling", Ding et al. 2024).

    Within each shard, docs are placed longest-first into the open bin
    with the least remaining-but-sufficient capacity; ties and order
    are broken by id, so the result is deterministic. Docs longer than
    ``budget`` get a singleton overflow bin (flagged).

    Output: (id, shard, n_tokens, bin_id, bin_fill, overflow).

    Scale: the packing state is per shard (applyInPandas over the shard
    key — one shuffle); shards are sized by the caller exactly as in
    ``pack_sequences``. The in-Python loop is O(n log n) per shard via
    a sorted-capacity list (bisect), not a bin scan.
    """
    import pandas as pd

    # keep the id column's NATIVE type: casting e.g. string doc ids to
    # long would turn them all into NULL, collapsing every row onto one
    # assign-dict key and producing garbage packing (ADVICE r3)
    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, shard string, n_tokens long, bin_id long, bin_fill long, overflow boolean"
    )
    prepared = df.select(
        F.col(id_col),
        F.col(shard_col).cast("string").alias("shard"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pdf = pdf.sort_values(["n_tokens", id_col], ascending=[False, True])
        # open bins as a list sorted by remaining capacity; each entry
        # (remaining, bin_id); bisect for best (smallest sufficient) fit
        caps: list[tuple[int, int]] = []
        fills: dict[int, int] = {}
        assign = {}
        next_bin = 0
        for rid, nt in zip(pdf[id_col], pdf["n_tokens"]):
            if nt > budget:
                assign[rid] = (next_bin, nt, True)
                fills[next_bin] = nt
                next_bin += 1
                continue
            i = bisect.bisect_left(caps, (nt, -1))
            if i < len(caps):
                rem, b = caps.pop(i)
                rem -= nt
            else:
                rem, b = budget - nt, next_bin
                next_bin += 1
            fills[b] = fills.get(b, 0) + nt
            assign[rid] = (b, None, False)
            bisect.insort(caps, (rem, b))
        rows = []
        shard = pdf["shard"].iloc[0] if len(pdf) else None
        for rid, nt in zip(pdf[id_col], pdf["n_tokens"]):
            b, _, ov = assign[rid]
            rows.append((rid, shard, nt, b, fills[b], ov))
        return pd.DataFrame(rows, columns=[id_col, "shard", "n_tokens", "bin_id", "bin_fill", "overflow"])

    return prepared.groupBy("shard").applyInPandas(pack, out_schema)
