"""Deduplication operators.

The reference's signature operator is dedup-keep-latest
(src/pipeline.py:50-56, 59-66, 69-75; SURVEY.md §2.5 W1):
``row_number() OVER (PARTITION BY key ORDER BY ts DESC)`` then keep
``rn = 1``. The reference has no tiebreaker (nondeterministic on ties);
we require one.

Scale notes: the window forces one hash-partition shuffle on the key —
unavoidable for exact dedup, and the minimal plan (no sort of the whole
table, only within partitions). Skewed keys are handled by AQE; for a
known-hot key (e.g. a null-ish sentinel) pre-filter it. The exact-dup
variants use hash-groupBy, which enables partial (map-side) aggregation,
so the shuffle carries one row per (partition, key) — far less than the
window approach when duplicates are common.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(df: DataFrame, key: list[str] | str, order_col: str, tiebreak: list[str] | str | None = None) -> DataFrame:
    """Keep exactly one row per ``key``: the one with the greatest
    ``order_col``, ties broken by ``tiebreak`` descending.

    Reference: src/pipeline.py:50-56 (customers/created_at),
    :59-66 (work_orders/updated_at), :69-75 (parts_sales/updated_at).
    """
    key = [key] if isinstance(key, str) else list(key)
    tiebreak = [] if tiebreak is None else ([tiebreak] if isinstance(tiebreak, str) else list(tiebreak))
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*key).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def exact_dedup(
    df: DataFrame, on: list[str] | str, keep_min: str | None = None, tiebreak: list[str] | str | None = None
) -> DataFrame:
    """Exact duplicate removal on a column set via hash-groupBy.

    When ``keep_min`` is given, the surviving row is the one with the
    minimal value of that column (deterministic representative — the
    'canonical doc id' pattern for training-data dedup); all other
    columns are taken from that representative row. The representative
    is only deterministic if ``keep_min`` is unique within each group —
    otherwise pass ``tiebreak`` columns (ascending) to pin it, the same
    contract ``dedup_latest`` enforces.
    """
    on = [on] if isinstance(on, str) else list(on)
    if keep_min is None:
        return df.dropDuplicates(on)
    tiebreak = [] if tiebreak is None else ([tiebreak] if isinstance(tiebreak, str) else list(tiebreak))
    w = Window.partitionBy(*on).orderBy(F.col(keep_min).asc(), *[F.col(c).asc() for c in tiebreak])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def content_hash(col: Column | str, normalize: bool = True) -> Column:
    """Stable content fingerprint for exact text dedup. At 100 TB you
    group on the 128-bit hash, never on the raw text — the shuffle
    carries 16 bytes + key instead of whole documents."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(c)


def dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Incremental (cross-corpus) exact dedup: disposition of a NEW
    batch against an already-indexed corpus — the shape every periodic
    ingestion run needs (yesterday's crawl vs the accumulated corpus).

    Output: one row per batch doc — (id, content_hash,
    dup_of_corpus, dup_in_batch, keep) where ``keep`` means the doc is
    the first copy (min id) of a hash that does not exist in the corpus.

    Scale shape: the corpus side reduces to its DISTINCT 16-byte hash
    set before the join (shuffle carries hashes, not documents — and in
    a real pipeline that hash set is the persisted dedup index, so the
    corpus text is never re-read); the membership test is a left join
    on the hash; within-batch winners come from one windowed
    row_number over the (small) batch. Batch >> corpus skew is absorbed
    by AQE; the corpus hash set is reusable across runs.
    """
    bh = batch.select(F.col(id_col), content_hash(text_col).alias("content_hash"))
    corpus_hashes = (
        corpus.select(content_hash(text_col).alias("content_hash"))
        .distinct()
        .withColumn("__in_corpus", F.lit(True))
    )
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        bh.join(corpus_hashes, "content_hash", "left")
        .withColumn("dup_of_corpus", F.coalesce("__in_corpus", F.lit(False)))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_in_batch", F.col("__rn") > 1)
        .withColumn("keep", ~F.col("dup_of_corpus") & ~F.col("dup_in_batch"))
        .select(id_col, "content_hash", "dup_of_corpus", "dup_in_batch", "keep")
    )
