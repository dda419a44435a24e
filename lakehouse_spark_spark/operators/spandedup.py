"""Substring-level (span) deduplication statistics — the ExactSubstr
idea of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022), re-expressed as a Spark-native fixed-k shingle
pipeline instead of a suffix array.

A token span is *duplicated* when the k-token shingle starting there
occurs ≥ ``min_count`` times corpus-wide (within-doc repeats count,
matching the suffix-array formulation). Per document, overlapping /
adjacent duplicated shingle windows are merged into maximal spans
(gaps-and-islands over window functions), yielding the span inventory
and the duplicated-token fraction — the signal used to drop or trim
boilerplate-heavy documents in RefinedWeb/SlimPajama-style curation.

Scale design (100 TB):
- Shingling is pure array expressions over the scan — no shuffle, no
  Python — and each shingle is REPRESENTED by its ``xxhash64`` from
  the moment it is materialized: the posexplode emits 8-byte longs,
  never k-token strings, so both the exploded frame and the global
  count's shuffle carry hashes, not text. A 64-bit collision would
  need ~2^32 distinct shingles in flight to become likely (birthday
  bound); the oracle groups by the string itself, and the driver-gated
  hash-match at two scale factors is the empirical collision check.
- The merge step windows PER DOCUMENT ordered by span start — the
  partition key is the document id, so state is bounded by the longest
  document, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.text import tokens


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __w array<string>, n_tokens): non-empty documents only."""
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__w"))
        .withColumn("n_tokens", F.size("__w").cast("long"))
        .filter(~((F.col("n_tokens") == 1) & (F.element_at("__w", 1) == "")))
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """(id, n_tokens, start_pos, shingle_h): every k-token shingle —
    as its 64-bit ``xxhash64`` — with its 1-based start position.
    Documents shorter than k tokens emit no rows; empty documents are
    excluded entirely.

    The hash is computed INSIDE the per-position transform (over the
    token-array slice; tokens are whitespace-split so slice equality ≡
    joined-string equality), so the exploded frame carries one long per
    position instead of a k-token string — at corpus scale the explode
    output is the operator's biggest frame, and this cuts its width
    ~10×. Collision bound unchanged (64-bit birthday: ~2^32 distinct
    shingles in flight), and the string-keyed oracle plus the two-SF
    driver hash-match remain the empirical collision check."""
    base = _tokenized(df, id_col, text_col)
    sh = base.filter(F.col("n_tokens") >= k).select(
        F.col(id_col),
        "n_tokens",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_tokens") - k).cast("int")),
                lambda i: F.xxhash64(F.slice("__w", i + 1, k)),
            )
        ).alias("__i", "shingle_h"),
    )
    return sh.select(
        F.col(id_col), "n_tokens", (F.col("__i") + 1).alias("start_pos"), "shingle_h"
    )


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, min_count: int = 2
) -> DataFrame:
    """(id, __s, __e): maximal merged duplicated spans per document
    (1-based inclusive token positions) — the shared core of the stats
    and trimming operators."""
    # slim the pinned frame to what the span pipeline reads (r16, §2.3):
    # n_tokens rides the explode for doc_shingles' public contract, but
    # neither the corpus-wide count nor the occurrence join uses it —
    # checkpointing it would materialize a dead long per shingle row
    # (25% of the operator's biggest frame at any scale). A checkpoint
    # defeats column pruning, so the projection must happen BEFORE it.
    sh = (
        doc_shingles(df, id_col, text_col, k)
        .select(F.col(id_col), "start_pos", "shingle_h")
        .localCheckpoint(eager=False)
    )
    dup = (
        sh.groupBy("shingle_h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("shingle_h")
    )
    occ = sh.join(dup, "shingle_h").select(
        F.col(id_col), "start_pos", (F.col("start_pos") + k - 1).alias("end_pos")
    )
    w_prev = Window.partitionBy(id_col).orderBy("start_pos").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.partitionBy(id_col).orderBy("start_pos").rowsBetween(Window.unboundedPreceding, 0)
    isl = (
        occ.withColumn("__prev_max", F.max("end_pos").over(w_prev))
        .withColumn(
            "__new",
            F.when(F.col("__prev_max").isNull() | (F.col("start_pos") > F.col("__prev_max") + 1), 1).otherwise(0),
        )
        .withColumn("__island", F.sum("__new").over(w_run))
    )
    return isl.groupBy(id_col, "__island").agg(
        F.min("start_pos").alias("__s"), F.max("end_pos").alias("__e")
    ).drop("__island")


def duplicated_span_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, min_count: int = 2
) -> DataFrame:
    """Per-document duplicated-span inventory:

    (id, n_tokens, n_dup_spans, dup_tokens, dup_frac) — dup_tokens is
    the number of token positions covered by some corpus-duplicated
    k-shingle, after merging overlapping/adjacent windows into maximal
    spans. Every non-empty document appears (zeros when clean)."""
    base = _tokenized(df, id_col, text_col)
    spans = duplicated_spans(df, id_col, text_col, k, min_count)
    perdoc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("__e") - F.col("__s") + 1).alias("dup_tokens"),
    )
    return base.select(id_col, "n_tokens").join(perdoc, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(F.coalesce(F.col("dup_tokens"), F.lit(0)) * 1.0 / F.col("n_tokens"), 6).alias("dup_frac"),
    )


def span_trimmed_corpus(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, min_count: int = 2
) -> DataFrame:
    """The REMOVAL form of ExactSubstr dedup: rebuild each document with
    every corpus-duplicated maximal span excised (the treatment Lee et
    al. apply to the training copy; the stats form is the audit view).

    (id, n_tokens, kept_tokens, clean_text) for every non-empty doc —
    clean_text is the kept tokens rejoined in order ('' when the whole
    doc was duplicated boilerplate).

    Scale: the span table is tiny (maximal merged spans, a handful per
    doc), so it is aggregated to one ``array<struct<s,e>>`` row per
    document and joined back to the doc-level frame; the excision is
    then a pure array expression (``filter`` with the position lambda
    testing ``exists`` over the span array). The corpus-wide token
    frame is never exploded and never shuffled — the doc-level join on
    the id is the only data movement, versus a posexplode + anti-join +
    regroup formulation that pushes every token through two shuffles."""
    base = _tokenized(df, id_col, text_col)
    spans = duplicated_spans(df, id_col, text_col, k, min_count)
    spans_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("__s", "__e")).alias("__spans")
    )
    joined = base.join(spans_arr, id_col, "left").withColumn(
        "__spans", F.coalesce(F.col("__spans"), F.array())
    )
    kept = F.filter(
        "__w",
        lambda t, i: ~F.exists(
            "__spans",
            lambda sp: ((i + 1) >= sp["__s"]) & ((i + 1) <= sp["__e"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        "n_tokens",
        F.size(kept).cast("long").alias("kept_tokens"),
        F.array_join(kept, " ").alias("clean_text"),
    )
