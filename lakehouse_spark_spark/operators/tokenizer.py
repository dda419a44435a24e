"""Vocab-based subword tokenization (WordPiece-style greedy
longest-match) — token accounting under a REAL trained vocabulary, the
regime an LLM data pipeline actually budgets in (whitespace and
regex token counts in operators/text.py are the cheap JVM
approximations; this is the faithful one).

Two stages, mirroring how production tokenizers deploy:

1. ``build_vocab``: derive the vocabulary FROM the corpus with pure
   DataFrame ops — top-K whole words by frequency plus the full
   character alphabet (both bare and ``##``-continuation forms), so
   tokenization is total: any word either matches wholes/pieces or
   falls back to characters, and [UNK] only appears for characters
   never seen in training. The vocab is a bounded driver-side artifact
   (K + alphabet entries) exactly like IVF centroids or Z-order
   quantile boundaries — collect it once, broadcast it everywhere.
2. ``wordpiece_tokenize``: the greedy longest-match-first loop (the
   HuggingFace WordPiece inference algorithm) over each word. A
   per-position backtracking loop is genuinely inexpressible in
   built-in column functions, so this is a deliberate Python seam:
   Arrow-batched ``mapInPandas``, vocab shipped ONCE per executor via
   ``SparkContext.broadcast`` (not per-row closure capture).

Scale: tokenization is embarrassingly parallel (per-doc); the only
shuffle in the whole path is the vocab-training groupBy, whose shuffle
carries (word, count) pairs — the vocabulary, not the corpus. At 100 TB
you train the vocab on a sample and persist it; ``build_vocab`` accepts
any DataFrame, so pass ``docs.sample(...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_spark_spark.operators.text import norm_text

UNK = "[UNK]"


def build_vocab(docs: DataFrame, text_col: str, top_k_words: int = 2000) -> list[str]:
    """Corpus-derived vocabulary: top-K whole words + the character
    alphabet in bare and ``##`` continuation form. Returns a sorted
    list (deterministic: frequency desc, then word asc tiebreak)."""
    words = docs.select(F.explode(F.split(norm_text(text_col), " ")).alias("w")).filter(F.col("w") != "")
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(top_k_words)
    )
    chars = (
        words.select(F.explode(F.split("w", "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
    )
    whole = [r["w"] for r in top.collect()]
    alphabet = sorted(r["c"] for r in chars.collect())
    vocab = set(whole)
    for c in alphabet:
        vocab.add(c)
        vocab.add("##" + c)
    return sorted(vocab)


def tokenize_word(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match-first WordPiece inference for one word.
    Continuation pieces carry the ``##`` prefix; a position with no
    match at all collapses the whole word to [UNK] (standard
    behavior)."""
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            piece = word[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


TOKEN_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("n_unk", T.LongType()),
        T.StructField("subword_ratio", T.DoubleType()),
    ]
)


def wordpiece_token_stats(docs: DataFrame, id_col: str, text_col: str, vocab: list[str]) -> DataFrame:
    """Per-document token accounting under the given vocab:
    (n_words, n_tokens, n_unk, subword_ratio = continuation pieces /
    total). Vocab rides an explicit broadcast variable — one copy per
    executor, not one per task closure."""
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(set(vocab))
    norm = docs.select(F.col(id_col).alias("doc_id"), F.split(norm_text(text_col), " ").alias("__words"))

    def run(batches):
        import pandas as pd

        v = bc.value
        for pdf in batches:
            rows = []
            for doc_id, words in zip(pdf["doc_id"], pdf["__words"]):
                n_words = n_tokens = n_unk = n_sub = 0
                for w in words:
                    if not w:
                        continue
                    n_words += 1
                    pieces = tokenize_word(w, v)
                    n_tokens += len(pieces)
                    n_unk += sum(1 for p in pieces if p == UNK)
                    n_sub += sum(1 for p in pieces if p.startswith("##"))
                rows.append((doc_id, n_words, n_tokens, n_unk, n_sub / n_tokens if n_tokens else 0.0))
            yield pd.DataFrame(rows, columns=["doc_id", "n_words", "n_tokens", "n_unk", "subword_ratio"])

    return norm.mapInPandas(run, TOKEN_STATS_SCHEMA)
