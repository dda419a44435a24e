"""Distributed BPE merge learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the tokenizer-
TRAINING side of the pipeline (operators/tokenizer.py covers WordPiece
segmentation with a given vocab).

The key scale observation (same as the reference implementation): BPE
training never needs the corpus after the first pass — it operates on
the WORD-FREQUENCY VOCABULARY. So:

1. one corpus scan builds (word, freq) — a groupBy whose output is
   vocabulary-sized, orders of magnitude smaller than the corpus;
2. each merge round is pair-count (explode adjacent symbol pairs,
   freq-weighted, groupBy sum — map-side combinable), a TakeOrdered(1)
   argmax to the driver (count desc, then lexicographic pair — fully
   deterministic tie-break), and one regexp_replace over the vocab
   applying the merge;
3. lineage is truncated per round (localCheckpoint) exactly like the
   PageRank/connected-components loops in operators/graph.py.

Faithfulness: the merge application uses Java lookaround regex
``(?<!\\S)\\Qa\\E \\Qb\\E(?!\\S)`` — non-consuming token boundaries, all
non-overlapping occurrences replaced left-to-right — which is EXACTLY
the reference's ``re.compile(r'(?<!\\S)' + bigram + r'(?!\\S)')``
semantics (a plain space-consuming string replace would miss the second
pair of ``a b a b``; tested against a pure-Python Sennrich twin in
tests/test_bpe.py). Pair counting counts every adjacent occurrence
(overlapping included), also mirroring the reference's get_stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_spark_spark.operators.text import control_safe_norm

END_OF_WORD = "</w>"

# internal joiners that cannot collide with symbol text: norm_text only
# collapses Java \s, so BPE normalizes through text.control_safe_norm,
# which additionally maps every C0 control (including a literal \x1f in
# the corpus) to a space before spelling — after that no symbol can
# contain whitespace or the \x1f unit separator. This intentionally
# diverges from the norm_text the rest of the engine uses; both helpers
# document it, and merge lists learned before the r6 normalization
# change must be retrained.
_SEP = "\x1f"

_bpe_norm = control_safe_norm


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(symbols, freq): the word-frequency table with each word spelled
    as space-separated characters plus the end-of-word marker — the
    only state BPE training needs. One corpus scan, vocabulary-sized
    output."""
    words = df.select(F.explode(F.split(_bpe_norm(text_col), " ")).alias("w")).filter(
        F.col("w") != ""
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    sym = F.concat(
        F.array_join(F.split(F.col("w"), ""), " "), F.lit(" " + END_OF_WORD)
    )
    return freq.select(sym.alias("symbols"), "freq")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    toks = F.split(F.col("symbols"), " ")
    # fully-merged words (1 symbol) contribute no pairs; the guard
    # matters because sequence(1, 0) would DESCEND, not be empty
    idx = F.when(F.size(toks) < 2, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.size(toks) - 1)
    )
    pairs = F.transform(
        idx, lambda i: F.concat_ws(_SEP, F.element_at(toks, i), F.element_at(toks, i + 1))
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def _java_quote(s: str) -> str:
    # \Q...\E literal quoting; escape any embedded \E terminator
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def learn_bpe(vocab: DataFrame, n_merges: int = 30) -> list[tuple[str, str, str, int]]:
    """Run ``n_merges`` BPE rounds over the (symbols, freq) vocabulary.
    Returns [(left, right, merged, pair_count)] in merge order. The
    driver holds only the merge list (n_merges tuples) and the
    per-round argmax; all counting stays distributed."""
    merges: list[tuple[str, str, str, int]] = []
    v = vocab.localCheckpoint(eager=False)
    for _ in range(n_merges):
        top = (
            _pair_counts(v)
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] is None:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        left, right = pair.split(_SEP)
        merged = left + right
        pat = f"(?<!\\S){_java_quote(left)} {_java_quote(right)}(?!\\S)"
        repl = merged.replace("\\", "\\\\").replace("$", "\\$")
        v = v.select(
            F.regexp_replace(F.col("symbols"), pat, repl).alias("symbols"), "freq"
        ).localCheckpoint(eager=False)
        merges.append((left, right, merged, n))
    return merges


def apply_bpe(df: DataFrame, text_col: str, merges: list[tuple[str, str, str, int]]) -> DataFrame:
    """Segment text with a learned merge list: each word spells to
    characters + </w>, then the merges replay IN ORDER (the standard
    inference shape for small merge lists; production tokenizers
    compile this to a trie — operators/tokenizer.py's WordPiece path).
    Returns the input plus ``bpe_tokens array<string>``. Pure column
    expressions — scan speed, no shuffle."""
    words = F.split(_bpe_norm(text_col), " ")
    spell = F.transform(
        words,
        lambda w: F.concat(F.array_join(F.split(w, ""), " "), F.lit(" " + END_OF_WORD)),
    )
    # word boundary = space-padded unit separator: the spaces keep the
    # (?<!\S)/(?!\S) lookarounds true at word edges (\x1f is NOT Java
    # whitespace), while the \x1f token itself can never participate in
    # a merge pair
    col = F.array_join(spell, " " + _SEP + " ")
    for left, right, merged, _ in merges:
        pat = f"(?<!\\S){_java_quote(left)} {_java_quote(right)}(?!\\S)"
        repl = merged.replace("\\", "\\\\").replace("$", "\\$")
        col = F.regexp_replace(col, pat, repl)
    toks = F.flatten(
        F.transform(F.split(col, _SEP), lambda wseg: F.split(wseg, " "))
    )
    return df.withColumn("bpe_tokens", F.filter(toks, lambda t: t != ""))
