"""Distributed BPE merge learning (operators/bpe.py) vs a pure-Python
Sennrich reference twin: identical merge sequences and segmentations."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _py_get_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + freq
    return stats


def _py_merge(vocab: dict[tuple[str, ...], int], pair: tuple[str, str]):
    # the Sennrich regex: non-consuming boundaries, all non-overlapping
    pat = re.compile(r"(?<!\S)" + re.escape(pair[0] + " " + pair[1]) + r"(?!\S)")
    out = {}
    for syms, freq in vocab.items():
        s = pat.sub("".join(pair), " ".join(syms))
        out[tuple(s.split(" "))] = out.get(tuple(s.split(" ")), 0) + freq
    return out


def _py_learn(words: list[str], n_merges: int):
    vocab: dict[tuple[str, ...], int] = {}
    for w in words:
        syms = tuple(list(w) + ["</w>"])
        vocab[syms] = vocab.get(syms, 0) + 1
    merges = []
    for _ in range(n_merges):
        stats = _py_get_stats(vocab)
        if not stats:
            break
        # count desc, then lexicographic (a, b) — matches the engine's
        # (n desc, pair asc) with the \x1f separator, since \x1f < any
        # printable char is irrelevant for the FIRST key comparison
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], best[0] + best[1], stats[best]))
        vocab = _py_merge(vocab, best)
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "new new newer",
]


def test_learned_merges_match_python_reference(spark):
    from lakehouse_spark_spark.operators.bpe import learn_bpe, word_vocab

    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    got = learn_bpe(word_vocab(df, "text"), n_merges=12)
    words = [w for t in CORPUS for w in t.split()]
    want = _py_learn(words, 12)
    assert got == want, (got, want)


def test_apply_bpe_matches_python_segmentation(spark):
    from lakehouse_spark_spark.operators.bpe import apply_bpe, learn_bpe, word_vocab

    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    merges = learn_bpe(word_vocab(df, "text"), n_merges=10)
    out = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(df, "text", merges).collect()}

    def py_segment(text: str) -> list[str]:
        toks = []
        for w in text.split():
            s = " ".join(list(w) + ["</w>"])
            for left, right, merged, _n in merges:
                pat = re.compile(r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")
                s = pat.sub(merged, s)
            toks.extend(s.split(" "))
        return toks

    for i, t in enumerate(CORPUS):
        assert out[i] == py_segment(t), (i, out[i], py_segment(t))


def test_consecutive_pair_merge_is_regex_faithful(spark):
    """'a b a b' must merge BOTH occurrences in one round (lookaround
    semantics) — a consuming string replace would miss the second."""
    from lakehouse_spark_spark.operators.bpe import apply_bpe

    df = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    out = apply_bpe(df, "text", [("a", "b", "ab", 0)]).collect()[0]["bpe_tokens"]
    assert out == ["ab", "ab", "</w>"]


def test_corpus_scale_learning(spark):
    """On the real documents table: merges are well-formed, counts are
    non-increasing-ish (argmax each round), and applying them reduces
    token counts vs raw characters."""
    from lakehouse_spark_spark.operators.bpe import learn_bpe, word_vocab
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    merges = learn_bpe(word_vocab(docs, "text"), n_merges=8)
    assert len(merges) == 8
    for left, right, merged, n in merges:
        assert merged == left + right and n > 0
    assert len({m[2] for m in merges}) == 8  # distinct merged symbols


def test_control_chars_are_word_boundaries(spark):
    """Round-7 pin of the r6 \\x1f fix: a corpus containing literal C0
    controls (including \\x1f, BPE's internal pair separator) learns
    and segments EXACTLY like the same corpus with controls replaced by
    spaces (the Sennrich twin on the space-normalized text), and no
    learned symbol ever contains a control byte. Reverting the
    control_safe_norm normalization breaks this (\\x1f would collide
    with the separator and corrupt pair counting)."""
    from lakehouse_spark_spark.operators.bpe import apply_bpe, learn_bpe, word_vocab

    dirty = [
        "low\x1flow low\x00low low",
        "lower\x1f\x1flower newest\tnewest",
        "newest newest\x1fnewest newest",
        "widest\x07widest widest",
    ]
    clean = [re.sub(r"[\x00-\x1f\x7f]", " ", t) for t in dirty]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(dirty)], "doc_id long, text string")
    got = learn_bpe(word_vocab(df, "text"), n_merges=8)
    want = _py_learn([w for t in clean for w in t.split()], 8)
    assert got == want, (got, want)
    assert all("\x1f" not in sym for m in got for sym in m[:3])

    out = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(df, "text", got).collect()}

    def py_segment(text: str) -> list[str]:
        toks = []
        for w in text.split():
            s = " ".join(list(w) + ["</w>"])
            for left, right, merged, _n in got:
                pat = re.compile(r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")
                s = pat.sub(merged, s)
            toks.extend(s.split(" "))
        return toks

    for i, t in enumerate(clean):
        assert out[i] == py_segment(t), (i, out[i], py_segment(t))
