"""WordPiece tokenizer: greedy-match unit behavior, vocab totality,
distributed == pure-Python equality."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_tokenize_word_greedy_longest_match():
    from lakehouse_spark_spark.operators.tokenizer import tokenize_word

    vocab = {"un", "##aff", "##able", "##ord", "aff", "a", "##a", "b", "##b"}
    assert tokenize_word("unaffable", vocab) == ["un", "##aff", "##able"]
    # longest match wins over shorter prefixes
    assert tokenize_word("aff", vocab) == ["aff"]
    # char fallback when no multi-char piece fits
    assert tokenize_word("ab", vocab) == ["a", "##b"]
    # unseen character anywhere -> whole word [UNK]
    assert tokenize_word("axz", vocab) == ["[UNK]"]


def test_vocab_makes_tokenization_total(spark):
    """With the alphabet included, no in-corpus word can be [UNK]."""
    from lakehouse_spark_spark.operators.tokenizer import build_vocab, wordpiece_token_stats
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(100)
    vocab = build_vocab(docs, "text", top_k_words=50)
    stats = wordpiece_token_stats(docs, "doc_id", "text", vocab)
    from pyspark.sql import functions as F

    agg = stats.agg(
        F.sum("n_unk").alias("unk"),
        F.sum("n_tokens").alias("toks"),
        F.sum("n_words").alias("words"),
    ).collect()[0]
    assert agg["unk"] == 0
    assert agg["toks"] >= agg["words"] > 0


def test_distributed_matches_pure_python(spark):
    from lakehouse_spark_spark.operators.text import norm_text
    from lakehouse_spark_spark.operators.tokenizer import (
        build_vocab,
        tokenize_word,
        wordpiece_token_stats,
    )
    from lakehouse_spark_spark.sources.loaders import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMALL, "documents").filter(F.col("doc_id") % 11 == 0)
    vocab = build_vocab(docs, "text", top_k_words=100)
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_unk"]) for r in
           wordpiece_token_stats(docs, "doc_id", "text", vocab).collect()}

    v = set(vocab)
    norm = docs.select("doc_id", F.split(norm_text("text"), " ").alias("w")).collect()
    for row in norm:
        n_words = n_tokens = n_unk = 0
        for w in row["w"]:
            if not w:
                continue
            pieces = tokenize_word(w, v)
            n_words += 1
            n_tokens += len(pieces)
            n_unk += sum(1 for p in pieces if p == "[UNK]")
        assert got[row["doc_id"]] == (n_words, n_tokens, n_unk)


def test_vocab_deterministic(spark):
    from lakehouse_spark_spark.operators.tokenizer import build_vocab
    from lakehouse_spark_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(60)
    assert build_vocab(docs, "text", top_k_words=40) == build_vocab(docs, "text", top_k_words=40)
