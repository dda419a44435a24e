"""Unit tests for operators/mixture.py (mixture planning and
token-budget sampling) and text.quality_score determinism bounds."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mixture_plan_rates_and_epochs(spark):
    from lakehouse_spark_spark.operators.mixture import mixture_plan

    # src_a: 2 docs x 4 tokens = 8; src_b: 1 doc x 2 tokens
    df = spark.createDataFrame(
        [(1, "src_a", "one two three four"), (2, "src_a", "a b c d"), (3, "src_b", "x y")],
        ["doc_id", "source", "text"],
    )
    out = {r["source"]: r for r in mixture_plan(df, "source", "text", {"src_a": 1.0, "src_b": 1.0}, 8).collect()}
    a, b = out["src_a"], out["src_b"]
    assert a["n_tokens"] == 8 and b["n_tokens"] == 2
    assert a["weight"] == 0.5 and a["target_tokens"] == 4
    # src_a oversized -> subsample at 0.5; src_b undersized -> 2 epochs
    assert a["sampling_rate"] == 0.5 and a["epochs"] == 0.5
    assert b["sampling_rate"] == 1.0 and b["epochs"] == 2.0


def test_mixture_plan_unknown_source_gets_zero(spark):
    from lakehouse_spark_spark.operators.mixture import mixture_plan

    df = spark.createDataFrame([(1, "known", "a b"), (2, "other", "c d")], ["doc_id", "source", "text"])
    out = {r["source"]: r for r in mixture_plan(df, "source", "text", {"known": 1.0}, 10).collect()}
    assert out["other"]["weight"] == 0.0 and out["other"]["target_tokens"] == 0


def test_token_budget_sample_greedy_prefix(spark):
    from lakehouse_spark_spark.operators.mixture import token_budget_sample

    # 5 docs of 3 tokens each in one source; budget 9 -> exactly 3 kept,
    # and the kept set is the md5-order prefix (deterministic).
    df = spark.createDataFrame(
        [(i, "s", "tok tok tok") for i in range(5)], ["doc_id", "source", "text"]
    )
    out = token_budget_sample(df, "doc_id", "source", "text", budget_per_source=9)
    rows = out.orderBy("cum_tokens").collect()
    assert [r["cum_tokens"] for r in rows] == [3, 6, 9, 12, 15]
    assert sum(r["keep"] for r in rows) == 3
    # re-run is identical (hash order, no rand())
    again = token_budget_sample(df, "doc_id", "source", "text", budget_per_source=9)
    assert sorted(r["doc_id"] for r in rows if r["keep"]) == sorted(
        r["doc_id"] for r in again.collect() if r["keep"]
    )


def test_quality_score_bounds_and_monotone_stopwords(spark):
    from lakehouse_spark_spark.operators.text import quality_score

    df = spark.createDataFrame(
        [
            (1, "the of and is a the of and is a"),  # stopword-rich
            (2, "%%% ### !!! ??? *** %%% ### !!!"),  # punctuation junk
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["q"] for r in df.select("doc_id", quality_score("text").alias("q")).collect()}
    assert 0.0 < out[1] < 1.0 and 0.0 < out[2] < 1.0
    assert out[1] > out[2]  # stopword-rich English beats punctuation soup
